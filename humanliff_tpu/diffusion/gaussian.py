"""DDPM/DDIM math with x_cond conditioning threaded through.

Functional rebuild of the reference's ``GaussianDiffusion`` (human_diffusion/
improved_diffusion/gaussian_diffusion.py). Schedule constants are precomputed in
float64 numpy and baked into jitted programs as f32 literals; the ancestral and DDIM
samplers are ``lax.scan`` loops over timesteps (vs the reference's Python loop of
250-1000 UNet calls — on TPU the whole loop is one compiled program).

Model callable convention: ``model_fn(x, t_scaled, x_cond, y) -> output`` where
``t_scaled`` already includes the rescale/respacing mapping (see respace.py).
"""

from __future__ import annotations

import collections
import enum
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from humanliff_tpu.diffusion.losses import (
    discretized_gaussian_log_likelihood,
    mean_flat,
    normal_kl,
)

ModelFn = Callable[..., jnp.ndarray]


class ModelMeanType(enum.Enum):
    PREVIOUS_X = enum.auto()
    START_X = enum.auto()
    EPSILON = enum.auto()


class ModelVarType(enum.Enum):
    LEARNED = enum.auto()
    FIXED_SMALL = enum.auto()
    FIXED_LARGE = enum.auto()
    LEARNED_RANGE = enum.auto()


class LossType(enum.Enum):
    MSE = enum.auto()
    RESCALED_MSE = enum.auto()
    KL = enum.auto()
    RESCALED_KL = enum.auto()

    def is_vb(self):
        return self in (LossType.KL, LossType.RESCALED_KL)


def _extract(arr: np.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather schedule constants at timesteps t and broadcast to ndim dims."""
    out = jnp.asarray(arr, jnp.float32)[t]
    return out.reshape(t.shape[0], *([1] * (ndim - 1)))


# LRU-bounded: entries pin the diffusion object (and, on the closure path, the
# model_fn with everything it captures — potentially a full param pytree) plus
# the compiled executable, so an unbounded dict would leak one flagship-sized
# param set per fresh closure in a long-lived process. Each cached fn closes
# over its diff/model_fn, so ids of LIVE entries can never be reused; eviction
# drops both the pin and jit's compilation cache entry. Library callers should
# prefer ``jax.tree_util.Partial`` (params ride as traced args -> one shared
# entry, nothing large pinned).
_PROG_STEP_CACHE: collections.OrderedDict = collections.OrderedDict()
_PROG_STEP_CACHE_MAX = 16


def _progressive_step_fn(diff, kind: str, clip_denoised: bool, eta: float,
                         model_fn):
    """Cached per-step jit for the progressive sampling loops.

    When ``model_fn`` is a ``jax.tree_util.Partial`` its bound args (the model
    params) enter the jit as TRACED pytree arguments, so one compilation is
    shared across layers/batches and nothing large embeds as an HLO constant.
    A plain closure falls back to closure capture (cached by the closure's
    identity; the cache entry keeps it alive so ids never collide while
    cached — but each such entry pins the closure's captured params until
    LRU eviction, so prefer Partial in long-lived processes).
    """
    is_partial = isinstance(model_fn, jax.tree_util.Partial)
    key = (id(diff), kind, clip_denoised, eta,
           "partial" if is_partial else id(model_fn))
    fn = _PROG_STEP_CACHE.get(key)
    if fn is not None:
        _PROG_STEP_CACHE.move_to_end(key)
    if fn is None:
        def body(mf, x, x_cond, t, k, mkw):
            if kind == "ddim":
                return diff.ddim_sample(mf, x, x_cond, t, k, clip_denoised,
                                        eta, mkw)
            return diff.p_sample(mf, x, x_cond, t, k, clip_denoised, mkw)

        if is_partial:
            fn = jax.jit(body)
        else:
            jitted = jax.jit(
                lambda x, x_cond, t, k, mkw: body(model_fn, x, x_cond, t, k,
                                                  mkw)
            )
            fn = lambda _mf, *args: jitted(*args)
        _PROG_STEP_CACHE[key] = fn
        while len(_PROG_STEP_CACHE) > _PROG_STEP_CACHE_MAX:
            _PROG_STEP_CACHE.popitem(last=False)
    return fn


@dataclass(frozen=True, eq=False)
class GaussianDiffusion:
    betas: np.ndarray
    model_mean_type: ModelMeanType = ModelMeanType.EPSILON
    model_var_type: ModelVarType = ModelVarType.FIXED_LARGE
    loss_type: LossType = LossType.MSE
    rescale_timesteps: bool = True
    # Channel axis for learned-sigma splits: 1 for NCHW (reference), -1 for the
    # NHWC-native stage-2 pipeline.
    channel_axis: int = 1
    # respacing support (identity when not respaced): original-T index per step.
    timestep_map: Optional[np.ndarray] = None
    original_num_steps: Optional[int] = None

    # ---- derived schedule constants (filled in __post_init__) ----
    num_timesteps: int = field(init=False)
    alphas_cumprod: np.ndarray = field(init=False)
    alphas_cumprod_prev: np.ndarray = field(init=False)
    alphas_cumprod_next: np.ndarray = field(init=False)
    sqrt_alphas_cumprod: np.ndarray = field(init=False)
    sqrt_one_minus_alphas_cumprod: np.ndarray = field(init=False)
    log_one_minus_alphas_cumprod: np.ndarray = field(init=False)
    sqrt_recip_alphas_cumprod: np.ndarray = field(init=False)
    sqrt_recipm1_alphas_cumprod: np.ndarray = field(init=False)
    posterior_variance: np.ndarray = field(init=False)
    posterior_log_variance_clipped: np.ndarray = field(init=False)
    posterior_mean_coef1: np.ndarray = field(init=False)
    posterior_mean_coef2: np.ndarray = field(init=False)

    def __post_init__(self):
        betas = np.asarray(self.betas, np.float64)
        assert (betas > 0).all() and (betas <= 1).all()
        object.__setattr__(self, "betas", betas)
        object.__setattr__(self, "num_timesteps", int(betas.shape[0]))

        alphas = 1.0 - betas
        ac = np.cumprod(alphas)
        ac_prev = np.append(1.0, ac[:-1])
        ac_next = np.append(ac[1:], 0.0)
        object.__setattr__(self, "alphas_cumprod", ac)
        object.__setattr__(self, "alphas_cumprod_prev", ac_prev)
        object.__setattr__(self, "alphas_cumprod_next", ac_next)
        object.__setattr__(self, "sqrt_alphas_cumprod", np.sqrt(ac))
        object.__setattr__(self, "sqrt_one_minus_alphas_cumprod", np.sqrt(1.0 - ac))
        object.__setattr__(self, "log_one_minus_alphas_cumprod", np.log(1.0 - ac))
        with np.errstate(divide="ignore"):  # beta_T == 1 (tiny-T schedules) -> inf, used nowhere harmful
            object.__setattr__(self, "sqrt_recip_alphas_cumprod", np.sqrt(1.0 / ac))
            object.__setattr__(
                self, "sqrt_recipm1_alphas_cumprod", np.sqrt(1.0 / ac - 1)
            )

        pv = betas * (1.0 - ac_prev) / (1.0 - ac)
        object.__setattr__(self, "posterior_variance", pv)
        object.__setattr__(
            self,
            "posterior_log_variance_clipped",
            np.log(np.append(pv[1], pv[1:])),
        )
        object.__setattr__(
            self, "posterior_mean_coef1", betas * np.sqrt(ac_prev) / (1.0 - ac)
        )
        object.__setattr__(
            self,
            "posterior_mean_coef2",
            (1.0 - ac_prev) * np.sqrt(alphas) / (1.0 - ac),
        )

    # ---------------- forward process ----------------

    def q_mean_variance(self, x_start, t):
        mean = _extract(self.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        variance = _extract(1.0 - self.alphas_cumprod, t, x_start.ndim)
        log_variance = _extract(self.log_one_minus_alphas_cumprod, t, x_start.ndim)
        return mean, variance, log_variance

    def q_sample(self, x_start, t, noise):
        """Diffuse x_start for t steps (gaussian_diffusion.py:188-207)."""
        return (
            _extract(self.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + _extract(self.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
        )

    def q_posterior_mean_variance(self, x_start, x_t, t):
        mean = (
            _extract(self.posterior_mean_coef1, t, x_t.ndim) * x_start
            + _extract(self.posterior_mean_coef2, t, x_t.ndim) * x_t
        )
        variance = _extract(self.posterior_variance, t, x_t.ndim)
        log_variance = _extract(self.posterior_log_variance_clipped, t, x_t.ndim)
        return mean, variance, log_variance

    # ---------------- model wrapping ----------------

    def scale_timesteps(self, t):
        """Respacing map + optional float rescale to [0, 1000) (respace.py:110-122,
        gaussian_diffusion.py:351-354)."""
        if self.timestep_map is not None:
            t = jnp.asarray(self.timestep_map, jnp.int32)[t]
        if self.rescale_timesteps:
            n = self.original_num_steps or self.num_timesteps
            return t.astype(jnp.float32) * (1000.0 / n)
        return t

    def _predict_xstart_from_eps(self, x_t, t, eps):
        return (
            _extract(self.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - _extract(self.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * eps
        )

    def _predict_xstart_from_xprev(self, x_t, t, xprev):
        c1 = _extract(1.0 / self.posterior_mean_coef1, t, x_t.ndim)
        c2 = _extract(
            self.posterior_mean_coef2 / self.posterior_mean_coef1, t, x_t.ndim
        )
        return c1 * xprev - c2 * x_t

    def _predict_eps_from_xstart(self, x_t, t, pred_xstart):
        return (
            _extract(self.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - pred_xstart
        ) / _extract(self.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)

    def p_mean_variance(
        self,
        model_fn: ModelFn,
        x,
        t,
        x_cond=None,
        clip_denoised=True,
        model_kwargs: Optional[Dict[str, Any]] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Posterior p(x_{t-1} | x_t) parameters from the model output
        (gaussian_diffusion.py:232-326)."""
        model_kwargs = model_kwargs or {}
        model_output = model_fn(x, self.scale_timesteps(t), x_cond, **model_kwargs)

        if self.model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
            model_output, model_var_values = jnp.split(
                model_output, 2, axis=self.channel_axis
            )
            if self.model_var_type == ModelVarType.LEARNED:
                model_log_variance = model_var_values
                model_variance = jnp.exp(model_log_variance)
            else:
                min_log = _extract(self.posterior_log_variance_clipped, t, x.ndim)
                max_log = _extract(np.log(self.betas), t, x.ndim)
                frac = (model_var_values + 1) / 2
                model_log_variance = frac * max_log + (1 - frac) * min_log
                model_variance = jnp.exp(model_log_variance)
        else:
            if self.model_var_type == ModelVarType.FIXED_LARGE:
                var = np.append(self.posterior_variance[1], self.betas[1:])
                logvar = np.log(var)
            else:
                var = self.posterior_variance
                logvar = self.posterior_log_variance_clipped
            model_variance = _extract(var, t, x.ndim) * jnp.ones_like(x)
            model_log_variance = _extract(logvar, t, x.ndim) * jnp.ones_like(x)

        def process_xstart(xs):
            return jnp.clip(xs, -1, 1) if clip_denoised else xs

        if self.model_mean_type == ModelMeanType.PREVIOUS_X:
            pred_xstart = process_xstart(
                self._predict_xstart_from_xprev(x, t, model_output)
            )
            model_mean = model_output
        else:
            if self.model_mean_type == ModelMeanType.START_X:
                pred_xstart = process_xstart(model_output)
            else:
                pred_xstart = process_xstart(
                    self._predict_xstart_from_eps(x, t, model_output)
                )
            model_mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)

        return {
            "mean": model_mean,
            "variance": model_variance,
            "log_variance": model_log_variance,
            "pred_xstart": pred_xstart,
        }

    # ---------------- ancestral sampling ----------------

    def p_sample(
        self, model_fn, x, x_cond, t, key, clip_denoised=True, model_kwargs=None
    ):
        out = self.p_mean_variance(
            model_fn, x, t, x_cond, clip_denoised, model_kwargs
        )
        noise = jax.random.normal(key, x.shape, x.dtype)
        nonzero = (t != 0).astype(x.dtype).reshape(-1, *([1] * (x.ndim - 1)))
        sample = out["mean"] + nonzero * jnp.exp(0.5 * out["log_variance"]) * noise
        return sample, out["pred_xstart"]

    def p_sample_loop(
        self,
        model_fn: ModelFn,
        shape,
        key: jax.Array,
        x_cond=None,
        noise=None,
        clip_denoised=True,
        model_kwargs: Optional[Dict[str, Any]] = None,
    ) -> jnp.ndarray:
        """Full ancestral sampling as a lax.scan (gaussian_diffusion.py:390-482)."""
        k_init, k_loop = jax.random.split(key)
        x = jax.random.normal(k_init, shape) if noise is None else noise

        def step(x, inp):
            t_scalar, k = inp
            t = jnp.full((shape[0],), t_scalar, jnp.int32)
            x, _ = self.p_sample(
                model_fn, x, x_cond, t, k, clip_denoised, model_kwargs
            )
            return x, None

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        keys = jax.random.split(k_loop, self.num_timesteps)
        x, _ = jax.lax.scan(step, x, (ts, keys))
        return x

    def p_sample_loop_progressive(
        self,
        model_fn: ModelFn,
        shape,
        key: jax.Array,
        x_cond=None,
        noise=None,
        clip_denoised=True,
        model_kwargs: Optional[Dict[str, Any]] = None,
    ):
        """Generator yielding ``{"sample", "pred_xstart"}`` after every
        ancestral step, t = T-1..0 (gaussian_diffusion.py:445-482) — the
        visualization/debugging variant. One jitted per-step program is reused
        across all T steps (x and x_cond are traced arguments, never closure
        constants); :meth:`p_sample_loop` (a single compiled scan) remains the
        fast non-progressive path.

        Pass ``model_fn`` as a ``jax.tree_util.Partial`` binding the params
        (``Partial(apply_fn, params)``) so they enter the per-step jit as
        traced arguments; a plain closure still works but embeds its params as
        HLO constants — minutes of remote compile at flagship scale on
        tunneled backends.
        """
        yield from self._progressive_loop(
            "ancestral", model_fn, shape, key, x_cond, noise, clip_denoised,
            model_kwargs,
        )

    def ddim_sample_loop_progressive(
        self,
        model_fn: ModelFn,
        shape,
        key: jax.Array,
        x_cond=None,
        noise=None,
        clip_denoised=True,
        eta: float = 0.0,
        model_kwargs: Optional[Dict[str, Any]] = None,
    ):
        """DDIM twin of :meth:`p_sample_loop_progressive`
        (gaussian_diffusion.py:617-651)."""
        yield from self._progressive_loop(
            "ddim", model_fn, shape, key, x_cond, noise, clip_denoised,
            model_kwargs, eta=eta,
        )

    def _progressive_loop(
        self, kind, model_fn, shape, key, x_cond, noise, clip_denoised,
        model_kwargs, eta=0.0,
    ):
        k_init, k_loop = jax.random.split(key)
        x = jax.random.normal(k_init, shape) if noise is None else noise
        model_kwargs = model_kwargs or {}

        step = _progressive_step_fn(self, kind, clip_denoised, eta, model_fn)
        keys = jax.random.split(k_loop, self.num_timesteps)
        for i, t_scalar in enumerate(range(self.num_timesteps - 1, -1, -1)):
            t = jnp.full((shape[0],), t_scalar, jnp.int32)
            x, pred_x0 = step(model_fn, x, x_cond, t, keys[i], model_kwargs)
            yield {"sample": x, "pred_xstart": pred_x0}

    # ---------------- DDIM ----------------

    def ddim_sample(
        self,
        model_fn,
        x,
        x_cond,
        t,
        key,
        clip_denoised=True,
        eta: float = 0.0,
        model_kwargs=None,
    ):
        out = self.p_mean_variance(model_fn, x, t, x_cond, clip_denoised, model_kwargs)
        eps = self._predict_eps_from_xstart(x, t, out["pred_xstart"])
        alpha_bar = _extract(self.alphas_cumprod, t, x.ndim)
        alpha_bar_prev = _extract(self.alphas_cumprod_prev, t, x.ndim)
        sigma = (
            eta
            * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
            * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
        )
        noise = jax.random.normal(key, x.shape, x.dtype)
        mean_pred = (
            out["pred_xstart"] * jnp.sqrt(alpha_bar_prev)
            + jnp.sqrt(1 - alpha_bar_prev - sigma**2) * eps
        )
        nonzero = (t != 0).astype(x.dtype).reshape(-1, *([1] * (x.ndim - 1)))
        return mean_pred + nonzero * sigma * noise, out["pred_xstart"]

    def ddim_reverse_sample(self, model_fn, x, t, x_cond=None, clip_denoised=True,
                            model_kwargs=None):
        """Deterministic x_t -> x_{t+1} ODE step (gaussian_diffusion.py:531-567)."""
        out = self.p_mean_variance(model_fn, x, t, x_cond, clip_denoised, model_kwargs)
        eps = (
            _extract(self.sqrt_recip_alphas_cumprod, t, x.ndim) * x
            - out["pred_xstart"]
        ) / _extract(self.sqrt_recipm1_alphas_cumprod, t, x.ndim)
        alpha_bar_next = _extract(self.alphas_cumprod_next, t, x.ndim)
        return (
            out["pred_xstart"] * jnp.sqrt(alpha_bar_next)
            + jnp.sqrt(1 - alpha_bar_next) * eps
        )

    def ddim_sample_loop(
        self,
        model_fn: ModelFn,
        shape,
        key: jax.Array,
        x_cond=None,
        noise=None,
        clip_denoised=True,
        eta: float = 0.0,
        model_kwargs: Optional[Dict[str, Any]] = None,
    ) -> jnp.ndarray:
        k_init, k_loop = jax.random.split(key)
        x = jax.random.normal(k_init, shape) if noise is None else noise

        def step(x, inp):
            t_scalar, k = inp
            t = jnp.full((shape[0],), t_scalar, jnp.int32)
            x, _ = self.ddim_sample(
                model_fn, x, x_cond, t, k, clip_denoised, eta, model_kwargs
            )
            return x, None

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        keys = jax.random.split(k_loop, self.num_timesteps)
        x, _ = jax.lax.scan(step, x, (ts, keys))
        return x

    # ---------------- losses ----------------

    def _vb_terms_bpd(
        self, model_fn, x_start, x_t, t, x_cond=None, clip_denoised=True,
        model_kwargs=None,
    ):
        true_mean, _, true_log_var = self.q_posterior_mean_variance(x_start, x_t, t)
        out = self.p_mean_variance(
            model_fn, x_t, t, x_cond, clip_denoised, model_kwargs
        )
        kl = normal_kl(true_mean, true_log_var, out["mean"], out["log_variance"])
        kl = mean_flat(kl) / np.log(2.0)

        decoder_nll = -discretized_gaussian_log_likelihood(
            x_start, means=out["mean"], log_scales=0.5 * out["log_variance"]
        )
        decoder_nll = mean_flat(decoder_nll) / np.log(2.0)

        output = jnp.where(t == 0, decoder_nll, kl)
        return {"output": output, "pred_xstart": out["pred_xstart"]}

    def training_losses(
        self,
        model_fn: ModelFn,
        x_start,
        x_cond,
        t,
        key: jax.Array,
        model_kwargs: Optional[Dict[str, Any]] = None,
        noise=None,
    ) -> Dict[str, jnp.ndarray]:
        """Per-example training losses (gaussian_diffusion.py:688-772)."""
        model_kwargs = model_kwargs or {}
        if noise is None:
            noise = jax.random.normal(key, x_start.shape, x_start.dtype)
        x_t = self.q_sample(x_start, t, noise)

        terms: Dict[str, jnp.ndarray] = {}
        if self.loss_type.is_vb():
            terms["loss"] = self._vb_terms_bpd(
                model_fn, x_start, x_t, t, x_cond, False, model_kwargs
            )["output"]
            if self.loss_type == LossType.RESCALED_KL:
                terms["loss"] = terms["loss"] * self.num_timesteps
            return terms

        model_output = model_fn(x_t, self.scale_timesteps(t), x_cond, **model_kwargs)

        if self.model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
            model_output, model_var_values = jnp.split(
                model_output, 2, axis=self.channel_axis
            )
            frozen = jnp.concatenate(
                [jax.lax.stop_gradient(model_output), model_var_values],
                axis=self.channel_axis,
            )
            terms["vb"] = self._vb_terms_bpd(
                lambda *a, **k: frozen, x_start, x_t, t, x_cond, False
            )["output"]
            if self.loss_type == LossType.RESCALED_MSE:
                terms["vb"] = terms["vb"] * (self.num_timesteps / 1000.0)

        target = {
            ModelMeanType.PREVIOUS_X: lambda: self.q_posterior_mean_variance(
                x_start, x_t, t
            )[0],
            ModelMeanType.START_X: lambda: x_start,
            ModelMeanType.EPSILON: lambda: noise,
        }[self.model_mean_type]()
        terms["mse"] = mean_flat((target - model_output) ** 2)
        terms["loss"] = terms["mse"] + terms.get("vb", 0.0)
        return terms

    def _prior_bpd(self, x_start):
        B = x_start.shape[0]
        t = jnp.full((B,), self.num_timesteps - 1, jnp.int32)
        mean, _, log_var = self.q_mean_variance(x_start, t)
        kl = normal_kl(mean, log_var, jnp.zeros_like(mean), jnp.zeros_like(log_var))
        return mean_flat(kl) / np.log(2.0)

    def calc_bpd_loop(
        self, model_fn, x_start, key, x_cond=None, clip_denoised=True,
        model_kwargs=None,
    ) -> Dict[str, jnp.ndarray]:
        """Total bits/dim via the full VLB (gaussian_diffusion.py:792-847)."""
        B = x_start.shape[0]

        def step(carry, inp):
            t_scalar, k = inp
            t = jnp.full((B,), t_scalar, jnp.int32)
            noise = jax.random.normal(k, x_start.shape, x_start.dtype)
            x_t = self.q_sample(x_start, t, noise)
            out = self._vb_terms_bpd(
                model_fn, x_start, x_t, t, x_cond, clip_denoised, model_kwargs
            )
            eps = self._predict_eps_from_xstart(x_t, t, out["pred_xstart"])
            mse_x0 = mean_flat((out["pred_xstart"] - x_start) ** 2)
            mse_eps = mean_flat((eps - noise) ** 2)
            return carry, (out["output"], mse_x0, mse_eps)

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        keys = jax.random.split(key, self.num_timesteps)
        _, (vb, xstart_mse, eps_mse) = jax.lax.scan(step, None, (ts, keys))

        prior_bpd = self._prior_bpd(x_start)
        total_bpd = vb.sum(0) + prior_bpd
        return {
            "total_bpd": total_bpd,
            "prior_bpd": prior_bpd,
            "vb": vb.T,
            "xstart_mse": xstart_mse.T,
            "mse": eps_mse.T,
        }
