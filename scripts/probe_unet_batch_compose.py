"""Composed-subgraph probe for the 256^2-stage B=2 pathology.

probe_unet_batch_bisect.py pinned the B=2/4 UNet blowup to the 256^2 stage
(img128 variant scales cleanly at 2.07x, img64 at 1.04x; depth4 with the 256^2
stage present reproduces the full 4.5x). Isolated 3x3 convs at 256^2 scale
cleanly (probe_unet_batch_looped.py), so the culprit is an op COMPOSITION that
changes XLA's layout/fusion choice at B>=2. This probe times realistic
composed subgraphs at 256^2, loop-amortized (N=30 inner applications inside a
fori_loop) so tunnel dispatch latency cancels.

Run on the real chip:  python scripts/probe_unet_batch_compose.py
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

N_INNER = 30
H = W = 256
C = 192
GROUPS = 32


def timeit(build_fn, n_outer=3):
    f, args = build_fn()
    out = f(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n_outer):
        out = f(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / (n_outer * N_INNER) * 1000


def _conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _gn(x):
    B, h, w_, c = x.shape
    x32 = x.astype(jnp.float32).reshape(B, h, w_, GROUPS, c // GROUPS)
    mu = x32.mean((1, 2, 4), keepdims=True)
    var = ((x32 - mu) ** 2).mean((1, 2, 4), keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + 1e-5)).reshape(B, h, w_, c)


def looped(body_of_x, x0, *weights):
    @jax.jit
    def f(x, *ws):
        def body(i, x):
            return jnp.tanh(body_of_x(x, *ws)).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, N_INNER, body, x)

    return lambda: (f, (x0, *weights))


def make_cases(B):
    k = jax.random.key(0)
    x = jax.random.normal(k, (B, H, W, C), jnp.bfloat16)
    x27 = jax.random.normal(k, (B, H, W, 27), jnp.bfloat16)
    x384 = jax.random.normal(k, (B, H, W, 2 * C), jnp.bfloat16)
    xh = jax.random.normal(k, (B, H // 2, W // 2, C), jnp.bfloat16)
    w = jax.random.normal(k, (3, 3, C, C), jnp.bfloat16) * 0.01
    w27 = jax.random.normal(k, (3, 3, 27, C), jnp.bfloat16) * 0.01
    w384 = jax.random.normal(k, (3, 3, 2 * C, C), jnp.bfloat16) * 0.01

    def down(x, w):  # stride-2 downsample conv, then back up so shape loops
        y = jax.lax.conv_general_dilated(
            x, w, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return jnp.repeat(jnp.repeat(y, 2, 1), 2, 2)

    def up(xh, w):  # repeat-upsample then conv, then pool back down
        y = jnp.repeat(jnp.repeat(xh, 2, 1), 2, 2)
        y = _conv(y, w)
        return y[:, ::2, ::2]

    def resblock(x, w1, w2):
        h1 = _conv(jax.nn.silu(_gn(x)).astype(jnp.bfloat16), w1)
        h1 = jax.nn.silu(_gn(h1)).astype(jnp.bfloat16)
        return x + _conv(h1, w2)

    return {
        "conv": looped(_conv, x, w),
        "conv_conv": looped(lambda x, w: _conv(_conv(x, w), w), x, w),
        "gn_conv": looped(
            lambda x, w: _conv(jax.nn.silu(_gn(x)).astype(jnp.bfloat16), w), x, w
        ),
        "resblock": looped(resblock, x, w, w),
        "stem27": looped(lambda x, w27: _conv(x, w27)[..., :27], x27, w27),
        "concat_skip": looped(
            lambda xa, xb, wb: _conv(jnp.concatenate([xa, xb], -1), wb),
            x, x384[..., :C], w384,
        ),
        "downsample": looped(down, x, w),
        "upsample": looped(up, xh, w),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/unet_batch_compose.json")
    args = ap.parse_args()

    from humanliff_tpu.utils.runtime import setup_runtime

    setup_runtime()
    report = {}
    for B in (1, 2):
        row = {}
        for name, build in make_cases(B).items():
            row[name] = round(timeit(build), 4)
        report[f"B{B}"] = row
        print(f"B={B}: {json.dumps(row)}", flush=True)
    ratios = {
        k: round(report["B2"][k] / report["B1"][k], 2) for k in report["B1"]
    }
    report["ratio"] = ratios
    print("ratios:", json.dumps(ratios))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
