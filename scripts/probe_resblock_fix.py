"""Res-block B=2 pathology: ablations + fix candidates at 256^2.

probe_unet_batch_compose.py pinned the UNet B=2 blowup to the full res-block
composition (GN-silu-conv-GN-silu-conv-residual: 3.1x batch ratio at 256^2,
1.48 -> 4.59 ms) while every sub-pair (gn_conv 1.53x, conv_conv 1.74x) scales
cleanly. This probe ablates the block and times fix candidates:

  - no_residual        : drop the +x                      (is the add the trigger?)
  - one_gn             : GN only before the first conv    (is the 2nd GN it?)
  - barrier_mid        : optimization_barrier after conv1 (split fusion groups)
  - barrier_pre_res    : optimization_barrier before +x
  - gn_bf16            : GroupNorm stats in bf16 (no fp32 upcast)
  - gn_flat            : stats via (B, HW, G, c) reshape
  - remat_block        : jax.checkpoint around the block

Run on the real chip:  python scripts/probe_resblock_fix.py
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


def timeit(f, args, n_outer=3):
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


def _gn(x, dtype=jnp.float32, flat=False):
    B, h, w_, c = x.shape
    xs = x.astype(dtype)
    if flat:
        xs = xs.reshape(B, h * w_, GROUPS, c // GROUPS)
        mu = xs.mean((1, 3), keepdims=True)
        var = ((xs - mu) ** 2).mean((1, 3), keepdims=True)
        y = (xs - mu) * jax.lax.rsqrt(var + 1e-5)
        return y.reshape(B, h, w_, c)
    xs = xs.reshape(B, h, w_, GROUPS, c // GROUPS)
    mu = xs.mean((1, 2, 4), keepdims=True)
    var = ((xs - mu) ** 2).mean((1, 2, 4), keepdims=True)
    return ((xs - mu) * jax.lax.rsqrt(var + 1e-5)).reshape(B, h, w_, c)


def block_variants():
    bar = jax.lax.optimization_barrier

    def base(x, w1, w2):
        h1 = _conv(jax.nn.silu(_gn(x)).astype(jnp.bfloat16), w1)
        h1 = jax.nn.silu(_gn(h1)).astype(jnp.bfloat16)
        return x + _conv(h1, w2)

    def no_residual(x, w1, w2):
        h1 = _conv(jax.nn.silu(_gn(x)).astype(jnp.bfloat16), w1)
        h1 = jax.nn.silu(_gn(h1)).astype(jnp.bfloat16)
        return _conv(h1, w2)

    def one_gn(x, w1, w2):
        h1 = _conv(jax.nn.silu(_gn(x)).astype(jnp.bfloat16), w1)
        return x + _conv(jax.nn.silu(h1).astype(jnp.bfloat16), w2)

    def barrier_mid(x, w1, w2):
        h1 = _conv(jax.nn.silu(_gn(x)).astype(jnp.bfloat16), w1)
        h1 = bar(h1)
        h1 = jax.nn.silu(_gn(h1)).astype(jnp.bfloat16)
        return x + _conv(h1, w2)

    def barrier_pre_res(x, w1, w2):
        h1 = _conv(jax.nn.silu(_gn(x)).astype(jnp.bfloat16), w1)
        h1 = jax.nn.silu(_gn(h1)).astype(jnp.bfloat16)
        return x + bar(_conv(h1, w2))

    def gn_bf16(x, w1, w2):
        h1 = _conv(jax.nn.silu(_gn(x, jnp.bfloat16)).astype(jnp.bfloat16), w1)
        h1 = jax.nn.silu(_gn(h1, jnp.bfloat16)).astype(jnp.bfloat16)
        return x + _conv(h1, w2)

    def gn_flat(x, w1, w2):
        h1 = _conv(jax.nn.silu(_gn(x, flat=True)).astype(jnp.bfloat16), w1)
        h1 = jax.nn.silu(_gn(h1, flat=True)).astype(jnp.bfloat16)
        return x + _conv(h1, w2)

    remat_block = jax.checkpoint(base)

    return {
        "base": base,
        "no_residual": no_residual,
        "one_gn": one_gn,
        "barrier_mid": barrier_mid,
        "barrier_pre_res": barrier_pre_res,
        "gn_bf16": gn_bf16,
        "gn_flat": gn_flat,
        "remat_block": remat_block,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/resblock_fix.json")
    ap.add_argument("--variants", default=None)
    args = ap.parse_args()

    from humanliff_tpu.utils.runtime import setup_runtime

    setup_runtime()
    variants = block_variants()
    names = args.variants.split(",") if args.variants else list(variants)
    report = {}
    for name in names:
        blk = variants[name]
        row = {}
        for B in (1, 2):
            k = jax.random.key(0)
            x = jax.random.normal(k, (B, H, W, C), jnp.bfloat16)
            w1 = jax.random.normal(k, (3, 3, C, C), jnp.bfloat16) * 0.01
            w2 = jax.random.normal(k, (3, 3, C, C), jnp.bfloat16) * 0.01

            @jax.jit
            def f(x, w1, w2, blk=blk):
                def body(i, x):
                    return jnp.tanh(blk(x, w1, w2)).astype(jnp.bfloat16)

                return jax.lax.fori_loop(0, N_INNER, body, x)

            row[f"b{B}_ms"] = round(timeit(f, (x, w1, w2)), 4)
        row["ratio"] = round(row["b2_ms"] / row["b1_ms"], 2)
        report[name] = row
        print(f"{name}: {json.dumps(row)}", flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
