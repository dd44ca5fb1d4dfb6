"""Loop-amortized per-component batch-scaling probe.

scripts/probe_unet_batch.py times one op per dispatch, which on the axon
tunnel is dominated by the ~3-6 ms dispatch/readback floor — individual conv
timings there are latency noise. This probe instead runs N=50 applications of
each component inside ONE jitted lax.fori_loop, so the per-application time is
accurate to microseconds and the B=2/4 pathology can be localized to the
specific shapes whose per-application cost scales super-linearly in B.

Run on the real chip:  python scripts/probe_unet_batch_looped.py
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

N_INNER = 50


def timeit_looped(build_fn, n_outer=3):
    f, args = build_fn()
    f(*args)  # compile
    float(jnp.sum(f(*args).astype(jnp.float32)))  # honest sync
    t0 = time.perf_counter()
    for _ in range(n_outer):
        out = f(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / (n_outer * N_INNER) * 1000  # ms/app


def conv_loop(B, H, W, C):
    def build():
        k = jax.random.key(0)
        x = jax.random.normal(k, (B, H, W, C), jnp.bfloat16)
        w = jax.random.normal(k, (3, 3, C, C), jnp.bfloat16) * 0.01

        @jax.jit
        def f(x, w):
            def body(i, x):
                y = jax.lax.conv_general_dilated(
                    x, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                return jnp.tanh(y)  # keep values bounded across 50 apps

            return jax.lax.fori_loop(0, N_INNER, body, x)

        return f, (x, w)

    return build


def attn_loop(B, HW, C, heads=4):
    def build():
        k = jax.random.key(0)
        x = jax.random.normal(k, (B, HW, C), jnp.bfloat16)
        w = jax.random.normal(k, (C, 3 * C), jnp.bfloat16) * 0.02

        @jax.jit
        def f(x, w):
            def body(i, x):
                qkv = x @ w
                q, kk, v = jnp.split(
                    qkv.reshape(B, HW, heads, 3 * C // heads), 3, -1
                )
                a = jax.nn.softmax(
                    jnp.einsum("bqhc,bkhc->bhqk", q, kk) / np.sqrt(C // heads),
                    -1,
                )
                y = jnp.einsum("bhqk,bkhc->bqhc", a, v).reshape(B, HW, C)
                return jnp.tanh(y).astype(jnp.bfloat16)

            return jax.lax.fori_loop(0, N_INNER, body, x)

        return f, (x, w)

    return build


def gn_loop(B, H, W, C, groups=32):
    def build():
        k = jax.random.key(0)
        x = jax.random.normal(k, (B, H, W, C), jnp.bfloat16)

        @jax.jit
        def f(x):
            def body(i, x):
                x32 = x.astype(jnp.float32).reshape(B, H, W, groups, C // groups)
                mu = x32.mean((1, 2, 4), keepdims=True)
                var = ((x32 - mu) ** 2).mean((1, 2, 4), keepdims=True)
                y = ((x32 - mu) * jax.lax.rsqrt(var + 1e-5)).reshape(B, H, W, C)
                return y.astype(jnp.bfloat16)

            return jax.lax.fori_loop(0, N_INNER, body, x)

        return f, (x,)

    return build


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/unet_batch_probe_looped.json")
    args = ap.parse_args()

    from humanliff_tpu.utils.runtime import setup_runtime

    setup_runtime()
    peak = 197e12
    report = {"device": str(jax.devices()[0].device_kind), "n_inner": N_INNER}

    shapes = {
        "conv256_192": (256, 256, 192),
        "conv128_192": (128, 128, 192),
        "conv64_384": (64, 64, 384),
        "conv32_384": (32, 32, 384),
        "conv16_768": (16, 16, 768),
        "conv8_768": (8, 8, 768),
    }
    for B in (1, 2, 4, 8):
        row = {}
        for name, (H, W, C) in shapes.items():
            ms = timeit_looped(conv_loop(B, H, W, C))
            flops = 2 * B * H * W * C * C * 9
            row[name] = {
                "ms": round(ms, 4), "mfu": round(flops / (ms / 1e3) / peak, 3)
            }
        for name, (HW, C) in {
            "attn32": (1024, 384), "attn16": (256, 768), "attn8": (64, 768)
        }.items():
            row[name] = {"ms": round(timeit_looped(attn_loop(B, HW, C)), 4)}
        row["gn256_192"] = {"ms": round(timeit_looped(gn_loop(B, 256, 256, 192)), 4)}
        report[f"B{B}"] = row
        print(f"B={B}: " + json.dumps(row))

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
