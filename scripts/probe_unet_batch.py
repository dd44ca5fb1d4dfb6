"""UNet batch-scaling probe (VERDICT r2 items 3+8).

Times the flagship denoise forward at B in {1, 2, 4, 8} and each major
sub-component in isolation (3x3 convs per stage, attention per resolution,
GroupNorm, nearest-upsample), in bf16 with honest readback sync. Whichever
component's time blows up super-linearly at B=2/4 is the pathology; the
probe also tries candidate mitigations (NCHW conv layout, padded batch).

Run on the real chip:  python scripts/probe_unet_batch.py [--out probe.json]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    jax.tree.map(lambda a: float(jnp.sum(a.astype(jnp.float32))), x)


def timeit(fn, *args, n=10):
    fn(*args)  # compile
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n * 1000  # ms


def conv_bench(B, H, W, Cin, Cout, nchw=False):
    k = jax.random.key(0)
    if nchw:
        x = jax.random.normal(k, (B, Cin, H, W), jnp.bfloat16)
        w = jax.random.normal(k, (Cout, Cin, 3, 3), jnp.bfloat16)
        dn = ("NCHW", "OIHW", "NCHW")
    else:
        x = jax.random.normal(k, (B, H, W, Cin), jnp.bfloat16)
        w = jax.random.normal(k, (3, 3, Cin, Cout), jnp.bfloat16)
        dn = ("NHWC", "HWIO", "NHWC")

    @jax.jit
    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn
        )

    ms = timeit(f, x, w)
    flops = 2 * B * H * W * Cin * Cout * 9
    return ms, flops / (ms / 1e3)


def attn_bench(B, HW, C, heads=4):
    k = jax.random.key(0)
    x = jax.random.normal(k, (B, HW, C), jnp.bfloat16)
    qkv_w = jax.random.normal(k, (C, 3 * C), jnp.bfloat16)

    @jax.jit
    def f(x, w):
        qkv = x @ w
        q, kk, v = jnp.split(qkv.reshape(B, HW, heads, 3 * C // heads), 3, -1)
        a = jax.nn.softmax(
            jnp.einsum("bqhc,bkhc->bhqk", q, kk) / np.sqrt(C // heads), -1
        )
        return jnp.einsum("bhqk,bkhc->bqhc", a, v).reshape(B, HW, C)

    return timeit(f, x, qkv_w)


def groupnorm_bench(B, H, W, C, groups=32):
    import flax.linen as nn

    gn = nn.GroupNorm(num_groups=groups)
    x = jax.random.normal(jax.random.key(0), (B, H, W, C), jnp.bfloat16)
    p = gn.init(jax.random.key(1), x)
    f = jax.jit(lambda p, x: gn.apply(p, x))
    return timeit(f, p, x)


def upsample_bench(B, H, W, C, variant="repeat"):
    x = jax.random.normal(jax.random.key(0), (B, H, W, C), jnp.bfloat16)

    @jax.jit
    def f(x):
        if variant == "repeat":
            return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if variant == "broadcast":
            b, h, w, c = x.shape
            y = jnp.broadcast_to(
                x[:, :, None, :, None, :], (b, h, 2, w, 2, c)
            )
            return y.reshape(b, 2 * h, 2 * w, c)
        return jax.image.resize(x, (B, 2 * H, 2 * W, C), "nearest")

    return timeit(f, x)


def full_unet_bench(B):
    from humanliff_tpu.models.factory import create_model

    model = create_model(
        image_size=256, in_channels=27, num_channels=192, out_channels=27,
        num_res_blocks=3, learn_sigma=False, class_cond=True,
        attention_resolutions="32,16,8", num_heads=4, num_heads_upsample=-1,
        use_scale_shift_norm=True, cond_type="controlnet", use_3d_aware=False,
        dropout=0.0,
    )
    x = jnp.zeros((B, 256, 256, 27), jnp.bfloat16)
    t = jnp.zeros((B,), jnp.float32)
    y = jnp.zeros((B,), jnp.int32)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 256, 256, 27)), jnp.zeros((1,)),
        jnp.zeros((1, 256, 256, 27)), jnp.zeros((1,), jnp.int32),
    )
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        params,
    )

    @jax.jit
    def f(p, x, t, y):
        return model.apply(p, x, t, x, y)

    ms = timeit(f, params, x, t, y, n=5)
    flops = None
    try:
        cost = f.lower(params, x, t, y).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception:
        pass
    return ms, flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/unet_batch_probe.json")
    ap.add_argument("--skip_full", action="store_true")
    args = ap.parse_args()

    from humanliff_tpu.utils.runtime import setup_runtime

    setup_runtime()
    peak = 197e12
    report = {"device": str(jax.devices()[0].device_kind)}

    for B in (1, 2, 4, 8):
        row = {}
        # Representative stages of the flagship (192ch base, mult 1,1,2,2,4,4).
        for name, (H, W, Cin, Cout) in {
            "conv256_192": (256, 256, 192, 192),
            "conv128_192": (128, 128, 192, 192),
            "conv64_384": (64, 64, 384, 384),
            "conv32_384": (32, 32, 384, 384),
            "conv16_768": (16, 16, 768, 768),
            "conv8_768": (8, 8, 768, 768),
        }.items():
            ms, fps = conv_bench(B, H, W, Cin, Cout)
            row[name] = {"ms": round(ms, 3), "mfu": round(fps / peak, 3)}
            ms_nchw, fps_nchw = conv_bench(B, H, W, Cin, Cout, nchw=True)
            row[name + "_nchw"] = {
                "ms": round(ms_nchw, 3), "mfu": round(fps_nchw / peak, 3)
            }
        for name, (HW, C) in {
            "attn32": (32 * 32, 384),
            "attn16": (16 * 16, 768),
            "attn8": (8 * 8, 768),
        }.items():
            row[name] = {"ms": round(attn_bench(B, HW, C), 3)}
        row["groupnorm256_192"] = {
            "ms": round(groupnorm_bench(B, 256, 256, 192), 3)
        }
        for variant in ("repeat", "broadcast", "resize"):
            row[f"upsample128_{variant}"] = {
                "ms": round(upsample_bench(B, 128, 128, 384, variant), 3)
            }
        if not args.skip_full:
            ms, flops = full_unet_bench(B)
            row["full_unet"] = {
                "ms": round(ms, 2),
                "mfu": None if not flops else round(flops / (ms / 1e3) / peak, 3),
            }
        report[f"B{B}"] = row
        print(f"B={B}: " + json.dumps(row))

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
