"""Model-level bisect of the UNet B=2/4 batch-scaling pathology.

probe_unet_batch_looped.py showed every individual component (convs at all six
stage shapes, attention, GroupNorm) scales CLEANLY from B=1 to B=2/4 — so the
4-5x whole-model blowup (30 ms B1 -> 123 ms B2, probe_unet_batch.py full_unet)
is a graph-level XLA layout/fusion decision. This probe bisects at the MODEL
level: it times full UNet applies at B=1 vs B=2 across config axes (depth
truncation via channel_mult, attention set, cond_type, num_res_blocks) and
reports the B2/B1 ratio per variant. A clean model doubles (~2.0); the variant
where the ratio jumps >>2 contains the culprit subgraph.

Run on the real chip:  python scripts/probe_unet_batch_bisect.py
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

from humanliff_tpu.models.factory import create_model


def time_apply(model, B, n=8, size=256):
    x = jnp.zeros((B, size, size, 27), jnp.bfloat16)
    t = jnp.zeros((B,), jnp.float32)
    xc = jnp.zeros((B, size, size, 27), jnp.bfloat16)
    y = jnp.zeros((B,), jnp.int32)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, size, size, 27)), jnp.zeros((1,)),
        jnp.zeros((1, size, size, 27)), jnp.zeros((1,), jnp.int32),
    )
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, params
    )

    @jax.jit
    def f(p, x, t, xc, y):
        return model.apply(p, x, t, xc, y)

    out = f(params, x, t, xc, y)
    float(jnp.sum(out.astype(jnp.float32)))  # compile + honest sync
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(params, x, t, xc, y)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1000


BASE = dict(
    image_size=256, in_channels=27, num_channels=192, out_channels=27,
    num_res_blocks=3, learn_sigma=False, class_cond=True,
    attention_resolutions="32,16,8", num_heads=4, num_heads_upsample=-1,
    use_scale_shift_norm=True, cond_type="controlnet", use_3d_aware=False,
    dropout=0.0,
)

# attention_resolutions="2" -> ds=128, which no stage reaches: encoder/decoder
# attention OFF (the middle block's attention is unconditional, so channel_mult
# must keep >=4 stages for the middle block to sit at <=32^2).
VARIANTS = {
    "full": {},
    "concat_cond": {"cond_type": "concat"},
    "no_attn": {"attention_resolutions": "2"},
    "nrb1": {"num_res_blocks": 1},
    "minimal": {
        "cond_type": "concat", "attention_resolutions": "2", "num_res_blocks": 1
    },
    "depth4_mult1122": {"channel_mult": (1, 1, 2, 2), "attention_resolutions": "2"},
    "depth5_mult11224": {
        "channel_mult": (1, 1, 2, 2, 4), "attention_resolutions": "2"
    },
    "depth6_noattn": {
        "channel_mult": (1, 1, 2, 2, 4, 4), "attention_resolutions": "2"
    },
    "narrow96": {"num_channels": 96},
    "img128": {"image_size": 128, "channel_mult": (1, 1, 2, 2, 4, 4),
               "attention_resolutions": "16,8,4", "_size": 128},
    "img64": {"image_size": 64, "channel_mult": (1, 1, 2, 2, 4, 4),
              "attention_resolutions": "8,4,2", "_size": 64},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/unet_batch_bisect.json")
    ap.add_argument("--variants", default=None, help="comma list; default all")
    args = ap.parse_args()

    from humanliff_tpu.utils.runtime import setup_runtime

    setup_runtime()
    names = args.variants.split(",") if args.variants else list(VARIANTS)
    report = {}
    for name in names:
        spec = dict(VARIANTS[name])
        size = spec.pop("_size", 256)
        model = create_model(**{**BASE, **spec})
        ms1 = time_apply(model, 1, size=size)
        ms2 = time_apply(model, 2, size=size)
        row = {"b1_ms": round(ms1, 2), "b2_ms": round(ms2, 2),
               "ratio": round(ms2 / ms1, 2)}
        report[name] = row
        print(f"{name}: {json.dumps(row)}", flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
