"""Where does the non-MXU time go in the flagship denoise step? (VERDICT r2 item 8)

Builds a per-stage roofline model of the flagship ControlNet UNet
(256^2, ch 192, mult (1,1,2,2,4,4), 3 res blocks, attn at 32/16/8 — the
reference config, human_diffusion/triplane_scripts/*.sh) and compares it to
the measured wall-clock:

1. ANALYTIC: per-stage conv/attention FLOPs and HBM bytes (bf16 activations)
   -> per-stage roofline ms = max(flops / peak_mxu, bytes / peak_hbm);
   a stage whose byte-roofline dominates is memory-bound and no kernel can
   push its MFU toward 1.0.
2. MEASURED (on the real chip): the full denoise step in a scan loop with
   readback sync, plus XLA's own cost_analysis (flops, bytes accessed) of
   the compiled step.

Run:  python scripts/mfu_breakdown.py [--batch 8] [--out runs/probes/mfu.json]
CPU-safe: with --analytic_only it prints the model without touching a device.
"""

from __future__ import annotations

import argparse
import json

PEAK_MXU = 197e12  # v5e bf16 FLOP/s
PEAK_HBM = 819e9   # v5e HBM bytes/s


def flagship_stages(B: int):
    """Yield (name, multiplicity, flops, hbm_bytes) for every op group in one
    forward pass of the flagship UNet, B samples, bf16 activations.

    Structure (models/unet.py): encoder = per stage [3 res blocks (+attn at
    32/16/8)] + downsample between stages; ControlNet runs a FULL second
    encoder copy on x + x_cond plus a zero 1x1 projection per skip; decoder =
    per stage 4 res blocks (+attn) + upsample; middle = res + attn + res.
    """
    ch0 = 192
    mults = (1, 1, 2, 2, 4, 4)
    sizes = (256, 128, 64, 32, 16, 8)
    attn_at = {32, 16, 8}
    stages = []

    def conv(H, cin, cout, k=3):
        flops = 2 * B * H * H * cin * cout * k * k
        bytes_ = 2 * B * H * H * (cin + cout) + 2 * cin * cout * k * k
        return flops, bytes_

    def groupnorm(H, c):
        # fp32 stats: read bf16 acts, two reduction passes + normalize write
        return 10 * B * H * H * c, 3 * 2 * B * H * H * c

    def resblock(H, cin, cout):
        f = b = 0
        for fb in (groupnorm(H, cin), conv(H, cin, cout),
                   groupnorm(H, cout), conv(H, cout, cout)):
            f += fb[0]; b += fb[1]
        if cin != cout:
            fb = conv(H, cin, cout, k=1)
            f += fb[0]; b += fb[1]
        return f, b

    def attention(H, c):
        n = H * H
        qkv = 2 * B * n * c * (3 * c) + 2 * B * n * c * c  # qkv + out proj
        scores = 2 * B * n * n * c * 2                      # qk^T and av
        f = qkv + scores
        b = 2 * B * n * c * 8 + 2 * B * n * n * 2           # acts + attn matrix
        return f, b

    # encoder x2 (main + controlnet copy), decoder x1
    prev_ch = ch0
    for H, m in zip(sizes, mults):
        c = ch0 * m
        for enc_copies, nres, tag in ((2, 3, "enc"), (1, 4, "dec")):
            f = b = 0
            cin = prev_ch
            for _ in range(nres):
                ff, bb = resblock(H, cin, c)
                f += ff; b += bb
                cin = c
            if H in attn_at:
                ff, bb = attention(H, c)
                f += nres * ff; b += nres * bb
            stages.append((f"{tag}{H}_{c}", enc_copies, f, b))
        # down/up-sample convs between stages (encoder x2 + decoder x1)
        if H != sizes[-1]:
            ff, bb = conv(H // 2, c, c)
            stages.append((f"down{H}", 2, ff, bb))
            ff, bb = conv(H, c, c)
            stages.append((f"up{H}", 1, ff, bb))
        prev_ch = c

    # middle block: res + attn + res at 8^2, 768 ch
    f1, b1 = resblock(8, 768, 768)
    fa, ba = attention(8, 768)
    stages.append(("middle", 1, 2 * f1 + fa, 2 * b1 + ba))
    return stages


def analytic_table(B: int):
    rows = []
    tot_f = tot_b = tot_ms = 0.0
    for name, mult, f, b in flagship_stages(B):
        f *= mult; b *= mult
        ms_c = f / PEAK_MXU * 1e3
        ms_m = b / PEAK_HBM * 1e3
        rows.append({
            "stage": name, "gflops": round(f / 1e9, 2),
            "mbytes": round(b / 1e6, 1),
            "roofline_ms": round(max(ms_c, ms_m), 3),
            "bound": "hbm" if ms_m > ms_c else "mxu",
        })
        tot_f += f; tot_b += b; tot_ms += max(ms_c, ms_m)
    return rows, tot_f, tot_b, tot_ms


def gn_probe(B: int, H: int = 256, C: int = 192, groups: int = 32, n: int = 50):
    """GroupNorm formulation shootout at the hot 256^2/192 shape.

    (a) flax fp32 GN (the shipping GroupNorm32 body)
    (b) flax GN at bf16 end-to-end (stats precision risk — probe only)
    (c) manual single-pass fp32 stats (mean, mean-of-squares) + bf16 apply
    """
    import time

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    x = jax.random.normal(jax.random.key(0), (B, H, H, C), jnp.bfloat16)
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)

    def flax_gn(dtype):
        mod = nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=dtype)
        p = mod.init(jax.random.key(1), x.astype(dtype))

        @jax.jit
        def f(x):
            def body(c, _):
                return mod.apply(p, c.astype(dtype)).astype(jnp.bfloat16), ()
            out, _ = jax.lax.scan(f=body, init=x, xs=None, length=n)
            return out
        return f

    @jax.jit
    def manual(x):
        def body(c, _):
            xg = c.reshape(B, H * H, groups, C // groups)
            m = jnp.mean(xg, axis=(1, 3), dtype=jnp.float32)
            m2 = jnp.mean(
                xg.astype(jnp.float32) ** 2, axis=(1, 3), dtype=jnp.float32)
            inv = jax.lax.rsqrt(m2 - m * m + 1e-5)          # (B, groups)
            sc = jnp.repeat(inv, C // groups, -1) * scale    # (B, C)
            sh = bias - jnp.repeat(m * inv, C // groups, -1) * scale
            y = c * sc[:, None, None, :].astype(jnp.bfloat16) \
                + sh[:, None, None, :].astype(jnp.bfloat16)
            return y, ()
        out, _ = jax.lax.scan(body, x, None, length=n)
        return out

    results = {}
    for name, f in (("flax_fp32", flax_gn(jnp.float32)),
                    ("flax_bf16", flax_gn(jnp.bfloat16)),
                    ("manual_1pass_bf16apply", manual)):
        float(jnp.sum(f(x).astype(jnp.float32)))  # compile + sync
        t0 = time.perf_counter()
        float(jnp.sum(f(x).astype(jnp.float32)))
        results[name] = round((time.perf_counter() - t0) / n * 1e3, 4)
        print(f"  gn {name:<24} {results[name]:.4f} ms")
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--analytic_only", action="store_true")
    ap.add_argument("--gn_probe", action="store_true",
                    help="also run the GroupNorm formulation shootout")
    ap.add_argument("--out", default="runs/probes/mfu_breakdown.json")
    args = ap.parse_args()
    B = args.batch

    rows, tot_f, tot_b, tot_ms = analytic_table(B)
    print(f"analytic roofline, B={B} (peaks: {PEAK_MXU/1e12:.0f} TF, "
          f"{PEAK_HBM/1e9:.0f} GB/s)")
    for r in sorted(rows, key=lambda r: -r["roofline_ms"]):
        print(f"  {r['stage']:<12} {r['gflops']:>9.1f} GF {r['mbytes']:>8.1f} MB"
              f"  {r['roofline_ms']:>7.3f} ms  {r['bound']}")
    print(f"  TOTAL {tot_f/1e12:.2f} TF, {tot_b/1e9:.2f} GB, "
          f"roofline {tot_ms:.1f} ms -> ceiling MFU "
          f"{tot_f / PEAK_MXU / (tot_ms / 1e3):.3f}")
    result = {"batch": B, "analytic": rows,
              "analytic_total": {"tflops": tot_f / 1e12, "gbytes": tot_b / 1e9,
                                 "roofline_ms": tot_ms,
                                 "mfu_ceiling": tot_f / PEAK_MXU / (tot_ms / 1e3)}}

    if not args.analytic_only:
        import time

        import jax
        import jax.numpy as jnp

        from humanliff_tpu.models.factory import create_model
        from humanliff_tpu.utils.runtime import setup_runtime

        setup_runtime()
        model = create_model(
            image_size=256, in_channels=27, num_channels=192, out_channels=27,
            num_res_blocks=3, learn_sigma=False, class_cond=True,
            attention_resolutions="32,16,8", num_heads=4, num_heads_upsample=-1,
            use_scale_shift_norm=True, cond_type="controlnet",
            use_3d_aware=False, dropout=0.0,
        )
        x0 = jnp.zeros((1, 256, 256, 27))
        params = jax.jit(model.init)(
            jax.random.key(0), x0, jnp.zeros((1,)), x0,
            jnp.zeros((1,), jnp.int32))
        params = jax.tree.map(
            lambda p: p.astype(jnp.bfloat16)
            if p.dtype == jnp.float32 else p, params)

        N = 20

        @jax.jit
        def chain(p, x, xc, y):
            def body(x, t):
                eps = model.apply(
                    p, x.astype(jnp.bfloat16),
                    jnp.full((x.shape[0],), t, jnp.float32),
                    xc.astype(jnp.bfloat16), y).astype(jnp.float32)
                return x - 0.01 * eps, ()
            out, _ = jax.lax.scan(body, x, jnp.arange(N, dtype=jnp.float32))
            return out

        x = jnp.zeros((B, 256, 256, 27))
        y = jnp.zeros((B,), jnp.int32)
        float(jnp.sum(chain(params, x, x, y)))  # compile + sync
        t0 = time.perf_counter()
        float(jnp.sum(chain(params, x, x, y)))
        step_ms = (time.perf_counter() - t0) / N * 1e3

        one = jax.jit(lambda p, x, xc, y: model.apply(
            p, x.astype(jnp.bfloat16), jnp.zeros((x.shape[0],), jnp.float32),
            xc.astype(jnp.bfloat16), y))
        cost = one.lower(params, x, x, y).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        xla_flops = float(cost.get("flops", 0.0))
        xla_bytes = float(cost.get("bytes accessed", 0.0))
        mfu = xla_flops / PEAK_MXU / (step_ms / 1e3)
        print(f"measured: {step_ms:.2f} ms/step  XLA flops {xla_flops/1e12:.2f} TF"
              f"  bytes {xla_bytes/1e9:.2f} GB  MFU {mfu:.3f}")
        print(f"vs analytic roofline {tot_ms:.1f} ms "
              f"(gap {step_ms / tot_ms:.2f}x)")
        result["measured"] = {
            "step_ms": step_ms, "xla_tflops": xla_flops / 1e12,
            "xla_gbytes": xla_bytes / 1e9, "mfu": mfu,
            "roofline_gap": step_ms / tot_ms,
        }

    if args.gn_probe:
        result["gn_probe"] = gn_probe(B)

    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
