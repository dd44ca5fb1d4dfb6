"""Quadrature error budget of the synthetic quality protocol.

The synthetic benchmark's GT is a uniform-quadrature ray march
(data/synthetic.py _quadrature): 96 samples for training items, 192 for eval
items (test_item default). This probe measures how converged those GTs are
against a 1024-sample reference on a held-out-style view, i.e. the PSNR
CEILING the protocol imposes independent of fit quality (a perfect fit
rendered with a different-but-denser sampling scheme cannot agree with an
n-sample GT beyond the GT's own convergence).

Measured on (inst 0, layer 3, view 160), mask pixels, 128^2:

    PSNR(96  vs 1024) ~ 32.2 dB   (training GT floor)
    PSNR(128 vs 1024) ~ 34.6 dB
    PSNR(192 vs 1024) ~ 38.4 dB   (eval GT floor)
    PSNR(256 vs 1024) ~ 40.6 dB

So eval numbers are integration-limited only above ~37 dB; below that the
score reflects fit error. Run: python scripts/probe_gt_ceiling.py
"""

from __future__ import annotations

import numpy as np

from humanliff_tpu.data.synthetic import SyntheticLayeredDataset


def main():
    ds = SyntheticLayeredDataset(
        num_instances=2, n_rays=2048, image_size=128, tight_bounds=True
    )
    inst, layer, view = 0, 3, 160
    gt = ds._view_gt(inst, layer, view)
    ro, rd, nr, fr = gt["rays_o"], gt["rays_d"], gt["near"], gt["far"]

    ref, acc_ref = ds._quadrature(inst, layer, ro, rd, nr, fr, n_samples=1024)
    mask = acc_ref > 0.5

    def psnr(a):
        return float(-10 * np.log10(np.mean((a[mask] - ref[mask]) ** 2)))

    print(f"rays {len(ro)}, mask {int(mask.sum())}")
    for n in (96, 128, 192, 256, 512):
        rgb, _ = ds._quadrature(inst, layer, ro, rd, nr, fr, n_samples=n)
        print(f"PSNR({n:4d} vs 1024) = {psnr(rgb):.2f} dB")


if __name__ == "__main__":
    main()
