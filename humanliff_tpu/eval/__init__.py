"""Evaluation: image-quality metrics (PSNR/SSIM/LPIPS) and the eval harness."""

from humanliff_tpu.eval.metrics import psnr, ssim, mse, lpips_fn
