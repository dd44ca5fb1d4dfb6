"""humanliff_tpu — a TPU-native JAX framework for layer-wise 3D human generation.

A from-scratch rebuild of the capabilities of skhu101/HumanLiff (layer-wise 3D human
generation with diffusion models) designed for TPU hardware:

- Stage 1 (``humanliff_tpu.nerf``, ``humanliff_tpu.train.stage1``): per-subject,
  per-clothing-layer tri-plane feature grids plus a small shared NeRF decoder, fitted by
  hierarchical volume rendering. The hot path (nine-plane bilinear gather, point MLP,
  alpha compositing) is a single jitted function over fixed-shape ray tiles.
- Stage 2 (``humanliff_tpu.diffusion``, ``humanliff_tpu.models.unet``,
  ``humanliff_tpu.train.stage2``): an improved-diffusion UNet with ControlNet-style
  layer conditioning, trained on tri-planes as 27x256x256 images; DDPM/DDIM sampling as
  ``lax.scan`` loops.
- Scaling (``humanliff_tpu.parallel``): ``jax.sharding.Mesh`` + sharding annotations;
  batch sharded over the ``data`` axis, the tri-plane table sharded by instance,
  decoder/UNet params replicated. Collectives are compiler-inserted psums.

Reference behavior parity is documented per-function with ``file:line`` citations into
the PyTorch reference (see SURVEY.md).
"""

__version__ = "0.1.0"
