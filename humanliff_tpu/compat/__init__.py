"""Compatibility: import reference PyTorch checkpoints into humanliff_tpu params."""

from humanliff_tpu.compat.torch_import import (
    import_stage1_checkpoint,
    import_unet_checkpoint,
)
