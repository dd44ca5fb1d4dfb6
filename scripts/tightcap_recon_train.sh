#!/usr/bin/env bash
# Stage-1 shared reconstruction on TightCap — canonical-space mode (reference:
# README.md TightCap flow; configs/TightCap.txt: image_scaling 1.0, SMPL,
# use_canonical_space, tv 1e-2 / l1 5e-4 per the launch scripts).
python -m humanliff_tpu.cli.recon_train \
  --config configs/TightCap.txt \
  --data_root "${1:?usage: $0 DATA_ROOT}" \
  --batch_size "${2:-2}" \
  --n_iteration "${3:-200000}"
