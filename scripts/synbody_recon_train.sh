#!/usr/bin/env bash
# Stage-1 shared reconstruction on SynBody (reference: README.md:104 — 200k steps,
# batch 2/host-replica, 2048 rays, 128+128 samples).
python -m humanliff_tpu.cli.recon_train \
  --config configs/SynBody.txt \
  --data_root "${1:?usage: $0 DATA_ROOT}" \
  --batch_size "${2:-2}" \
  --n_iteration "${3:-200000}"
