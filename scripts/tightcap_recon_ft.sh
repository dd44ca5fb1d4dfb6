#!/usr/bin/env bash
# Stage-1 per-subject fine-tune on TightCap (frozen decoder, layer cascade,
# 2000 steps per subject-layer; reference run_nerf_batch_ft.py).
python -m humanliff_tpu.cli.recon_ft \
  --config configs/TightCap.txt \
  --data_root "${1:?usage: $0 DATA_ROOT START_IDX END_IDX}" \
  --start_idx "${2:?}" --end_idx "${3:?}" \
  --ft_steps "${4:-2000}" --out_dir "${5:-./triplanes_tightcap}"
