#!/usr/bin/env bash
# Per-subject fine-tune (reference: README.md:109 — 2k steps per subject-layer).
python -m humanliff_tpu.cli.recon_ft \
  --config configs/SynBody.txt \
  --data_root "${1:?usage: $0 DATA_ROOT [START] [END]}" \
  --start_idx "${2:-0}" --end_idx "${3:-100}" \
  --ft_steps 2000 --out_dir ./triplanes
