#!/usr/bin/env bash
# Stage-2 diffusion on packed TightCap planes (flagship hyperparameters,
# reference TightCap_triplane_train_..._nineplane.sh).
python -m humanliff_tpu.cli.diff_train \
  --data_dir "${1:?usage: $0 PACKED_PLANES.npy}" \
  --image_size 256 --in_channels 27 --out_channels 27 --num_channels 192 \
  --num_res_blocks 3 --attention_resolutions 32,16,8 --class_cond true \
  --cond_type controlnet --diffusion_steps 1000 --noise_schedule linear \
  --lr 5e-5 --batch_size "${2:-8}" --microbatch "${3:-0}" --use_amp true \
  --ema_rate 0.9999 --save_interval 50000 --total_steps "${4:-200000}" \
  --logdir "${5:-./logs/tightcap_diffusion}"
