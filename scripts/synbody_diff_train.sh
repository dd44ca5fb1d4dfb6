#!/usr/bin/env bash
# Stage-2 diffusion training, flagship config (reference launch script:
# triplane_scripts/SynBody_triplane_train_layered_cond_controlnet_scale_256x256x27_tv_loss_nineplane.sh:
# diff_steps 1000, channels 27, num_channels 192, 3 res blocks, attn 32/16/8,
# class_cond, lr 5e-5, batch 8, microbatch 2, EMA 0.9999, AMP->bf16).
PACKED="${1:?usage: $0 PACKED_PLANES.npy}"
python -m humanliff_tpu.cli.diff_train \
  --data_dir "$PACKED" \
  --image_size 256 --in_channels 27 --out_channels 27 --num_channels 192 \
  --num_res_blocks 3 --attention_resolutions 32,16,8 --class_cond true \
  --diffusion_steps 1000 --lr 5e-5 --batch_size 8 --microbatch 2 \
  --ema_rate 0.9999 --use_amp true --save_interval 50000 \
  --cond_type controlnet --use_checkpoint true --total_steps "${2:-300000}" --logdir ./logs/diffusion
