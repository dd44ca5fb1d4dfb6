#!/usr/bin/env bash
# Layered sampling, flagship config (reference: 250 respaced steps x 4 chained
# layers, batch 1, 25 samples; 40 novel views at 128+128; 512^3 mesh).
MODEL_DIR="${1:?usage: $0 STAGE2_CKPT_DIR STAGE1_CKPT_DIR}"
STAGE1="${2:?usage: $0 STAGE2_CKPT_DIR STAGE1_CKPT_DIR}"
python -m humanliff_tpu.cli.diff_sample \
  --model_dir "$MODEL_DIR" --stage1_ckpt "$STAGE1" \
  --image_size 256 --in_channels 27 --out_channels 27 --num_channels 192 \
  --num_res_blocks 3 --attention_resolutions 32,16,8 --class_cond true \
  --diffusion_steps 1000 --timestep_respacing 250 \
  --batch_size 1 --num_samples 25 --all_layers --decode \
  --num_views 40 --render_size 512 --mesh_resolution 512 \
  --out_dir ./samples
