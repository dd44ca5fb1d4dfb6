#!/usr/bin/env bash
# Layered sampling + canonical-space decode for TightCap (reference:
# TightCap_triplane_sample_layered_..._nineplane.sh — 250 respaced steps x 4
# chained layers; decode renders through inverse-LBS with big-pose bounds).
MODEL_DIR="${1:?usage: $0 STAGE2_CKPT_DIR STAGE1_CKPT_DIR [DATA_ROOT]}"
STAGE1="${2:?usage: $0 STAGE2_CKPT_DIR STAGE1_CKPT_DIR [DATA_ROOT]}"
DATA_ROOT="${3:-}"
VIEW_ARGS=()
if [ -n "$DATA_ROOT" ]; then
  VIEW_ARGS=(--view_dataset tightcap --data_root "$DATA_ROOT")
fi
python -m humanliff_tpu.cli.diff_sample \
  --model_dir "$MODEL_DIR" --stage1_ckpt "$STAGE1" \
  --image_size 256 --in_channels 27 --out_channels 27 --num_channels 192 \
  --num_res_blocks 3 --attention_resolutions 32,16,8 --class_cond true \
  --diffusion_steps 1000 --timestep_respacing 250 \
  --batch_size 1 --num_samples 25 --all_layers --decode \
  --num_views 40 --render_size 512 --mesh_resolution 512 \
  "${VIEW_ARGS[@]}" \
  --out_dir "${4:-./samples_tightcap}"
