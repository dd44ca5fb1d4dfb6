#!/usr/bin/env bash
# Stage-2 generative-quality campaign on the pinned synthetic benchmark.
#
# One command: exports the stage-1 campaign planes, fine-tunes extra subjects
# against the frozen decoder, trains the flagship diffusion model, samples the
# 4-layer chain, and scores it (held-out denoise loss, chain fidelity in plane
# and image space, nearest-GT PSNR) into $OUT/stage2/STAGE2.md. Every leg
# skips itself when its artifact exists, so re-running resumes.
#
#   bash scripts/quality_stage2.sh [out_dir] [extra quality_stage2 flags...]
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-runs/quality}"
shift || true
python -u -m humanliff_tpu.cli.quality_stage2 --out_dir "$OUT" "$@"
