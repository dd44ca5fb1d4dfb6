#!/usr/bin/env bash
# Stage-2 generative-quality campaign on the pinned synthetic benchmark.
#
# One command: exports the stage-1 campaign planes, fine-tunes extra subjects
# against the frozen decoder, trains the flagship diffusion model, samples the
# 4-layer chain, and scores it (held-out denoise loss, chain fidelity in plane
# and image space, nearest-GT PSNR) into $OUT/stage2/STAGE2.md. Every leg
# skips itself when its artifact exists, so re-running resumes.
#
# Defaults are the flagship campaign that produced the committed STAGE2.md:
# 25k diffusion steps (~2.7 h at the measured 2.56 steps/s), light mid-saves
# every 6000 steps (bounded wedge recovery; ~12 min tunnel readback each),
# and NO final checkpoint — sampling/scoring consume the in-memory weights
# (the flagship save costs ~11-22 min each way on the tunneled chip).
#
#   bash scripts/quality_stage2.sh [out_dir] [extra quality_stage2 flags...]
#
# Long tunneled runs go under the wedge supervisor (CLAUDE.md). STALL_S must
# exceed the fresh-compile silence (~10 min) when the train program is not in
# the persistent XLA cache yet — see scripts/supervise.sh:
#   DONE_FILE=runs/quality/stage2/stage2_metrics.json LOG=/tmp/stage2.log \
#     PIDFILE=/tmp/stage2.pid STALL_S=1200 bash scripts/supervise.sh \
#     bash scripts/quality_stage2.sh
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-runs/quality}"
shift || true
DIFF_STEPS="${DIFF_STEPS:-25000}"
python -u -m humanliff_tpu.cli.quality_stage2 --out_dir "$OUT" \
    --diff_steps "$DIFF_STEPS" --save_interval 6000 \
    --mid_save light --final_save none "$@"
