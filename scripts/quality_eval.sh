#!/usr/bin/env bash
# Pinned synthetic quality-parity campaign (VERDICT r2 item 1).
#
# One command: trains stage-1 to convergence on the synthetic layered
# benchmark and scores it with the reference protocol (all_test.py semantics),
# writing $OUT/QUALITY.md + metrics artifacts. Re-running resumes/skips train.
#
#   bash scripts/quality_eval.sh [out_dir] [extra quality_eval flags...]
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-runs/quality}"
shift || true
python -m humanliff_tpu.cli.quality_eval --out_dir "$OUT" "$@"
