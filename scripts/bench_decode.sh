#!/usr/bin/env bash
# Regenerable decode-workload bench: exact vs fast tier on the quality
# campaign's fitted scene. Produces runs/quality/bench_decode.json.
#
#   bash scripts/quality_eval.sh        # (once) fit the scene
#   bash scripts/bench_decode.sh [extra bench_decode flags...]
set -euo pipefail
cd "$(dirname "$0")/.."
python -m humanliff_tpu.cli.bench_decode "$@"
