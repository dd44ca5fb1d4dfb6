#!/bin/bash
# Supervised quality campaign (scripts/quality_eval.sh hardened for the axon
# tunnel): the remote executor can wedge a long run even under strictly-serial
# per-step dispatch (observed once in ~8000 steps — the per-step float()
# readback never returns, rchar frozen). Training is checkpoint-resumable, so
# the robust pattern is an external supervisor:
#
#   1. probe the TPU until the previous process's device claim is released
#      (a killed client holds it 3-15 min; launching early wedges the new
#      process too),
#   2. (re)launch the campaign (it resumes from the latest checkpoint and
#      skips straight to eval when training is already done),
#   3. declare a stall only when BOTH the log mtime is stale AND /proc rchar
#      is frozen for >6 min (executable-cache loads stall the log for 3-4 min
#      but keep rchar growing), then SIGTERM and loop. When /proc io is
#      unreadable, degrade to log-mtime-only at double the threshold.
#   4. bail after MAX_FASTFAIL consecutive fast (<60s, rc!=0, non-signal)
#      exits — a deterministic startup failure must not spin the host.
#
# Usage: bash scripts/supervise_quality.sh [STEPS] [EXTRA_ARGS...]
set -u
STEPS=${1:-18000}
shift || true
OUT=${OUT:-runs/quality}
LOG=${LOG:-/tmp/quality_campaign.log}
STALL_S=${STALL_S:-360}
MAX_FASTFAIL=${MAX_FASTFAIL:-4}

probe_tpu() {
  for i in $(seq 1 40); do
    if timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256)); print('TPU_OK', float(jnp.sum(x @ x)))
" 2>/dev/null | grep -q TPU_OK; then
      echo "[supervisor] TPU claim free (attempt $i)"
      return 0
    fi
    sleep 20
  done
  echo "[supervisor] TPU never came back"; return 1
}

attempt=0
fastfail=0
while true; do
  attempt=$((attempt + 1))
  probe_tpu || exit 1
  echo "[supervisor] launch attempt $attempt ($(date -u +%H:%M:%S))"
  start_ts=$(date +%s)
  python -u -m humanliff_tpu.cli.quality_eval \
    --out_dir "$OUT" --steps "$STEPS" --fast_eval "$@" >>"$LOG" 2>&1 &
  PID=$!
  echo $PID > /tmp/quality_campaign.pid
  last_rchar=""
  frozen=0
  while kill -0 $PID 2>/dev/null; do
    sleep 60
    rchar=$(grep '^rchar' /proc/$PID/io 2>/dev/null | awk '{print $2}')
    age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ -n "$rchar" ]; then
      if [ "$rchar" = "$last_rchar" ] && [ "$age" -gt 120 ]; then
        frozen=$((frozen + 60))
      else
        frozen=0
      fi
      last_rchar=$rchar
    elif [ "$age" -gt 120 ]; then
      # /proc io unreadable: log-mtime-only at half credit (2x threshold).
      frozen=$((frozen + 30))
    else
      frozen=0
    fi
    if [ "$frozen" -ge "$STALL_S" ]; then
      echo "[supervisor] stall: log ${age}s stale, frozen ${frozen}s — SIGTERM $PID"
      kill -TERM $PID; sleep 20
      kill -KILL $PID 2>/dev/null
      break
    fi
  done
  wait $PID 2>/dev/null
  rc=$?
  if [ -f "$OUT/QUALITY.md" ] && [ "$OUT/QUALITY.md" -nt /tmp/quality_campaign.pid ]; then
    echo "[supervisor] campaign complete (rc=$rc) — QUALITY.md written"
    exit 0
  fi
  dur=$(( $(date +%s) - start_ts ))
  if [ "$rc" -ne 0 ] && [ "$rc" -lt 128 ] && [ "$dur" -lt 60 ]; then
    fastfail=$((fastfail + 1))
    if [ "$fastfail" -ge "$MAX_FASTFAIL" ]; then
      echo "[supervisor] $fastfail consecutive fast startup failures (rc=$rc after ${dur}s) — bailing"
      exit 1
    fi
    echo "[supervisor] fast failure $fastfail/$MAX_FASTFAIL (rc=$rc after ${dur}s), backoff $((fastfail * 60))s"
    sleep $((fastfail * 60))
  else
    fastfail=0
  fi
  echo "[supervisor] relaunching (rc=$rc)"
done
