#!/bin/bash
# Generic tunnel-hardened supervisor: run any resumable campaign command under
# the wedge-detection loop of scripts/supervise_quality.sh (probe the TPU
# claim, launch, SIGTERM + relaunch when log mtime AND /proc rchar are BOTH
# frozen > STALL_S). The command must be checkpoint-resumable and must create
# DONE_FILE when complete.
#
# Hardening (ADVICE r3): deterministic startup failures (bad flag, missing
# checkpoint) exit fast with rc!=0 — after MAX_FASTFAIL consecutive such exits
# the supervisor bails instead of spinning the single-core host forever; and
# when /proc/$PID/io is unreadable the stall detector degrades to a
# log-mtime-only criterion at double the threshold rather than resetting.
#
# STALL_S sizing (round-5 lesson): tunnel readback moves NEITHER the log NOR
# rchar, so any silent phase longer than STALL_S gets SIGTERM'd as a wedge.
# Checkpoint saves are covered by train/checkpoint.py's 60 s heartbeat, but a
# FRESH flagship XLA compile is ~10 min of total silence (and only caches on
# completion — killing it mid-compile loops forever). Use STALL_S>=1200 for
# launches whose programs are not yet in the persistent compile cache.
#
# Usage:
#   DONE_FILE=runs/quality/stage2/STAGE2.md LOG=/tmp/stage2.log \
#     bash scripts/supervise.sh python -u -m humanliff_tpu.cli.quality_stage2 ...
set -u
LOG=${LOG:-/tmp/supervised_campaign.log}
DONE_FILE=${DONE_FILE:?set DONE_FILE to the artifact the campaign writes last}
STALL_S=${STALL_S:-360}
PIDFILE=${PIDFILE:-/tmp/supervised_campaign.pid}
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
  echo "[supervisor] launch attempt $attempt ($(date -u +%H:%M:%S)): $*"
  start_ts=$(date +%s)
  "$@" >>"$LOG" 2>&1 &
  PID=$!
  echo $PID > "$PIDFILE"
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
  if [ -f "$DONE_FILE" ] && [ "$DONE_FILE" -nt "$PIDFILE" ]; then
    echo "[supervisor] campaign complete (rc=$rc) — $DONE_FILE written"
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
