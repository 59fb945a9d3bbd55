#!/bin/bash
# Run a chip job with a stall watchdog: if the log stops growing for
# STALL_S seconds, kill the job and retry (the axon remote executor
# occasionally wedges a dispatch forever; a fresh process recovers).
# Usage: chip_watchdog.sh LOGFILE MAX_TRIES STALL_S -- cmd args...
set -u
LOG=$1; TRIES=$2; STALL=$3; shift 4  # consumes '--'
for attempt in $(seq 1 "$TRIES"); do
  : > "$LOG"
  echo "[watchdog] attempt $attempt: $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  last_size=-1
  last_change=$(date +%s)
  while kill -0 "$PID" 2>/dev/null; do
    sleep 15
    size=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
    # CPU time also counts as progress (long silent compute phases)
    cpu=$(awk '{print $14+$15}' /proc/$PID/stat 2>/dev/null || echo 0)
    sig="$size:$cpu"
    if [ "$sig" != "$last_size" ]; then
      last_size=$sig
      last_change=$(date +%s)
    elif [ $(( $(date +%s) - last_change )) -ge "$STALL" ]; then
      echo "[watchdog] stalled ${STALL}s on attempt $attempt; killing $PID" >> "$LOG"
      kill "$PID" 2>/dev/null
      sleep 5
      kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  if wait "$PID" 2>/dev/null; then
    echo "[watchdog] success on attempt $attempt" >> "$LOG"
    exit 0
  fi
done
echo "[watchdog] all $TRIES attempts failed" >> "$LOG"
exit 1
