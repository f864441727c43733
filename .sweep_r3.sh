#!/bin/bash
# Production Re x Pe sweep with a wedge watchdog: if neither the log nor
# any sweep artifact changes for STALE_S seconds, the attempt is killed
# and retried — balance partial checkpoints + --skip_existing make every
# retry resume where the last one stopped.
LOG=/root/repo/validation/sweep_r3.log
OUT=/root/repo/validation/sweep_out
FLUID=${1:-water}
STALE_S=900
MAX_TRIES=40

mkdir -p "$OUT"
for try in $(seq 1 $MAX_TRIES); do
  echo "=== attempt $try ($(date +%H:%M:%S)) ===" >> "$LOG"
  python -u /root/repo/validation/run_batch_pe.py "$FLUID" >> "$LOG" 2>&1 &
  PID=$!
  while kill -0 $PID 2>/dev/null; do
    sleep 60
    # newest activity among log + artifacts
    newest=$(find "$LOG" "$OUT" -type f -printf '%T@\n' 2>/dev/null | sort -rn | head -1 | cut -d. -f1)
    now=$(date +%s)
    if [ -n "$newest" ] && [ $((now - newest)) -gt $STALE_S ]; then
      echo "=== watchdog: stale $((now - newest))s, killing attempt $try ===" >> "$LOG"
      kill $PID 2>/dev/null
      sleep 10
      kill -9 $PID 2>/dev/null
      break
    fi
  done
  wait $PID
  rc=$?
  echo "=== attempt $try exited rc=$rc ===" >> "$LOG"
  if [ $rc -eq 0 ]; then
    echo "=== SWEEP COMPLETE ($(date +%H:%M:%S)) ===" >> "$LOG"
    exit 0
  fi
  sleep 30
done
echo "=== SWEEP FAILED after $MAX_TRIES attempts ===" >> "$LOG"
exit 1
