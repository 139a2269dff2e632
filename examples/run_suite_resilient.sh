#!/bin/bash
# Tunnel-resilient multi-task suite training.
#
# The dev TPU tunnel can wedge mid-run (the client blocks forever in a
# device call with frozen CPU time; a fresh probe process hangs too
# until the wedged client is killed and the remote session cleans up).
# This supervisor runs kitchen_multitask_suite.py --train_only in a
# loop: it watches the trainer's CPU time, and when no progress is made
# for STALL_S seconds it dumps Python stacks (SIGUSR1 -> faulthandler),
# kills the process, waits for the tunnel to answer a tiny probe again,
# and relaunches with --resume (full-state resume: params + optimizer +
# rng from latest_full.state, continuing at saved_epoch + 1). At most
# save_every epochs of progress are lost per wedge.
#
#   OUT=/tmp/suite EPOCHS=240 SAVE_EVERY=20 bash examples/run_suite_resilient.sh
set -u
OUT=${OUT:-/tmp/kitchen_suite}
EPOCHS=${EPOCHS:-240}
SAVE_EVERY=${SAVE_EVERY:-20}
STALL_S=${STALL_S:-180}
MAX_RESTARTS=${MAX_RESTARTS:-30}
EXTRA_ARGS=${EXTRA_ARGS:-"--n_demos 40 --action_noise 0.05 --balance_tasks"}
LOG=${LOG:-$OUT/train_supervised.log}

mkdir -p "$OUT"
cd "$(dirname "$0")/.."

restarts=0
while true; do
    echo "[supervisor] launch (attempt $((restarts + 1)))" | tee -a "$LOG"
    python -u examples/kitchen_multitask_suite.py \
        $EXTRA_ARGS --epochs "$EPOCHS" --save_every "$SAVE_EVERY" \
        --out "$OUT" --train_only --resume >> "$LOG" 2>&1 &
    pid=$!
    last_cpu=""
    stalled=0
    while kill -0 "$pid" 2>/dev/null; do
        sleep 30
        cpu=$(awk '{print $14 + $15}' "/proc/$pid/stat" 2>/dev/null || true)
        if [ -z "$cpu" ]; then break; fi
        # delta threshold, not equality: a wedged device call still
        # accrues ~1 tick/30s from signal housekeeping, which reset the
        # equality-based stall counter and let wedges run for 30 min
        # (observed round 5, three consecutive S3 wedges)
        if [ -n "$last_cpu" ] && [ $((cpu - last_cpu)) -lt 3 ]; then
            stalled=$((stalled + 30))
        else
            stalled=0
        fi
        last_cpu=$cpu
        if [ "$stalled" -ge "$STALL_S" ]; then
            echo "[supervisor] wedge: no CPU progress for ${stalled}s;" \
                 "dumping stacks + killing $pid" | tee -a "$LOG"
            kill -USR1 "$pid" 2>/dev/null
            sleep 3
            kill "$pid" 2>/dev/null
            sleep 5
            kill -9 "$pid" 2>/dev/null
            break
        fi
    done
    wait "$pid"
    rc=$?
    if [ "$rc" -eq 0 ]; then
        echo "[supervisor] training complete" | tee -a "$LOG"
        break
    fi
    restarts=$((restarts + 1))
    if [ "$restarts" -ge "$MAX_RESTARTS" ]; then
        echo "[supervisor] giving up after $restarts restarts" | tee -a "$LOG"
        exit 1
    fi
    # wait until the remote session has cleaned up and a fresh client
    # can run a tiny op again (observed: 1-4 min after killing the
    # wedged client)
    until timeout 60 python -c \
        "import jax, jax.numpy as jnp; float(jnp.ones((8, 8)).sum())" \
        > /dev/null 2>&1; do
        echo "[supervisor] tunnel still wedged; waiting 30s" | tee -a "$LOG"
        sleep 30
    done
    echo "[supervisor] tunnel recovered; resuming" | tee -a "$LOG"
done
