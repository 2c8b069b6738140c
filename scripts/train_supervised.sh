#!/bin/bash
# Self-healing single-host training: relaunch train.py until it finishes.
# Usage: scripts/train_supervised.sh <cfg> [extra train.py args...]
#
# Every (re)launch is the SAME command — TRAIN.RESUME=auto resolves to the
# newest `preempt` (graceful SIGTERM stop) or `epoch_N` (what a hard crash
# leaves behind) checkpoint under cfg.OUTPUT_DIR, or a fresh start when none
# exists. MAED_PREEMPT_EXIT makes a graceful preemption distinguishable
# from a completed run (train.py defaults it to exit 0 for pod managers),
# so: 0 = done, 75 = preempted (relaunch at once), anything else = crash
# (relaunch after a backoff). Crash relaunches are bounded by
# MAED_MAX_RELAUNCHES (default 100); preemption relaunches are not.
set -u

CFG="$1"; shift
MAX=${MAED_MAX_RELAUNCHES:-100}
export PYTHONPATH="$(cd "$(dirname "$0")/.." && pwd):${PYTHONPATH:-}"
export MAED_PREEMPT_EXIT=75

crashes=0
while true; do
    python "$(dirname "$0")/../train.py" --cfg "$CFG" "$@" TRAIN.RESUME auto
    rc=$?
    case $rc in
        0)
            echo "[train_supervised] training complete ($crashes crash relaunches)"
            exit 0 ;;
        75)
            echo "[train_supervised] preempted — relaunching" >&2 ;;
        *)
            crashes=$((crashes + 1))
            if [ "$crashes" -gt "$MAX" ]; then
                echo "[train_supervised] gave up after $MAX crash relaunches" >&2
                exit 1
            fi
            echo "[train_supervised] exit $rc — crash relaunch $crashes/$MAX in 30s" >&2
            sleep 30 ;;
    esac
done
