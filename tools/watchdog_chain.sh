#!/usr/bin/env bash
# Watchdog for tools/run_eval_chain.sh on the tunneled TPU.
#
# Failure mode it exists for: the axon tunnel sometimes HANGS instead of
# dropping — the in-flight remote_compile RPC never errors, the eval CLI
# sleeps forever with megabytes stuck in its socket Send-Q, and the chain's
# retry wrapper (which only fires when the process EXITS) never gets its
# turn. Observed live in round 5: step 4 slept 30+ min at "compiling
# denoise-step stage" with 3.5 MB queued to a dead tunnel port.
#
# Strategy: watch the step's tee'd log file; if it goes stale for longer
# than STALE_S while the chain is alive, kill the chain shell's python
# descendants (found by walking /proc children of the KNOWN chain PID —
# never by command-line pattern). The retry loop in run_eval_chain.sh then
# relaunches the CLI, which resumes from the persistent compile cache.
#
# Usage: bash tools/watchdog_chain.sh <chain_pid> <logfile> [stale_s]
set -u
CHAIN_PID=${1:?chain pid}
LOG=${2:?log file}
STALE_S=${3:-900}

descendants() {  # all descendant PIDs of $1, via /proc/*/task/*/children
    local pid=$1 out="" queue=("$1")
    while [ ${#queue[@]} -gt 0 ]; do
        local p=${queue[0]}; queue=("${queue[@]:1}")
        for f in /proc/"$p"/task/*/children; do
            [ -r "$f" ] || continue
            for c in $(cat "$f" 2>/dev/null); do
                out="$out $c"; queue+=("$c")
            done
        done
    done
    echo "$out"
}

while kill -0 "$CHAIN_PID" 2>/dev/null; do
    sleep 60
    [ -e "$LOG" ] || continue
    now=$(date +%s); mt=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
    age=$((now - mt))
    if [ "$age" -ge "$STALE_S" ]; then
        echo "[watchdog $(date +%H:%M:%S)] $LOG stale ${age}s — killing chain pythons"
        for pid in $(descendants "$CHAIN_PID"); do
            comm=$(cat /proc/"$pid"/comm 2>/dev/null || true)
            if [ "$comm" = python ] || [ "$comm" = python3 ]; then
                echo "[watchdog] kill -9 $pid ($comm)"
                kill -9 "$pid" 2>/dev/null || true
            fi
        done
        sleep 120   # give the retry loop time to respawn + touch the log
    fi
done
echo "[watchdog] chain $CHAIN_PID gone — exiting"
