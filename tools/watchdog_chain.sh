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
# Discriminator: a HEALTHY long remote compile keeps Send-Q at 0 (request
# long since delivered, client waiting for the reply); a dead tunnel shows
# bytes wedged in Send-Q on every sample (the client re-sends the RPC to
# one relay port after another and nothing drains). Log staleness alone
# CANNOT tell these apart — a single denoise-step compile was observed
# healthy at 20+ minutes. So: kill only when the step log is stale AND the
# chain's python shows a nonzero Send-Q on STRIKES consecutive samples.
#
# Second failure mode (observed r5, epoch-0 checkpoint save): the tunnel
# restarts mid-RPC, the client reconnects to a fresh relay that has no
# memory of the request, and then waits forever with Send-Q ZERO — the
# Send-Q discriminator never fires. Signature via `ss -ti`: lastrcv on
# every tunnel socket grows unboundedly (no reply bytes EVER arrive, not
# even gRPC keepalives). A healthy long compile is indistinguishable
# except by duration, so this path uses a much larger threshold:
# RECV_STALE_S (default 1500 s = 25 min of zero received bytes) and its
# own strike counter. Cost of a false kill is bounded: the persistent
# compile cache makes the retried CLI resume all COMPLETED compiles.
#
# Kill targets are found by walking /proc children of the KNOWN chain PID —
# never by command-line pattern. The retry loop in run_eval_chain.sh then
# relaunches the CLI, which resumes from the persistent compile cache.
#
# Third failure mode (observed r5 day-2, fresh boot): the relay accepts
# local connections but the far side never answers ANY RPC — the client
# hangs inside its first compile with NO TCP socket at all (only internal
# unix-stream self-pipes). Neither Send-Q nor lastrcv can see this, so:
# if the log is stale AND no chain python owns any ESTAB TCP socket for
# NOSOCK_STRIKES consecutive samples, kill. False-positive risk is a long
# pure-local CPU phase, which no chain step has past the first minute —
# every heavy phase holds a connection to the relay while waiting.
#
# Usage: bash tools/watchdog_chain.sh <chain_pid> <logfile> [stale_s] [strikes]
set -u
CHAIN_PID=${1:?chain pid}
LOG=${2:?log file}
STALE_S=${3:-900}
STRIKES=${4:-5}
RECV_STALE_S=${5:-1500}
RECV_STRIKES=${6:-3}
NOSOCK_STRIKES=${7:-8}

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

sendq() {  # total Send-Q bytes across sockets owned by pid $1
    ss -tnp 2>/dev/null | awk -v pid="pid=$1," '
        index($0, pid) { s += $2 } END { print s + 0 }'
}

min_lastrcv_ms() {  # min lastrcv (ms) across ESTAB sockets of pid $1;
                    # -1 when the pid owns no established socket (treat as
                    # healthy: CLI may be in a pure-CPU phase)
    ss -tinp 2>/dev/null | awk -v pid="pid=$1," '
        /^ESTAB/ { take = index($0, pid) > 0; next }
        take {
            if (match($0, /lastrcv:[0-9]+/)) {
                v = substr($0, RSTART + 8, RLENGTH - 8) + 0
                if (best < 0 || v < best) best = v
            }
            take = 0
        }
        BEGIN { best = -1 } END { print best }'
}

kill_pythons() {
    echo "[watchdog $(date +%H:%M:%S)] $1 — killing chain pythons"
    for pid in $(descendants "$CHAIN_PID"); do
        comm=$(cat /proc/"$pid"/comm 2>/dev/null || true)
        case "$comm" in python*)
            echo "[watchdog] kill -9 $pid"
            kill -9 "$pid" 2>/dev/null || true
        esac
    done
}

strikes=0
rstrikes=0
nstrikes=0
while kill -0 "$CHAIN_PID" 2>/dev/null; do
    sleep 60
    [ -e "$LOG" ] || continue
    now=$(date +%s); mt=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
    age=$((now - mt))
    if [ "$age" -lt "$STALE_S" ]; then
        strikes=0; rstrikes=0; nstrikes=0
        continue
    fi
    wedged=0; any_py=0; saw_recent=0; saw_stale=0; saw_sock=0
    for pid in $(descendants "$CHAIN_PID"); do
        comm=$(cat /proc/"$pid"/comm 2>/dev/null || true)
        case "$comm" in python*)
            any_py=1
            q=$(sendq "$pid")
            [ "$q" -gt 0 ] && { wedged=1; saw_sock=1; }
            r=$(min_lastrcv_ms "$pid")
            if [ "$r" -ge 0 ] && [ "$r" -lt $((RECV_STALE_S * 1000)) ]; then
                saw_recent=1   # this python heard from the tunnel recently
                saw_sock=1
            elif [ "$r" -ge $((RECV_STALE_S * 1000)) ]; then
                saw_stale=1
                saw_sock=1
            fi
        esac
    done
    [ "$any_py" -eq 0 ] && { strikes=0; rstrikes=0; nstrikes=0; continue; }
    starved=$((saw_stale == 1 && saw_recent == 0))
    if [ "$wedged" -eq 1 ]; then
        strikes=$((strikes + 1))
        echo "[watchdog $(date +%H:%M:%S)] log stale ${age}s, Send-Q wedged (strike $strikes/$STRIKES)"
    else
        strikes=0
    fi
    if [ "$starved" -eq 1 ]; then
        rstrikes=$((rstrikes + 1))
        echo "[watchdog $(date +%H:%M:%S)] log stale ${age}s, no bytes received >${RECV_STALE_S}s (strike $rstrikes/$RECV_STRIKES)"
    else
        rstrikes=0
    fi
    if [ "$saw_sock" -eq 0 ]; then
        nstrikes=$((nstrikes + 1))
        echo "[watchdog $(date +%H:%M:%S)] log stale ${age}s, no tunnel socket at all (strike $nstrikes/$NOSOCK_STRIKES)"
    else
        nstrikes=0
    fi
    if [ "$strikes" -ge "$STRIKES" ]; then
        kill_pythons "dead tunnel (wedged Send-Q)"
        strikes=0; rstrikes=0; nstrikes=0
        sleep 120   # give the retry loop time to respawn + touch the log
    elif [ "$rstrikes" -ge "$RECV_STRIKES" ]; then
        kill_pythons "dead tunnel (lost reply: zero received bytes)"
        strikes=0; rstrikes=0; nstrikes=0
        sleep 120
    elif [ "$nstrikes" -ge "$NOSOCK_STRIKES" ]; then
        kill_pythons "dead tunnel (hung client with no TCP socket)"
        strikes=0; rstrikes=0; nstrikes=0
        sleep 120
    fi
done
echo "[watchdog] chain $CHAIN_PID gone — exiting"
