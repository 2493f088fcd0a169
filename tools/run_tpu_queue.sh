#!/usr/bin/env bash
# Serialized TPU follow-up queue for round 5 (runs AFTER the eval chain —
# one TPU-touching process at a time, ever).
#
#   1. profile_b2 phase decomposition (VERDICT r4 #3)  -> PROFILE_r05/
#   2. same, one traced iteration (jax.profiler)       -> PROFILE_r05/trace
#   3. trace -> per-op device-time breakdown           (VERDICT r4 #4)
#   4. chunk4 + control A/B cells                      (VERDICT r4 #6)
#   5. ftiled fwd+bwd crash bisect                     (VERDICT r4 #5)
#   6. full bench.py                                   -> fresh headline
#
# Usage: WAIT_PID=<chain pid> bash tools/run_tpu_queue.sh
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-PROFILE_r05}
mkdir -p "$OUT"

if [ -n "${WAIT_PID:-}" ]; then
    echo "[queue] waiting for chain pid $WAIT_PID to finish..."
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
    echo "[queue] chain done at $(date +%H:%M:%S)"
fi

wait_tunnel() {  # bounded probe; see tools/tpu_up.py (lost-reply mode)
    local w=0
    until timeout 180 python tools/tpu_up.py >/dev/null 2>&1; do
        w=$((w + 1))
        [ "$w" -ge "${PROBE_LIMIT:-120}" ] && { echo "[queue] tunnel never returned"; return 1; }
        echo "[queue] tunnel down (probe $w) — waiting 60s"; sleep 60
    done
}
retry() {  # tunnel drops present as process death; compile cache resumes
    local n=0
    wait_tunnel || return 1
    until "$@"; do
        n=$((n + 1))
        [ "$n" -ge "${RETRIES:-8}" ] && { echo "[queue] gave up: $*"; return 1; }
        echo "[queue] attempt $n failed — retry in 30s"; sleep 30
        wait_tunnel || return 1
    done
}

echo "=== [1/6] profile_b2 (no trace) ==="
retry timeout 3600 python tools/profile_b2.py > "$OUT/profile_b2.json" \
    2> "$OUT/profile_b2.log"

echo "=== [2/6] profile_b2 traced iteration ==="
# warm cache from step 1 → cheap; trace capture over the axon tunnel is
# unproven, so a failure here must not sink the queue
wait_tunnel || true
PROFILE_TRACE_DIR="$OUT/trace" timeout 3600 \
    python tools/profile_b2.py > "$OUT/profile_b2_traced.json" \
    2> "$OUT/profile_b2_traced.log" || echo "[queue] traced run failed (ok)"

echo "=== [3/6] analyze trace ==="
python tools/analyze_trace.py "$OUT/trace" --csv "$OUT/op_table.csv" \
    > "$OUT/unet_step_trace.json" 2> "$OUT/analyze_trace.log" \
    || echo "[queue] no usable trace (ok — phase JSON stands alone)"

echo "=== [4/6] chunk4 + control A/B cells ==="
wait_tunnel || true
timeout 7200 python bench_ab.py --only default ss_off_eval_b2_chunk4 \
    2>&1 | tail -20

echo "=== [5/6] ftiled crash bisect ==="
wait_tunnel || true
timeout 7200 python tools/repro_ftiled_crash.py \
    > "$OUT/ftiled_repro.jsonl" 2> "$OUT/ftiled_repro.log" \
    || echo "[queue] ftiled repro nonzero rc (expected at the crash depth)"

echo "=== [6/6] full bench ==="
retry timeout 3600 env BENCH_SUPERVISE=0 python bench.py \
    > /tmp/bench_r05_final.json 2>/dev/null
tail -1 /tmp/bench_r05_final.json

echo "[queue] all done at $(date +%H:%M:%S)"
