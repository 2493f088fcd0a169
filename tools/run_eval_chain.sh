#!/usr/bin/env bash
# End-to-end metrics chain: fixture tree -> brief v2_full train -> full eval
# report (SCA table, diversity, MMD/COV/1-NN, FID/KID, consistency) — the
# deliverable the reference's scripts/eval_3dfront.py:764-780 prints,
# produced by this framework's CLIs on one machine.
#
# Usage:  OUT=EVAL_r04 bash tools/run_eval_chain.sh
#         FROM=4 OUT=EVAL_r04 bash tools/run_eval_chain.sh   # resume at step 4
# Env:    TREE  fixture tree root     (default /tmp/sgfix_eval)
#         EXP   experiment dir        (default /tmp/exp_eval_r04)
#         OUT   report output dir     (default EVAL_r04)
#         NEPOCH/STEPS/BS  training length (default 30 epochs x 3 steps, b4)
#
# Proxy disclosure: FID/KID and consistency use labeled offline feature
# extractors (no Inception/CLIP weights are downloadable in this
# environment); the metric MATH is golden-tested against the reference
# protocol (tests/test_metrics_parity.py, test_export_fid.py).
set -euo pipefail
cd "$(dirname "$0")/.."

TREE=${TREE:-/tmp/sgfix_eval}
EXP=${EXP:-/tmp/exp_eval_r04}
OUT=${OUT:-EVAL_r04}
NEPOCH=${NEPOCH:-30}
STEPS=${STEPS:-3}
BS=${BS:-4}
NUM_EVAL=${NUM_EVAL:-6}
LAST=$((NEPOCH - 1))

FROM=${FROM:-1}   # resume from step N (tunnel flakiness can kill a run
                  # mid-chain; completed artifacts in $OUT/$EXP are reused)
RETRIES=${RETRIES:-12}

# The tunneled TPU restarts at random (~tens of minutes apart), killing any
# in-flight remote compile with "Broken pipe" — or, worse, leaving it hung
# forever (lost-reply mode; see tools/watchdog_chain.sh). Every CLI persists
# compiled programs to the compile cache and eval stages its sampler into
# separate jits (--staged_sample), so each retry resumes where the last one
# died. Between attempts, wait_tunnel gates on a bounded tiny-matmul probe
# (tools/tpu_up.py) so a long outage doesn't burn retries spawning CLIs
# that immediately hang.
wait_tunnel() {
    local w=0
    until timeout 180 python tools/tpu_up.py >/dev/null 2>&1; do
        w=$((w + 1))
        echo "[!] tunnel down (probe $w failed) — waiting 60s" >&2
        if [ "$w" -ge "${PROBE_LIMIT:-120}" ]; then
            echo "[!] tunnel never came back after $w probes" >&2
            return 1
        fi
        sleep 60
    done
}
retry() {
    local n=0
    wait_tunnel || return 1
    until "$@"; do
        n=$((n + 1))
        if [ "$n" -ge "$RETRIES" ]; then
            echo "[!] failed after $RETRIES attempts: $*" >&2
            return 1
        fi
        echo "[!] attempt $n failed (tunnel drop?) — retrying in ${RETRY_SLEEP:-20}s" >&2
        sleep "${RETRY_SLEEP:-20}"
        wait_tunnel || return 1
    done
}
# CPU-only steps must not block on a down tunnel (r5: step 8 sat in the
# probe loop for an hour over work that never touches the device)
cpu_retry() {
    local n=0
    until COMMONSCENES_PLATFORM=cpu "$@"; do
        n=$((n + 1))
        if [ "$n" -ge "$RETRIES" ]; then
            echo "[!] failed after $RETRIES attempts: $*" >&2
            return 1
        fi
        echo "[!] attempt $n failed — retrying in ${RETRY_SLEEP:-20}s" >&2
        sleep "${RETRY_SLEEP:-20}"
    done
}

mkdir -p "$OUT"

if [ "$FROM" -le 1 ]; then
echo "=== [1/8] fixture tree ==="
python -m commonscenes_tpu.data.fixture --out "$TREE" --train 12 --test 6 \
    --seed 0 | tee "$OUT/fixture_manifest.json"
fi

if [ "$FROM" -le 2 ]; then
echo "=== [2/8] validate tree ==="
python -m commonscenes_tpu.cli.validate_dataset --root "$TREE" \
    --room_type bedroom --strict | tail -1 > "$OUT/validate.json"
fi

if [ "$FROM" -le 3 ]; then
echo "=== [3/8] train v2_full (brief) ==="
# scale the reference's 20k/60k/100k LR boundaries into this run's length
# so the committed loss log shows the step-wise decay actually firing
TOTAL=$((NEPOCH * STEPS))
MILES="$((TOTAL * 3 / 10)),$((TOTAL * 6 / 10)),$((TOTAL * 9 / 10))"
# SAVE_EVERY=0 (default): only the final epoch saves — each v2_full save
# fetches the 5.35 GB train state over the tunnel (~9 min chunked) and the
# eval stages only ever load model_$LAST. For long runs set SAVE_EVERY=15:
# train_resumable then restarts each retry from the newest mid-save instead
# of epoch 0.
train_resumable() {
    local latest=-1 n
    for d in "$EXP/checkpoint"/model_*; do
        [ -e "$d" ] || continue
        n=${d##*model_}
        case "$n" in *[!0-9]*) continue ;; esac
        [ "$n" -gt "$latest" ] && latest=$n
    done
    local extra=()
    if [ "$latest" -ge 0 ] && [ "$latest" -lt "$LAST" ]; then
        echo "[*] resuming train from saved epoch $latest" >&2
        extra=(--loadmodel True --loadepoch "$latest")
    elif [ "$latest" -eq "$LAST" ]; then
        echo "[*] final checkpoint model_$LAST already saved — skip train" >&2
        return 0
    fi
    python -m commonscenes_tpu.cli.train_3dfront --network_type v2_full \
        --dataset "$TREE" --nepoch "$NEPOCH" --steps_per_epoch "$STEPS" \
        --batchSize "$BS" --max_objs 10 --max_triples 48 --exp "$EXP" \
        --lr_milestones "$MILES" --save_every "${SAVE_EVERY:-0}" \
        --vis_every 0 --log_every 10 "${extra[@]}"
}
retry train_resumable 2>&1 | tail -12
fi
cp "$EXP/logs/loss_log.txt" "$OUT/loss_log.txt" 2>/dev/null || true

if [ "$FROM" -ge 4 ] && [ ! -e "$EXP/checkpoint/model_$LAST" ]; then
    # resuming past training with a wrong NEPOCH would silently evaluate
    # random init (the CLI's missing-checkpoint probe behavior) — refuse
    echo "[!] $EXP/checkpoint/model_$LAST missing — set NEPOCH to match" >&2
    ls "$EXP/checkpoint" >&2 || true
    exit 2
fi

# The UNet denoise-step program embeds Pallas kernels (flash attention,
# fused GN/attn/FFN) whose Mosaic compile pushes the remote compile RPC
# past the sick tunnel's stable window — three r05 attempts died in that
# exact compile (broken pipe / lost reply) while the plain-XLA layout
# stage compiled in 211 s every time. The chain's job is metric EVIDENCE,
# not kernel throughput (bench.py exercises the Pallas path), so steps
# 4-5 run the pure-XLA lowering: a much shorter compile fits inside a
# stable window, and the cache-miss explainer shows whether retries hit
# the persistent compile cache at all.
EVAL_ENV="COMMONSCENES_FLASH=0 COMMONSCENES_FUSED_GN=0
          COMMONSCENES_FUSED_ATTN=0 COMMONSCENES_FUSED_FFN=0
          JAX_EXPLAIN_CACHE_MISSES=True"

if [ "$FROM" -le 4 ]; then
echo "=== [4/8] eval: SCA + diversity + exports + renders ==="
retry env $EVAL_ENV python -m commonscenes_tpu.cli.eval_3dfront --exp "$EXP" --epoch "$LAST" \
    --dataset "$TREE" --num_scenes "$NUM_EVAL" --gen_shape True \
    --host_denoise 1 \
    --evaluate_diversity True --num_samples 3 \
    --export_dir "$OUT/exports" --render_dir "$OUT/renders" \
    --out "$OUT/sca_report.json" \
    --manipulation none 2>&1 | tee "$OUT/sca_report.log"
fi

if [ "$FROM" -le 5 ]; then
echo "=== [5/8] eval: manipulation (relationship) SCA ==="
retry env $EVAL_ENV python -m commonscenes_tpu.cli.eval_3dfront --exp "$EXP" --epoch "$LAST" \
    --dataset "$TREE" --num_scenes "$NUM_EVAL" --gen_shape True \
    --host_denoise 1 \
    --out "$OUT/sca_relationship.json" \
    --manipulation relationship 2>&1 | tee "$OUT/sca_relationship.log"
fi

if [ "$FROM" -le 6 ]; then
echo "=== [6/8] GT sets: renders + SDF grids ==="
retry python -m commonscenes_tpu.cli.collect_gt_renders --dataset "$TREE" \
    --out "$OUT/gt_renders" --sdf_out "$OUT/gt_sdfs" \
    --num_scenes "$NUM_EVAL"
fi

echo "=== [7/8] MMD/COV/1-NN + FID/KID ==="
retry python -m commonscenes_tpu.cli.compute_mmd_cov_1nn \
    --path_sample "$OUT/exports" --path_ref "$OUT/gt_sdfs" \
    --n_points 1024 --out "$OUT/mmd_cov_1nn.json" \
    2>&1 | tee "$OUT/mmd_cov_1nn.log"
retry python -m commonscenes_tpu.cli.compute_fid --path_gt "$OUT/gt_renders" \
    --path_pred "$OUT/renders" --out "$OUT/fid.json" \
    2>&1 | tee "$OUT/fid.log"

echo "=== [8/8] consistency ==="
cpu_retry python -m commonscenes_tpu.cli.collect_consistency --dataset "$TREE" \
    --room_type bedroom --split test \
    --out "$OUT/consistencies_bedroom_test.json"
cpu_retry python -m commonscenes_tpu.cli.consistency_check \
    --export_dir "$OUT/exports" \
    --pairs_json "$OUT/consistencies_bedroom_test.json" \
    --out "$OUT/consistency.json" 2>&1 | tee "$OUT/consistency.log"

echo "=== report files in $OUT ==="
ls -la "$OUT"
