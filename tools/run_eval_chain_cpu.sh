#!/usr/bin/env bash
# CPU-backend insurance pass over the metric chain (steps 4-8), layout-only.
#
# Exists because the tunneled TPU restarts at random and has (rounds 2-4,
# and again in r5) repeatedly prevented a full chain run from committing
# real metric artifacts. Everything the reference's report prints EXCEPT
# shape-dependent terms (shape diversity chamfer, MMD/COV/1-NN over
# generated SDFs) is computable from sampled LAYOUTS on the CPU backend:
# the per-relation SCA table, box/angle diversity, manipulation SCA,
# GT collection, FID/KID over top-down renders, and the consistency score.
#
# The real-chip chain (tools/run_eval_chain.sh) supersedes these artifacts
# whenever it completes; run this pass into a SEPARATE out dir and merge
# only what the TPU run did not produce (tools/merge_eval_artifacts.py).
#
# Usage: OUT=/tmp/eval_cpu EXP=/tmp/exp_eval_r05 bash tools/run_eval_chain_cpu.sh
set -euo pipefail
cd "$(dirname "$0")/.."

TREE=${TREE:-/tmp/sgfix_eval}
EXP=${EXP:-/tmp/exp_eval_r05}
OUT=${OUT:-/tmp/eval_cpu}
NEPOCH=${NEPOCH:-50}
NUM_EVAL=${NUM_EVAL:-6}
LAST=$((NEPOCH - 1))
FROM=${FROM:-4}

mkdir -p "$OUT"
export COMMONSCENES_PLATFORM=cpu

if [ "$FROM" -le 4 ]; then
echo "=== [cpu 4/8] eval: SCA + box/angle diversity + exports + renders ==="
python -m commonscenes_tpu.cli.eval_3dfront --exp "$EXP" --epoch "$LAST" \
    --dataset "$TREE" --num_scenes "$NUM_EVAL" --gen_shape False \
    --evaluate_diversity True --num_samples 3 \
    --export_dir "$OUT/exports" --render_dir "$OUT/renders" \
    --out "$OUT/sca_report.json" --platform cpu \
    --manipulation none 2>&1 | tee "$OUT/sca_report.log"
fi

if [ "$FROM" -le 5 ]; then
echo "=== [cpu 5/8] eval: manipulation (relationship) SCA ==="
python -m commonscenes_tpu.cli.eval_3dfront --exp "$EXP" --epoch "$LAST" \
    --dataset "$TREE" --num_scenes "$NUM_EVAL" --gen_shape False \
    --out "$OUT/sca_relationship.json" --platform cpu \
    --manipulation relationship 2>&1 | tee "$OUT/sca_relationship.log"
fi

if [ "$FROM" -le 6 ]; then
echo "=== [cpu 6/8] GT sets: renders + SDF grids ==="
python -m commonscenes_tpu.cli.collect_gt_renders --dataset "$TREE" \
    --out "$OUT/gt_renders" --sdf_out "$OUT/gt_sdfs" \
    --num_scenes "$NUM_EVAL"
fi

if [ "$FROM" -le 7 ]; then
echo "=== [cpu 7/8] FID/KID over renders (layout-only fake set) ==="
python -m commonscenes_tpu.cli.compute_fid --path_gt "$OUT/gt_renders" \
    --path_pred "$OUT/renders" --out "$OUT/fid.json" \
    2>&1 | tee "$OUT/fid.log"
fi

if [ "$FROM" -le 8 ]; then
echo "=== [cpu 8/8] consistency ==="
python -m commonscenes_tpu.cli.collect_consistency --dataset "$TREE" \
    --room_type bedroom --split test \
    --out "$OUT/consistencies_bedroom_test.json"
python -m commonscenes_tpu.cli.consistency_check \
    --export_dir "$OUT/exports" \
    --pairs_json "$OUT/consistencies_bedroom_test.json" \
    --out "$OUT/consistency.json" 2>&1 | tee "$OUT/consistency.log"
fi

echo "=== cpu insurance chain done; files in $OUT ==="
ls -la "$OUT"
