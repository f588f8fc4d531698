#!/bin/bash
# Watchdogged per-model matrix runner: one TPU process at a time, each
# model under `timeout` with retries (CLAUDE.md environment rules — a
# wedged remote compile must not take the whole matrix down).  Shards are
# merged afterwards with benchmarks/merge_results.py.
#
# Usage: bash benchmarks/run_matrix.sh <dataset> <tag> <steps> [models...]
# Env: TIMEOUT_S (default 1500), EVAL_FREQ (default 4000),
#      RESUME=1 (checkpoint each eval; retries resume exactly — use for
#      long protocols where a from-scratch retry is unaffordable)
set -u
cd "$(dirname "$0")/.."
DATASET=${1:?dataset}; TAG=${2:?tag}; STEPS=${3:?steps}; shift 3
TIMEOUT_S=${TIMEOUT_S:-1500}
EVAL_FREQ=${EVAL_FREQ:-4000}
RESUME_FLAG=""
[ "${RESUME:-0}" = "1" ] && RESUME_FLAG="--resume"
MODELS=("$@")
if [ ${#MODELS[@]} -eq 0 ]; then
  MODELS=(MTAM MTAM_no_time_aware_att MTAM_no_time_aware_rnn T_GRU
          Gru4Rec SASrec Ti_Self_Attention_Model NARM STAMP)
fi
FLOORS=""   # TopPop/P-Pop floors computed with the first model only
for M in "${MODELS[@]}"; do
  OUT=benchmarks/results/baseline_${TAG}_${M}.json
  if [ -s "$OUT" ]; then echo "skip $M (shard exists)"; FLOORS="--skip_floors"; continue; fi
  ok=0
  for attempt in 1 2 3; do
    echo "=== $M attempt $attempt $(date -u +%H:%M:%S)"
    timeout "$TIMEOUT_S" python benchmarks/run_baseline.py --models "$M" \
      --dataset "$DATASET" --steps "$STEPS" --tag "${TAG}_${M}" \
      --bf16 --use_pallas --eval_freq "$EVAL_FREQ" --steps_per_call 100 \
      $RESUME_FLAG $FLOORS \
      && { ok=1; break; }
    echo "retry $M (rc=$?)"
    sleep 5
  done
  [ $ok -eq 0 ] && echo "FAILED $M after 3 attempts"
  FLOORS="--skip_floors"
done
echo MATRIX_DONE

# preserve the raw per-eval curves behind the shipped tables (the runs/
# tree itself is gitignored scratch; events_<tag>/ is the curated copy)
EV=benchmarks/results/events_${TAG}
mkdir -p "$EV"
for M in "${MODELS[@]}"; do
  SRC=benchmarks/results/runs/${TAG}_${M}/${M}/events.jsonl
  [ -s "$SRC" ] && cp "$SRC" "$EV/${M}.jsonl"
done
echo "curated event curves -> $EV"
