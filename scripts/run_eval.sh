#!/usr/bin/env bash
# Evaluation launcher — the counterpart of the reference's run-eval.sh
# (same SLURM shape on a highmem partition). Eval is single-chip + host IO:
# run on one worker.
#
# Usage:
#   ./scripts/run_eval.sh PRED_DIR BIDS_DIR [extra eval.py args...]
set -euo pipefail

PRED_DIR=${1:?usage: run_eval.sh PRED_DIR BIDS_DIR [args...]}
BIDS_DIR=${2:?usage: run_eval.sh PRED_DIR BIDS_DIR [args...]}
shift 2 || true
REPO=$(cd "$(dirname "$0")/.." && pwd)

export OMP_NUM_THREADS=1
OUT_CSV=${OUT_CSV:-${PRED_DIR}/relative_errors.csv}
cd "$REPO"
PYTHONPATH="$REPO" python3 src/eval.py "$PRED_DIR" "$BIDS_DIR" \
  --out-csv "$OUT_CSV" "$@"
PYTHONPATH="$REPO" python3 src/plot_metrics_errors.py "$OUT_CSV" \
  --out-dir "${PRED_DIR}/report"
