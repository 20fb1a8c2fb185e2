#!/bin/bash
# ML-1M sequence sweeps on the calibrated fixture (TPU, one process at a
# time). Results land in examples/movielens_sequence/results/ml1m/.
# Usage: bash scripts/run_ml1m_sweeps.sh [num_samples]
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/examples/movielens_sequence/results/ml1m"
N="${1:-40}"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
mkdir -p "$OUT"
cd "$OUT"
for rep in lstm cnn pooling mixture; do
  echo "=== sweep: $rep ($N samples) ==="
  timeout 10800 python "$REPO/examples/movielens_sequence/movielens_sequence.py" \
    "$rep" --num-samples "$N" 2>&1 | grep -v -e WARNING -e "^Epoch"
done
