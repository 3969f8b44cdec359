#!/bin/sh
# Batch benchmark runs over (degree, refinement) — the reference's
# scripts/ role (SURVEY.md §2 "Plot/run scripts").  Emits JSONL via
# TPUFEM_METRICS for scripts/plot_benchmarks.py.
set -e
OUT=${1:-bench_results.jsonl}
export TPUFEM_METRICS="$OUT"
: > "$OUT"

echo "== bmop 3D p=1..4 (matrix-free apply + SpMV baseline) =="
python -m tpufem.apps.bmop --dim 3 --degrees 1 2 3 4 --refine "${REFINE:-4}" \
    --dtype float32 ${EXTRA_ARGS:-}

echo "== headline =="
python bench.py | tee -a "$OUT"
echo "results in $OUT"
