#!/bin/bash
# Full DER matrix at the current diarizer defaults (one JSON line per run).
# Usage: bash evals/run_matrix.sh [extra benchmark_der args...]
set -u
cd "$(dirname "$0")/.."
B=${BACKEND:-tpu}
run() { echo "### $*" >&2; python evals/benchmark_der.py --backend "$B" "$@"; }
run "$@"
run --speakers 4 "$@"
run --heldout --tier clean "$@"
run --heldout --tier noise "$@"
run --heldout --tier reverb "$@"
run --heldout --tier telephone "$@"
run --heldout --tier clean --overlap-frac 0.3 "$@"
run --heldout --tier music --snr-db 10 --gap-frac 0.5 "$@"
