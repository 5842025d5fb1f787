#!/usr/bin/env bash
# Test runner (the reference's run_speaker_diarization_tests.sh analogue).
#   ./run_tests.sh            all unit tests
#   ./run_tests.sh cluster    one collection (tests/test_<name>.py)
#   ./run_tests.sh --doc      show the test-suite documentation
#   ./run_tests.sh --doc NAME show one collection's README
#                             (tests/test_<NAME>.README.md — the
#                             reference's per-collection doc convention,
#                             run_speaker_diarization_tests.sh:27-53)
#   ./run_tests.sh --evals    accuracy benchmarks (fake backend)
#   ./run_tests.sh --reference run the REFERENCE toolkit's own 198-test
#                             acceptance suite against this CLI
#                             (evals/run_reference_suite.py; scoreboard in
#                             REFSUITE.json)
set -euo pipefail
cd "$(dirname "$0")"

case "${1:-}" in
  --doc)
    if [[ -n "${2:-}" ]]; then
      cat "tests/test_${2}.README.md"
    else
      cat tests/README.md
      echo
      echo "Per-collection docs (./run_tests.sh --doc <name>):"
      for f in tests/test_*.README.md; do
        b="$(basename "$f" .README.md)"
        echo "  ${b#test_}"
      done
    fi
    ;;
  --reference)
    python evals/run_reference_suite.py
    ;;
  --evals)
    python evals/benchmark_identify.py --backend "${2:-fake}"
    python evals/benchmark_der.py --backend "${2:-fake}"
    python evals/benchmark_mapper.py --format json | python -c 'import json,sys; d=json.load(sys.stdin); print(json.dumps({"benchmark":"mapper","passed":d["passed"],"total":d["total"],"mean_accuracy":d["mean_accuracy"]}))'
    python evals/benchmark_streaming.py --backend "${2:-fake}"
    python evals/benchmark_decode.py --files 16 --seconds 10
    ;;
  "")
    exec python -m pytest tests/ -x -q
    ;;
  *)
    exec python -m pytest "tests/test_${1}.py" -q
    ;;
esac
