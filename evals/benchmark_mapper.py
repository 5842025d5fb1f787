#!/usr/bin/env python3
"""Speaker-name-mapper accuracy benchmark.

TPU-framework analogue of the reference's evals/speaker_mapper/benchmark.py:
run the name detector over scenario transcripts (evals/mapper/tests/*.json)
and grade the label→name mapping against graded references
(evals/mapper/references/*.ref.json) with the reference's scoring scale
(benchmark.py:94-150): exact/acceptable = 1.0, partial (substring) = the
reference file's partial weight, wrong = 0.0; a test passes at
accuracy ≥ 0.75.

Default provider is the offline deterministic ``pattern`` provider so the
benchmark runs hermetically; pass --provider anthropic/openai/ollama to
grade a real LLM (mirrors how the reference graded gpt-4o-mini vs local
models in benchmark.FINDINGS.md).

Usage:
  python evals/benchmark_mapper.py [--provider pattern] [--format json]
         [--tests-dir evals/mapper/tests] [--only 002]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def score_mapping(actual: str | None, expected: dict) -> tuple[float, str]:
    """Grade one label (reference benchmark.py:94-118)."""
    actual = actual or "Unknown"
    acceptable = expected.get("acceptable", [])
    preferred = expected.get("preferred", "")
    if actual == preferred:
        return 1.0, "exact"
    if actual in acceptable:
        return 1.0, "acceptable"
    partial = expected.get("_partial_weight", 0.5)
    for variant in acceptable:
        if variant.lower() in actual.lower() or actual.lower() in variant.lower():
            return partial, "partial"
    return 0.0, "wrong"


def run_test(test_file: Path, ref_file: Path, provider: str,
             model: str | None) -> dict:
    from sdtk_tpu.pipeline import llm as L

    ref = json.loads(ref_file.read_text())
    partial_weight = ref.get("scoring", {}).get("partial_match", 0.5)

    t0 = time.perf_counter()
    mapping = L.detect_names(json.loads(test_file.read_text()),
                             provider=provider, model=model)
    elapsed = time.perf_counter() - t0

    speaker_scores, total = {}, 0.0
    expected_mappings = ref["expected_mappings"]
    for label, expected in expected_mappings.items():
        expected = dict(expected, _partial_weight=partial_weight)
        score, match_type = score_mapping(mapping.get(label), expected)
        speaker_scores[label] = {
            "actual": mapping.get(label) or "Unknown",
            "expected": expected.get("preferred", ""),
            "score": score,
            "match_type": match_type,
        }
        total += score
    accuracy = total / max(len(expected_mappings), 1)
    return {
        "test_id": ref.get("test_id", test_file.stem),
        "status": "pass" if accuracy >= 0.75 else "fail",
        "accuracy": round(accuracy, 3),
        "elapsed_s": round(elapsed, 3),
        "speaker_scores": speaker_scores,
    }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--provider", default="pattern")
    ap.add_argument("--model")
    ap.add_argument("--tests-dir", default=str(REPO_ROOT / "evals/mapper/tests"))
    ap.add_argument("--refs-dir", default=str(REPO_ROOT / "evals/mapper/references"))
    ap.add_argument("--only", help="substring filter on test id")
    ap.add_argument("--format", choices=["text", "json"], default="text")
    args = ap.parse_args(argv)

    tests_dir, refs_dir = Path(args.tests_dir), Path(args.refs_dir)
    results = []
    for test_file in sorted(tests_dir.glob("*.json")):
        if args.only and args.only not in test_file.stem:
            continue
        ref_file = refs_dir / f"{test_file.stem}.ref.json"
        if not ref_file.exists():
            print(f"SKIP {test_file.stem}: no reference", file=sys.stderr)
            continue
        results.append(run_test(test_file, ref_file, args.provider, args.model))

    passed = sum(r["status"] == "pass" for r in results)
    summary = {
        "provider": args.provider,
        "model": args.model,
        "passed": passed,
        "total": len(results),
        "pass_rate": round(passed / max(len(results), 1), 3),
        "mean_accuracy": round(
            sum(r["accuracy"] for r in results) / max(len(results), 1), 3
        ),
        "results": results,
    }
    if args.format == "json":
        print(json.dumps(summary, indent=2))
    else:
        for r in results:
            marks = " ".join(
                f"{lbl}:{s['actual']}({s['match_type']})"
                for lbl, s in r["speaker_scores"].items()
            )
            print(f"{r['status'].upper():<5} {r['test_id']:<28} "
                  f"acc={r['accuracy']:.2f} {r['elapsed_s']:.2f}s  {marks}")
        print(f"\n{passed}/{len(results)} passed "
              f"(mean accuracy {summary['mean_accuracy']:.2f}, "
              f"provider={args.provider})")
    return 0 if passed == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
