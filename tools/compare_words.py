#!/usr/bin/env python3
"""Compare two words.json transcriptions: word-timestamp MAE + text agreement.

The BASELINE conformance metric is word-timestamp MAE <= 20 ms vs the
reference's CPU output (BASELINE.md). Usage:

    python tools/compare_words.py ours.words.json reference.words.json

Words are aligned by text with a longest-common-subsequence match, so small
transcript differences don't break the timing comparison.
"""

import argparse
import json
import sys


def flatten_words(result):
    return [w for s in result.get("segments", []) for w in s.get("words", [])]


def lcs_align(a, b, key=lambda w: w["text"].strip().lower()):
    """Indices of matched word pairs (difflib's C matcher: linear memory,
    fine for hour-long transcripts)."""
    import difflib

    sm = difflib.SequenceMatcher(None, [key(w) for w in a], [key(w) for w in b], autojunk=False)
    pairs = []
    for block in sm.get_matching_blocks():
        pairs.extend((block.a + k, block.b + k) for k in range(block.size))
    return pairs


def compare(ours: dict, theirs: dict) -> dict:
    wa, wb = flatten_words(ours), flatten_words(theirs)
    pairs = lcs_align(wa, wb)
    if not pairs:
        return {
            "matched_words": 0,
            "ours_words": len(wa),
            "ref_words": len(wb),
            "word_match_rate": 0.0,
            "timestamp_mae_ms": None,
            "timestamp_p95_ms": None,
            "start_mae_ms": None,
            "end_mae_ms": None,
        }
    start_err = [abs(wa[i]["start"] - wb[j]["start"]) for i, j in pairs]
    end_err = [abs(wa[i]["end"] - wb[j]["end"]) for i, j in pairs]
    errs = start_err + end_err
    return {
        "matched_words": len(pairs),
        "ours_words": len(wa),
        "ref_words": len(wb),
        "word_match_rate": round(2 * len(pairs) / max(len(wa) + len(wb), 1), 4),
        "timestamp_mae_ms": round(1000 * sum(errs) / len(errs), 2),
        "timestamp_p95_ms": round(1000 * sorted(errs)[int(0.95 * (len(errs) - 1))], 2),
        "start_mae_ms": round(1000 * sum(start_err) / len(start_err), 2),
        "end_mae_ms": round(1000 * sum(end_err) / len(end_err), 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ours")
    ap.add_argument("reference")
    args = ap.parse_args()
    with open(args.ours, encoding="utf-8") as f:
        ours = json.load(f)
    with open(args.reference, encoding="utf-8") as f:
        theirs = json.load(f)
    json.dump(compare(ours, theirs), sys.stdout, indent=2)
    print()


if __name__ == "__main__":
    main()
