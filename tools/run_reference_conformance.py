#!/usr/bin/env python3
"""Weights-gated conformance harness over the reference golden corpus.

The reference pins behavior with 153 golden files under
``/root/reference/tests/expected/`` (reference ``tests/test_transcribe.py``;
tolerance = equality after rounding floats to 1 decimal,
``test_transcribe.py:185-198``). Timestamp/WER conformance needs REAL model
weights and the real vocab, which cannot be downloaded in a zero-egress
image — so this harness gates on an environment variable and skips cleanly
when weights are absent:

    WTT_MODELS_DIR=/path/to/checkpoints python tools/run_reference_conformance.py

``WTT_MODELS_DIR`` must hold OpenAI-format checkpoints named ``<model>.pt``
(tiny.pt, tiny.en.pt, small.pt, ...) or HF checkpoint folders named
``<model>/``, with vocab files discoverable by ``models/load.py``. Audio
decode of the corpus' .mp3/.mp4 fixtures additionally needs ffmpeg on PATH.

The config table below reproduces the reference test matrix
(``test_transcribe.py:296-560``): golden dir + filename prefix -> model +
CLI options. For every golden whose model checkpoint exists, the harness
runs OUR CLI on the same audio, then reports:
  * loose pass/fail (reference tolerance: 1-decimal rounding),
  * word-timestamp MAE vs the golden (target <=20 ms, BASELINE.md),
  * text agreement.

Exit code 0 when everything available passed (or everything was skipped).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, HERE)

REF = os.environ.get("WTT_REFERENCE_DIR", "/root/reference")
EXPECTED = os.path.join(REF, "tests", "expected")
DATA = os.path.join(REF, "tests", "data")

# (golden dir, filename prefix, audio files, model, extra CLI options)
# Derived from the reference test matrix, test_transcribe.py:296-560.
# Default file set = get_data_files() minus its excluded_by_default
# (test_transcribe.py:58).
DEFAULT_FILES = [
    "bonjour.wav", "bonjour_vous_allez_bien.mp3", "gaenswein15.mp3",
    "gloria.mp3", "laugh1.mp3", "laugh2.mp3", "empty.mp3", "punctuations.mp3",
    "radio_short.mp3", "smartphone.mp3",
]

CONFIGS = [
    ("tiny_auto", "", DEFAULT_FILES, "tiny", []),
    ("tiny_fr", "", DEFAULT_FILES, "tiny", ["--language", "fr"]),
    ("medium_auto", "", DEFAULT_FILES, "medium", []),
    ("medium_fr", "", DEFAULT_FILES, "medium", ["--language", "fr"]),
    # naive vs accurate (test_transcribe.py:332-346)
    ("naive", "naive", ["apollo11.mp3"], "small",
     ["--language", "en", "--efficient", "--naive"]),
    ("naive", "accurate", ["apollo11.mp3"], "small",
     ["--language", "en", "--accurate"]),
    # corner cases (test_transcribe.py:348-450)
    ("corner_cases", "accurate.tiny", ["apollo11.mp3"], "tiny", []),
    ("corner_cases", "stucked_lm", ["apollo11.mp3"], "small",
     ["--language", "en", "--efficient"]),
    ("corner_cases", "issue24", ["empty.wav"], "medium.en",
     ["--efficient", "--punctuations_with_words", "False"]),
    ("corner_cases", "random.nocond", ["apollo11.mp3"], "small",
     ["--language", "en", "--condition_on_previous_text", "False",
      "--temperature", "0.1", "--efficient"]),
    ("corner_cases", "random", ["apollo11.mp3"], "small",
     ["--language", "en", "--temperature", "0.2", "--efficient"]),
    ("corner_cases", "nocond", ["music.mp4"], "medium",
     ["--language", "en", "--condition_on_previous_text", "False", "--efficient"]),
    ("corner_cases", "nocond.random", ["music.mp4"], "medium",
     ["--language", "en", "--condition_on_previous_text", "False",
      "--temperature", "0.4", "--efficient"]),
    ("corner_cases", "large", ["apollo11.mp3"], "large-v2",
     ["--language", "en", "--condition_on_previous_text", "False",
      "--temperature", "0.4", "--efficient"]),
    ("corner_cases", "", ["arabic.mp3"], "large-v2",
     ["--language", "ar", "--efficient"]),
    ("corner_cases", "medium.efficient", ["gloria.mp3"], "medium",
     ["--language", "en", "--efficient"]),
    ("corner_cases", "medium.accurate", ["gloria.mp3"], "medium",
     ["--language", "en", "--accurate"]),
    ("corner_cases", "large-v2.efficient", ["gloria.mp3"], "large-v2",
     ["--language", "en", "--efficient"]),
    ("corner_cases", "large-v2.accurate", ["gloria.mp3"], "large-v2",
     ["--language", "en", "--accurate"]),
    # monolingual (test_transcribe.py:452-487)
    ("tiny.en", "efficient", ["bonjour_vous_allez_bien.mp3"], "tiny.en",
     ["--efficient"]),
    ("tiny.en", "accurate", ["bonjour_vous_allez_bien.mp3"], "tiny.en",
     ["--accurate"]),
    ("tiny.en", "nocond", ["bonjour_vous_allez_bien.mp3"], "tiny.en",
     ["--condition_on_previous_text", "False", "--efficient"]),
    ("small.en", "", ["arabic.mp3"], "small.en",
     ["--condition_on_previous_text", "True", "--efficient"]),
    # unspaced language (test_transcribe.py:529-560)
    ("tiny_auto", "", ["japanese.mp3"], "tiny", ["--efficient"]),
    ("tiny_auto", "jp", ["japanese.mp3"], "tiny",
     ["--language", "ja", "--efficient"]),
    ("tiny_auto", "accurate", ["japanese.mp3"], "tiny", ["--accurate"]),
    ("tiny_auto", "accurate_jp", ["japanese.mp3"], "tiny",
     ["--language", "ja", "--accurate"]),
    # output-format matrix (test_transcribe.py:564-584; words.json checked
    # here, the byte-exact writer formats are pinned by tests/test_writers_cli)
    ("punctuations_yes", "", ["punctuations.mp3", "bonjour.wav"], "medium",
     ["--language", "fr"]),
    ("punctuations_no", "", ["punctuations.mp3", "bonjour.wav"], "medium",
     ["--language", "fr", "--punctuations_with_words", "False"]),
]

# stdout-transcript goldens (VAD behavior is pinned via verbose stdout,
# test_transcribe.py:490-524)
STDOUT_CONFIGS = [
    ("verbose", "vad", ["words.wav"], "tiny",
     ["--accurate", "--language", "en", "--vad", "True", "--verbose", "True"]),
    ("verbose", "vad_silero3.1", ["words.wav"], "tiny",
     ["--accurate", "--language", "en", "--vad", "silero:v3.1", "--verbose", "True"]),
    ("verbose", "vad_silero3.0", ["words.wav"], "tiny",
     ["--accurate", "--language", "en", "--vad", "silero:v3.0", "--verbose", "True"]),
    ("verbose", "vad_auditok", ["words.wav"], "tiny",
     ["--language", "en", "--vad", "auditok", "--verbose", "True"]),
    # live-printing matrix (test_transcribe.py:586-619)
    ("verbose", "efficient.auto", ["bonjour_vous_allez_bien.mp3"], "tiny",
     ["--efficient", "--verbose", "True"]),
    ("verbose", "efficient.fr", ["bonjour_vous_allez_bien.mp3"], "tiny",
     ["--language", "fr", "--efficient", "--verbose", "True"]),
    ("verbose", "accurate.auto", ["bonjour_vous_allez_bien.mp3"], "tiny",
     ["--verbose", "True"]),
    ("verbose", "accurate.fr", ["bonjour_vous_allez_bien.mp3"], "tiny",
     ["--language", "fr", "--verbose", "True"]),
    # HF checkpoint loading (test_transcribe.py:654-664); the model name is
    # resolved inside WTT_MODELS_DIR like any other (save the HF folder as
    # "qanastek__whisper-tiny-french-cased" or override here)
    ("verbose", "hf", ["bonjour.wav"], "qanastek__whisper-tiny-french-cased",
     ["--verbose", "True"]),
]


def loose(obj):
    """The reference's comparison normalization: round every float to one
    decimal (test_transcribe.py:185-198)."""
    if isinstance(obj, float):
        return round(obj, 1)
    if isinstance(obj, dict):
        return {k: loose(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [loose(v) for v in obj]
    return obj


def find_golden(dirname: str, filename: str):
    """Prefer the CPU golden (we have no CUDA), then the generic one."""
    for d in (f"{dirname}.cpu", dirname, f"{dirname}.cuda"):
        p = os.path.join(EXPECTED, d, filename)
        if os.path.exists(p):
            return p
    return None


def resolve_model(models_dir: str, name: str):
    for cand in (os.path.join(models_dir, name + ".pt"), os.path.join(models_dir, name)):
        if os.path.exists(cand):
            return cand
    return None


def run_one(model_path, audio_path, opts, outdir, capture_stdout=False):
    cli_args = [
        audio_path, "--model", model_path, "--output_dir", outdir, *opts,
    ]
    platform = os.environ.get("WTT_CONFORMANCE_PLATFORM")
    if platform:
        # force the jax platform before backend init (the env var alone is
        # overridden by this image's sitecustomize)
        prog = (
            f"import jax; jax.config.update('jax_platforms', {platform!r}); "
            "from whisper_timestamped_tpu.cli import main; main()"
        )
        cmd = [sys.executable, "-c", prog, *cli_args]
    else:
        cmd = [sys.executable, "-m", "whisper_timestamped_tpu.cli", *cli_args]
    proc = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True,
        env={**os.environ, "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", "")},
    )
    if proc.returncode != 0:
        raise RuntimeError(f"CLI failed ({proc.returncode}):\n{proc.stderr[-2000:]}")
    return proc.stdout


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--models_dir", default=os.environ.get("WTT_MODELS_DIR"))
    ap.add_argument("--only", default=None, help="substring filter on golden paths")
    ap.add_argument("--report", default=None, help="write the JSON report here")
    args = ap.parse_args(argv)

    if not args.models_dir or not os.path.isdir(args.models_dir):
        print(
            "SKIPPED: no model weights available (set WTT_MODELS_DIR to a "
            "directory of real Whisper checkpoints to run the reference "
            "conformance sweep)."
        )
        return 0

    from compare_words import compare  # tools/compare_words.py

    rows = []
    for dirname, prefix, files, model, opts in CONFIGS:
        model_path = resolve_model(args.models_dir, model)
        for audio in files:
            golden_name = (f"{prefix}_" if prefix else "") + audio + ".words.json"
            golden = find_golden(dirname, golden_name)
            key = f"{dirname}/{golden_name}"
            if args.only and args.only not in key:
                continue
            if golden is None:
                continue  # this golden was never generated by the reference
            audio_path = os.path.join(DATA, audio)
            if model_path is None or not os.path.exists(audio_path):
                rows.append({"golden": key, "status": "skipped",
                             "reason": "missing model" if model_path is None else "missing audio"})
                continue
            try:
                with tempfile.TemporaryDirectory() as td:
                    run_one(model_path, audio_path, opts, td)
                    ours_path = os.path.join(td, audio + ".words.json")
                    ours = json.load(open(ours_path, encoding="utf-8"))
            except Exception as exc:
                rows.append({"golden": key, "status": "error", "reason": str(exc)})
                continue
            theirs = json.load(open(golden, encoding="utf-8"))
            stats = compare(ours, theirs)
            loose_ok = loose(ours) == loose(theirs)
            rows.append({
                "golden": key,
                "status": "pass" if loose_ok else "diff",
                "mae_ms": stats.get("mae_ms"),
                "matched_words": stats.get("matched_words"),
                "text_match": stats.get("text_agreement"),
            })

    for dirname, prefix, files, model, opts in STDOUT_CONFIGS:
        model_path = resolve_model(args.models_dir, model)
        for audio in files:
            golden_name = (f"{prefix}_" if prefix else "") + audio + ".stdout"
            golden = find_golden(dirname, golden_name)
            key = f"{dirname}/{golden_name}"
            if args.only and args.only not in key:
                continue
            if golden is None:
                continue
            if model_path is None:
                rows.append({"golden": key, "status": "skipped", "reason": "missing model"})
                continue
            try:
                with tempfile.TemporaryDirectory() as td:
                    stdout = run_one(model_path, os.path.join(DATA, audio), opts, td)
            except Exception as exc:
                rows.append({"golden": key, "status": "error", "reason": str(exc)})
                continue
            want = open(golden, encoding="utf-8").read()
            rows.append({
                "golden": key,
                "status": "pass" if stdout.strip() == want.strip() else "diff",
            })

    n = {"pass": 0, "diff": 0, "skipped": 0, "error": 0}
    for r in rows:
        n[r["status"]] += 1
        extra = ""
        if r.get("mae_ms") is not None:
            extra = f"  mae={r['mae_ms']:.1f}ms"
        if r.get("reason"):
            extra = f"  ({r['reason']})"
        print(f"{r['status']:8s} {r['golden']}{extra}")
    print(f"\n{n['pass']} pass, {n['diff']} diff, {n['error']} error, {n['skipped']} skipped")

    if args.report:
        with open(args.report, "w", encoding="utf-8") as f:
            json.dump({"results": rows, "summary": n}, f, indent=2)
    return 1 if (n["diff"] or n["error"]) else 0


if __name__ == "__main__":
    sys.exit(main())
