"""The weights-gated conformance harness must run end-to-end when given a
checkpoint directory, and skip cleanly without one."""

import base64
import importlib.util
import json
import os
import sys

import numpy as np
import pytest

pytest.importorskip("torch")

from model_utils import make_hf_model, save_openai_pt


def _load_harness():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools", "run_reference_conformance.py",
    )
    spec = importlib.util.spec_from_file_location("run_reference_conformance", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_skips_cleanly_without_weights(monkeypatch, capsys):
    monkeypatch.delenv("WTT_MODELS_DIR", raising=False)
    rc = _load_harness()
    assert rc.main([]) == 0
    assert "SKIPPED" in capsys.readouterr().out


def test_config_table_covers_golden_corpus():
    """Every *.words.json and *.stdout golden in the reference corpus must be
    reachable from the config table (no silently untested goldens)."""
    rc = _load_harness()
    covered = set()
    for dirname, prefix, files, _, _ in rc.CONFIGS:
        for audio in files:
            covered.add((dirname, (f"{prefix}_" if prefix else "") + audio + ".words.json"))
    for dirname, prefix, files, _, _ in rc.STDOUT_CONFIGS:
        for audio in files:
            covered.add((dirname, (f"{prefix}_" if prefix else "") + audio + ".stdout"))

    missing = []
    for d in os.listdir(rc.EXPECTED):
        base = d.removesuffix(".cpu").removesuffix(".cuda")
        if base == "split_subtitles":  # covered by tests/test_writers_cli.py goldens
            continue
        full = os.path.join(rc.EXPECTED, d)
        for f in os.listdir(full):
            if not (f.endswith(".words.json") or f.endswith(".stdout")):
                continue
            if (base, f) not in covered:
                missing.append(f"{d}/{f}")
    assert not missing, f"goldens not covered by the harness config table: {missing}"


def test_harness_runs_cli_on_synthetic_checkpoint(tmp_path, monkeypatch):
    """With a checkpoint available, the harness drives the real CLI and
    compares against the golden (a synthetic model yields 'diff', never
    'error')."""
    from whisper_timestamped_tpu.tokenizer import synthetic_ranks

    models_dir = tmp_path / "models"
    models_dir.mkdir()
    save_openai_pt(make_hf_model(seed=0), str(models_dir / "tiny.pt"))
    with open(models_dir / "multilingual.tiktoken", "wb") as f:
        for k, v in synthetic_ranks().items():
            f.write(base64.b64encode(k) + b" " + str(v).encode() + b"\n")

    monkeypatch.setenv("WTT_CONFORMANCE_PLATFORM", "cpu")
    rc = _load_harness()
    report = tmp_path / "report.json"
    # vad_auditok: the only config whose audio is a wav (no ffmpeg in this
    # image) and whose VAD needs no silero weights
    code = rc.main([
        "--models_dir", str(models_dir), "--only", "vad_auditok",
        "--report", str(report),
    ])
    rep = json.load(open(report))
    assert rep["results"], "harness matched no goldens"
    statuses = {r["status"] for r in rep["results"]}
    assert "error" not in statuses, rep["results"]
    assert statuses <= {"pass", "diff"}
    assert code in (0, 1)
