"""Batched multi-file pipeline tests (incl. equivalence with the serial loop)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_timestamped_tpu.engine import DecodeEngine, transcribe_windows
from whisper_timestamped_tpu.models.load import WhisperModel
from whisper_timestamped_tpu.parallel.batch import BatchTranscriber, transcribe_batch
from whisper_timestamped_tpu.parallel.mesh import get_mesh

from model_utils import make_hf_model, hf_model_to_jax, make_tokenizer

pytest.importorskip("torch")


@pytest.fixture(scope="module")
def model():
    m = make_hf_model(seed=0)
    params, dims = hf_model_to_jax(m)
    return WhisperModel(
        params=jax.tree.map(jnp.asarray, params),
        dims=dims,
        alignment_heads=[(0, 1), (1, 0), (1, 2)],
    )


@pytest.fixture(scope="module")
def tok():
    return make_tokenizer(language="en", task="transcribe")


def _audio(seed, seconds):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(16000 * seconds) * 0.1).astype(np.float32)


def test_batched_matches_serial(model, tok):
    """Batched pipeline must produce the same segments as the serial loop."""
    engine = DecodeEngine(model, tok)
    audios = {"a": _audio(0, 8), "b": _audio(1, 5), "c": _audio(2, 12)}

    serial = {}
    for name, audio in audios.items():
        res = transcribe_windows(
            engine, audio, language="en", temperature=[0.0],
            no_speech_threshold=None, logprob_threshold=None,
            compression_ratio_threshold=None,
        )
        serial[name] = res.segments

    bt = BatchTranscriber(engine, batch_size=4)
    batched = bt.transcribe_streams(
        audios, language="en", temperature=[0.0],
        no_speech_threshold=None, logprob_threshold=None,
    )

    for name in audios:
        s_segs, b_segs = serial[name], batched[name]
        assert len(s_segs) == len(b_segs), name
        for s, b in zip(s_segs, b_segs):
            assert s.tokens == b.tokens, (name, s.tokens, b.tokens)
            assert s.start == b.start and s.end == b.end


def test_batched_on_mesh(model, tok):
    engine = DecodeEngine(model, tok)
    from whisper_timestamped_tpu.parallel.mesh import shard_params

    mesh = get_mesh(dp=8, tp=1)
    with mesh:
        sharded = WhisperModel(
            params=shard_params(model.params, mesh),
            dims=model.dims,
            alignment_heads=model.alignment_heads,
        )
        engine_s = DecodeEngine(sharded, tok)
        bt = BatchTranscriber(engine_s, batch_size=8, mesh=mesh)
        out = bt.transcribe_streams(
            {"a": _audio(0, 5), "b": _audio(1, 5)}, language="en",
            temperature=[0.0], no_speech_threshold=None, logprob_threshold=None,
        )
    assert set(out) == {"a", "b"}
    assert all(len(v) >= 1 for v in out.values())


def test_transcribe_batch_full_results(model, tok):
    out = transcribe_batch(
        model,
        {"x": _audio(3, 6), "y": _audio(4, 4)},
        tok,
        language="en",
        batch_size=4,
        temperature=[0.0],
        no_speech_threshold=None,
        logprob_threshold=None,
    )
    assert set(out) == {"x", "y"}
    for res in out.values():
        assert "segments" in res and res["language"] == "en"
        for s in res["segments"]:
            for w in s.get("words", []):
                assert w["start"] <= w["end"]


def test_transcribe_batch_with_vad(model, tok):
    rng = np.random.default_rng(5)
    a = np.zeros(16000 * 6, np.float32)
    a[: 16000 * 2] = rng.standard_normal(16000 * 2) * 0.3
    out = transcribe_batch(
        model, {"v": a}, tok, language="en", batch_size=2, vad="energy",
        temperature=[0.0], no_speech_threshold=None, logprob_threshold=None,
    )
    res = out["v"]
    assert "speech_activity" in res
    assert res["speech_activity"][0]["start"] < 1.0
    for s in res["segments"]:
        for w in s.get("words", []):
            assert w["start"] <= w["end"]


def test_transcribe_batch_device_alignment_matches_host(model, tok):
    """device_alignment=True must reproduce the host-aligned batched results."""
    audios = {"a": _audio(1, 5), "b": _audio(2, 8)}
    kw = dict(
        language="en", batch_size=2,
        no_speech_threshold=None, logprob_threshold=None,
        compression_ratio_threshold=None,
    )
    host = transcribe_batch(model, audios, tok, device_alignment=False, **kw)
    dev = transcribe_batch(model, audios, tok, device_alignment=True, **kw)
    for name in audios:
        assert host[name]["text"] == dev[name]["text"]
        ws_h = [w for s in host[name]["segments"] for w in s.get("words", [])]
        ws_d = [w for s in dev[name]["segments"] for w in s.get("words", [])]
        assert len(ws_h) == len(ws_d)
        for a, b in zip(ws_h, ws_d):
            assert a["text"] == b["text"]
            assert a["start"] == pytest.approx(b["start"], abs=0.021)
            assert a["end"] == pytest.approx(b["end"], abs=0.021)
