"""On-device batched aligner (interpret mode on CPU) vs the host path.

The device aligner must produce the same words/timestamps as
``perform_word_alignment``'s host cost+DTW for the default option set
(detect_disfluencies=False, medfilt 9, qk_scale 1) across the planning corner
cases: multiple segments per batch, nonzero start offsets, max_duration
masking, and token-overflow truncation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from model_utils import make_tokenizer
from whisper_timestamped_tpu.alignment import perform_word_alignment
from whisper_timestamped_tpu.device_align import compute_jumps_batch, make_task

TOK = make_tokenizer(language="en", task="transcribe")
T_AUDIO = 1500
K = 4


def _tokens(start_pos, end_pos, n_text, rng):
    ts = TOK.timestamp_begin
    # text tokens: printable ASCII singles from the synthetic byte vocab
    text = rng.integers(ord("a"), ord("z"), size=n_text).tolist()
    return [ts + start_pos] + text + [ts + end_pos]


def _host_words(tokens, attn, **kw):
    return perform_word_alignment(
        tokens, attn, TOK, detect_disfluencies=False, **kw
    )


def _device_words(tokens, attn_flat, row_offset, **kw):
    task = make_task(
        tokens,
        row_offset,
        np.arange(len(tokens)),
        TOK,
        refine_whisper_precision_nframes=kw.get("refine_whisper_precision_nframes", 0),
        max_duration=kw.get("max_duration"),
    )
    (jumps,) = compute_jumps_batch(attn_flat, [task], interpret=True)
    return perform_word_alignment(
        tokens, None, TOK, detect_disfluencies=False, precomputed_jumps=jumps, **kw
    )


def _assert_words_equal(ws_a, ws_b):
    assert len(ws_a) == len(ws_b)
    for a, b in zip(ws_a, ws_b):
        assert a["text"] == b["text"]
        assert a["start"] == pytest.approx(b["start"], abs=0.021)
        assert a["end"] == pytest.approx(b["end"], abs=0.021)


def test_single_segment_matches_host():
    rng = np.random.default_rng(0)
    tokens = _tokens(0, 150, 20, rng)
    attn = rng.standard_normal((len(tokens), K, T_AUDIO)).astype(np.float32)
    ws_host = _host_words(tokens, attn)
    ws_dev = _device_words(tokens, jnp.asarray(attn), 0)
    _assert_words_equal(ws_host, ws_dev)


def test_nonzero_start_offset():
    rng = np.random.default_rng(1)
    tokens = _tokens(730, 880, 15, rng)  # segment in the middle of the window
    attn = rng.standard_normal((len(tokens), K, T_AUDIO)).astype(np.float32)
    ws_host = _host_words(tokens, attn)
    ws_dev = _device_words(tokens, jnp.asarray(attn), 0)
    _assert_words_equal(ws_host, ws_dev)


def test_max_duration_masking():
    rng = np.random.default_rng(2)
    tokens = _tokens(0, 400, 12, rng)
    attn = rng.standard_normal((len(tokens), K, T_AUDIO)).astype(np.float32)
    ws_host = _host_words(tokens, attn, max_duration=200)
    ws_dev = _device_words(tokens, jnp.asarray(attn), 0, max_duration=200)
    _assert_words_equal(ws_host, ws_dev)


def test_token_overflow_truncation():
    # more tokens than frames: the plan truncates the tail (unfinished)
    rng = np.random.default_rng(3)
    tokens = _tokens(0, 4, 30, rng)  # 32 tokens, ~32-frame span after min-rule
    attn = rng.standard_normal((len(tokens), K, T_AUDIO)).astype(np.float32)
    ws_host = _host_words(tokens, attn)
    ws_dev = _device_words(tokens, jnp.asarray(attn), 0)
    _assert_words_equal(ws_host, ws_dev)


def test_refine_margins():
    rng = np.random.default_rng(4)
    tokens = _tokens(10, 200, 18, rng)
    attn = rng.standard_normal((len(tokens), K, T_AUDIO)).astype(np.float32)
    ws_host = _host_words(tokens, attn, refine_whisper_precision_nframes=25)
    ws_dev = _device_words(tokens, jnp.asarray(attn), 0, refine_whisper_precision_nframes=25)
    _assert_words_equal(ws_host, ws_dev)


def test_multi_segment_batch_with_row_offsets():
    """Several segments gathered from one flat buffer, varying shapes."""
    rng = np.random.default_rng(5)
    R_per_window = 64
    n_windows = 3
    attn_flat = rng.standard_normal((n_windows * R_per_window, K, T_AUDIO)).astype(
        np.float32
    )
    specs = [
        (_tokens(0, 150, 20, rng), 0),
        (_tokens(300, 700, 40, rng), R_per_window),
        (_tokens(5, 60, 8, rng), 2 * R_per_window),
    ]
    tasks = []
    for tokens, off in specs:
        tasks.append(make_task(tokens, off, np.arange(len(tokens)), TOK))
    jumps = compute_jumps_batch(jnp.asarray(attn_flat), tasks, interpret=True)
    for (tokens, off), j in zip(specs, jumps):
        rows = attn_flat[off : off + len(tokens)]
        ws_host = _host_words(tokens, rows)
        ws_dev = perform_word_alignment(
            tokens, None, TOK, detect_disfluencies=False, precomputed_jumps=j
        )
        _assert_words_equal(ws_host, ws_dev)


def test_empty_plan_returns_none_task():
    ts = TOK.timestamp_begin
    task = make_task([ts + 5, ts + 5], 0, [0, 1], TOK)
    assert task is None


def test_api_device_stuck_lm_matches_host():
    """sample_len=4 forces hit_limit (stuck LM): the device path must route
    the unfinished-decoding plan identically to the host path."""
    pytest.importorskip("torch")
    import jax
    from model_utils import make_hf_model, hf_model_to_jax
    from whisper_timestamped_tpu.api import transcribe_timestamped
    from whisper_timestamped_tpu.models.load import WhisperModel

    m = make_hf_model(seed=0)
    params, dims = hf_model_to_jax(m)
    model = WhisperModel(
        params=jax.tree.map(jnp.asarray, params),
        dims=dims,
        alignment_heads=[(0, 1), (1, 0), (1, 2)],
    )
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    kw = dict(
        language="en", tokenizer=make_tokenizer(), sample_len=4,
        no_speech_threshold=None, logprob_threshold=None,
        compression_ratio_threshold=None,
    )
    host = transcribe_timestamped(model, audio, device_alignment=False, **kw)
    dev = transcribe_timestamped(model, audio, device_alignment=True, **kw)
    assert host["text"] == dev["text"]
    ws_h = [w for s in host["segments"] for w in s.get("words", [])]
    ws_d = [w for s in dev["segments"] for w in s.get("words", [])]
    assert [w["text"] for w in ws_h] == [w["text"] for w in ws_d]
    for a, b in zip(ws_h, ws_d):
        assert a["start"] == pytest.approx(b["start"], abs=0.021)
        assert a["end"] == pytest.approx(b["end"], abs=0.021)


def test_api_full_device_matches_host():
    """transcribe_timestamped(device_alignment=True) must reproduce the host
    path end-to-end (words, timestamps, confidences)."""
    pytest.importorskip("torch")
    import jax
    from model_utils import make_hf_model, hf_model_to_jax
    from whisper_timestamped_tpu.api import transcribe_timestamped
    from whisper_timestamped_tpu.models.load import WhisperModel

    m = make_hf_model(seed=0)
    params, dims = hf_model_to_jax(m)
    model = WhisperModel(
        params=jax.tree.map(jnp.asarray, params),
        dims=dims,
        alignment_heads=[(0, 1), (1, 0), (1, 2)],
    )
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000 * 8) * 0.1).astype(np.float32)
    kw = dict(
        language="en", tokenizer=make_tokenizer(), no_speech_threshold=None,
        logprob_threshold=None, compression_ratio_threshold=None,
    )
    host = transcribe_timestamped(model, audio, device_alignment=False, **kw)
    dev = transcribe_timestamped(model, audio, device_alignment=True, **kw)
    assert host["text"] == dev["text"]
    ws_h = [w for s in host["segments"] for w in s["words"]]
    ws_d = [w for s in dev["segments"] for w in s["words"]]
    assert len(ws_h) == len(ws_d)
    for a, b in zip(ws_h, ws_d):
        assert a["text"] == b["text"]
        assert a["start"] == pytest.approx(b["start"], abs=0.021)
        assert a["end"] == pytest.approx(b["end"], abs=0.021)
        assert a["confidence"] == pytest.approx(b["confidence"], abs=1e-3)


def test_disfluency_matches_host():
    """detect_disfluencies on the device path (jumps + fetched cost rows) must
    reproduce the host path's words INCLUDING any inserted [*] marks.

    Seeds chosen so random attention actually triggers host-side peak
    detection (a verified-in-advance property, asserted below)."""
    ts = TOK.timestamp_begin
    triggered = 0
    for seed in (11, 23, 24, 26):
        rng = np.random.default_rng(seed)
        text = [int(t) for t in rng.integers(ord("a"), ord("z"), 12)]
        tokens = [ts] + text + [ts + 150]
        attn = rng.standard_normal((len(tokens), K, T_AUDIO)).astype(np.float32)

        ws_host = perform_word_alignment(tokens, attn, TOK, detect_disfluencies=True)
        task = make_task(tokens, 0, np.arange(len(tokens)), TOK)
        ((jumps, cost),) = compute_jumps_batch(
            jnp.asarray(attn), [task], interpret=True, fetch_cost=True
        )
        assert cost.shape[0] == len(task.plan.tokens)
        ws_dev = perform_word_alignment(
            tokens, None, TOK, detect_disfluencies=True,
            precomputed_jumps=jumps, precomputed_cost=cost,
        )
        triggered += "[*]" in [w["text"] for w in ws_host]
        _assert_words_equal(ws_host, ws_dev)
    assert triggered >= 3  # the fixture seeds must keep exercising insertion


def test_api_device_disfluencies_matches_host():
    """transcribe_timestamped(detect_disfluencies=True, device_alignment=True)
    stays on the device path (no host fallback) and matches the host path."""
    pytest.importorskip("torch")
    import jax
    from model_utils import make_hf_model, hf_model_to_jax
    from whisper_timestamped_tpu.api import transcribe_timestamped
    from whisper_timestamped_tpu.models.load import WhisperModel

    m = make_hf_model(seed=0)
    params, dims = hf_model_to_jax(m)
    model = WhisperModel(
        params=jax.tree.map(jnp.asarray, params),
        dims=dims,
        alignment_heads=[(0, 1), (1, 0), (1, 2)],
    )
    rng = np.random.default_rng(7)
    audio = (rng.standard_normal(16000 * 8) * 0.1).astype(np.float32)
    kw = dict(
        language="en", tokenizer=make_tokenizer(), no_speech_threshold=None,
        logprob_threshold=None, compression_ratio_threshold=None,
        detect_disfluencies=True,
    )
    host = transcribe_timestamped(model, audio, device_alignment=False, **kw)
    dev = transcribe_timestamped(model, audio, device_alignment=True, **kw)
    assert host["text"] == dev["text"]
    ws_h = [w for s in host["segments"] for w in s["words"]]
    ws_d = [w for s in dev["segments"] for w in s["words"]]
    assert [w["text"] for w in ws_h] == [w["text"] for w in ws_d]
    for a, b in zip(ws_h, ws_d):
        assert a["start"] == pytest.approx(b["start"], abs=0.021)
        assert a["end"] == pytest.approx(b["end"], abs=0.021)


def test_default_device_alignment_resolution(monkeypatch):
    """Flag resolution contract: env override wins; otherwise ON on
    accelerators, OFF on CPU (VERDICT r2 item 3: fast path is the default)."""
    import jax
    from whisper_timestamped_tpu.device_align import default_device_alignment

    monkeypatch.setenv("WTT_DEVICE_ALIGN", "1")
    assert default_device_alignment() is True
    monkeypatch.setenv("WTT_DEVICE_ALIGN", "0")
    assert default_device_alignment() is False
    monkeypatch.delenv("WTT_DEVICE_ALIGN")
    assert default_device_alignment() is (jax.default_backend() != "cpu")
    # the test suite runs on CPU, so the auto default must be the host path
    assert jax.default_backend() == "cpu"
    assert default_device_alignment() is False
