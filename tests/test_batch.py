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
    """The mesh path is self-contained: passing a mesh shards the engine's
    params itself (no caller-side shard_params)."""
    mesh = get_mesh(dp=8, tp=1)
    engine_s = DecodeEngine(model, tok)
    bt = BatchTranscriber(engine_s, batch_size=8, mesh=mesh)
    assert engine_s.mesh is mesh  # params were sharded by the engine
    out = bt.transcribe_streams(
        {"a": _audio(0, 5), "b": _audio(1, 5)}, language="en",
        temperature=[0.0], no_speech_threshold=None, logprob_threshold=None,
    )
    assert set(out) == {"a", "b"}
    assert all(len(v) >= 1 for v in out.values())


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_decode_window_token_identical(model, tok, tp):
    """The inference decode loop under a tp>1 mesh must reproduce the
    single-device tokens (new capability; the reference is single-device
    batch-1, transcribe.py:806)."""
    from whisper_timestamped_tpu.audio import N_FRAMES, log_mel_spectrogram, pad_or_trim
    from whisper_timestamped_tpu.decoding import DecodingOptions

    mel = pad_or_trim(
        np.asarray(log_mel_spectrogram(_audio(7, 6), n_mels=model.dims.n_mels)),
        N_FRAMES, axis=-1,
    )
    opts = DecodingOptions(language="en")
    r0 = DecodeEngine(model, tok).decode_window(mel, opts)[0]

    engine_tp = DecodeEngine(model, tok, mesh=get_mesh(tp=tp))
    assert engine_tp.tp == tp and not engine_tp.allow_pallas
    r1 = engine_tp.decode_window(mel, opts)[0]
    assert r1.tokens == r0.tokens
    np.testing.assert_allclose(r1.token_logprobs, r0.token_logprobs, atol=2e-4)
    np.testing.assert_allclose(r1.attn, r0.attn, atol=2e-3)


def test_tp_decode_window_kernel_path_token_identical(tok, monkeypatch):
    """tp>1 runs the stacked Pallas decode kernels via shard_map (each shard
    holds whole heads, so per-shard attention is complete locally), and the
    result is token-identical to the single-device XLA-path decode. Uses a
    dh=64 geometry (the kernels' lane constraint, like every official model;
    the shared hf fixture's dh=16 keeps the XLA path) with WTT_FORCE_STACKED
    running the kernels in interpret mode on the CPU mesh."""
    from whisper_timestamped_tpu.audio import N_FRAMES, log_mel_spectrogram, pad_or_trim
    from whisper_timestamped_tpu.decoding import DecodingOptions
    from whisper_timestamped_tpu.models.whisper_jax import WhisperDims, init_params

    dims = WhisperDims(
        n_mels=80, n_audio_ctx=1500, n_audio_state=256, n_audio_head=4,
        n_audio_layer=2, n_vocab=1928, n_text_ctx=448, n_text_state=256,
        n_text_head=4, n_text_layer=2,
    )
    params = jax.tree.map(jnp.asarray, init_params(dims, jax.random.PRNGKey(3)))
    model64 = WhisperModel(
        params=params, dims=dims, alignment_heads=[(0, 1), (1, 0), (1, 2)]
    )
    mel = pad_or_trim(
        np.asarray(log_mel_spectrogram(_audio(7, 4), n_mels=80)), N_FRAMES,
        axis=-1,
    )
    opts = DecodingOptions(language="en", sample_len=10)
    r0 = DecodeEngine(model64, tok).decode_window(mel, opts)[0]

    monkeypatch.setenv("WTT_FORCE_STACKED", "1")
    engine_tp = DecodeEngine(model64, tok, mesh=get_mesh(tp=2))
    assert engine_tp.kernel_mesh is not None  # kernels engage under this tp
    r1 = engine_tp.decode_window(mel, opts)[0]
    assert r1.tokens == r0.tokens
    # kernel-path numerics (f32 interpret) vs the XLA path: small drift is
    # expected; the token identity above is the exactness claim
    np.testing.assert_allclose(r1.token_logprobs, r0.token_logprobs, atol=5e-3)
    np.testing.assert_allclose(r1.attn, r0.attn, atol=2e-2)

    # int8 cross-KV variant: sharded kernel == unsharded kernel (same
    # quantization on both sides)
    r8_ref = DecodeEngine(model64, tok, kv_int8=True).decode_window(mel, opts)[0]
    engine_tp8 = DecodeEngine(model64, tok, mesh=get_mesh(tp=2), kv_int8=True)
    r8 = engine_tp8.decode_window(mel, opts)[0]
    assert r8.tokens == r8_ref.tokens
    np.testing.assert_allclose(r8.attn, r8_ref.attn, atol=2e-2)


def test_tp_batched_pipeline_matches_serial(model, tok):
    """Full batched pipeline on a dp=2 x tp=4 mesh == unsharded serial loop."""
    audios = {"a": _audio(0, 5), "b": _audio(1, 8)}
    kw = dict(language="en", temperature=[0.0], no_speech_threshold=None,
              logprob_threshold=None)

    serial = {}
    eng = DecodeEngine(model, tok)
    for name, audio in audios.items():
        serial[name] = transcribe_windows(
            eng, audio, compression_ratio_threshold=None, **kw
        ).segments

    mesh = get_mesh(dp=2, tp=4)
    bt = BatchTranscriber(DecodeEngine(model, tok, mesh=mesh), batch_size=2)
    batched = bt.transcribe_streams(audios, **kw)
    for name in audios:
        assert [s.tokens for s in batched[name]] == [s.tokens for s in serial[name]]
        for s, b in zip(serial[name], batched[name]):
            assert s.start == b.start and s.end == b.end


def test_batched_empty_and_short_audio(model, tok):
    """Zero-length and sub-second streams must flow through the shared mel
    stack (the reference corpus pins empty audio via empty.wav goldens)."""
    out = transcribe_batch(
        model, {"empty": np.zeros(0, np.float32), "short": _audio(0, 1)}, tok,
        language="en", batch_size=2, temperature=[0.0],
        no_speech_threshold=None, logprob_threshold=None,
    )
    assert out["empty"]["text"] == "" and out["empty"]["segments"] == []
    assert len(out["short"]["segments"]) >= 1


def test_tail_batch_matches_full_batch(model, tok):
    """tail_batch switches late iterations to a smaller static program; the
    decoded tokens must not change."""
    audios = {"a": _audio(0, 5), "b": _audio(1, 8), "c": _audio(2, 12)}
    kw = dict(language="en", temperature=[0.0], no_speech_threshold=None,
              logprob_threshold=None)
    ref = BatchTranscriber(DecodeEngine(model, tok), batch_size=4).transcribe_streams(
        audios, **kw
    )
    got = BatchTranscriber(
        DecodeEngine(model, tok), batch_size=4, tail_batch=2
    ).transcribe_streams(audios, **kw)
    for name in audios:
        assert [s.tokens for s in got[name]] == [s.tokens for s in ref[name]]


def test_batched_language_autodetect_matches_serial(model):
    """language=None: per-stream batched language-ID must reproduce the
    serial path's detection and decode."""
    tok_nl = make_tokenizer()
    audios = {"a": _audio(0, 5), "b": _audio(1, 5)}
    kw = dict(temperature=[0.0], no_speech_threshold=None, logprob_threshold=None)

    eng = DecodeEngine(model, tok_nl)
    serial = {
        name: transcribe_windows(
            eng, audio, language=None, compression_ratio_threshold=None,
            return_language_probs=True, **kw
        )
        for name, audio in audios.items()
    }

    bt = BatchTranscriber(DecodeEngine(model, tok_nl), batch_size=2)
    batched = bt.transcribe_streams(audios, language=None, **kw)
    for name in audios:
        meta = bt.stream_meta[name]
        assert meta["language"] == serial[name].language
        assert meta["language_probs"] is not None
        best = max(meta["language_probs"], key=meta["language_probs"].get)
        assert best == meta["language"]
        assert [s.tokens for s in batched[name]] == [
            s.tokens for s in serial[name].segments
        ]


def test_transcribe_batch_autodetect_full_result(model):
    tok_nl = make_tokenizer()
    out = transcribe_batch(
        model, {"x": _audio(3, 4)}, tok_nl, batch_size=2,
        temperature=[0.0], no_speech_threshold=None, logprob_threshold=None,
    )
    res = out["x"]
    assert res["language"]
    assert "language_probs" in res and len(res["language_probs"]) == 99


def test_batched_best_of_sampling(model, tok):
    """best_of>1 at t>0 runs via row replication and yields valid segments."""
    from whisper_timestamped_tpu.decoding import DecodingOptions

    audios = {"a": _audio(0, 5), "b": _audio(1, 5)}
    bt = BatchTranscriber(DecodeEngine(model, tok), batch_size=2)
    out = bt.transcribe_streams(
        audios, language="en", temperature=[0.7],
        decode_options=DecodingOptions(best_of=3),
        no_speech_threshold=None, logprob_threshold=None,
    )
    assert set(out) == set(audios)
    for segs in out.values():
        assert len(segs) >= 1
        for s in segs:
            assert s.temperature == 0.7


def test_batched_best_of_picks_max_score(model, tok):
    """The replicated-row selection applies the MaximumLikelihoodRanker rule:
    the winner's score must be the max over any single replicated decode."""
    from whisper_timestamped_tpu.audio import N_FRAMES, log_mel_spectrogram, pad_or_trim
    from whisper_timestamped_tpu.decoding import DecodingOptions
    from whisper_timestamped_tpu.engine import sequence_score

    mel = pad_or_trim(
        np.asarray(log_mel_spectrogram(_audio(9, 4), n_mels=model.dims.n_mels)),
        N_FRAMES, axis=-1,
    )
    bt = BatchTranscriber(DecodeEngine(model, tok), batch_size=2)
    opts = DecodingOptions(language="en", best_of=4)
    mels = np.stack([mel, mel])
    winners = bt._decode_batch_best_of(mels, [[], []], opts, 0.8, 123, None)
    # replicate by hand with the same chunking/seeding and verify the max
    n, B = 4, 2
    rep_idx = [i for i in range(2) for _ in range(n)]
    scores = {0: [], 1: []}
    for c0 in range(0, len(rep_idx), B):
        chunk = rep_idx[c0 : c0 + B]
        sub = np.stack([mels[i] for i in chunk])
        rs = bt._decode_batch(sub, [[]] * B, opts, 0.8, 123 + c0, None)
        for k, i in enumerate(chunk):
            scores[i].append(sequence_score(rs[k], None))
    for i in range(2):
        assert sequence_score(winners[i], None) == pytest.approx(max(scores[i]))


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


def test_transcribe_batch_beam_matches_serial(model, tok):
    """Batched beam pipeline (batched beam decode + batched teacher-forced
    alignment) must reproduce the serial naive-engine beam path word by word."""
    from whisper_timestamped_tpu.api import transcribe_timestamped
    from whisper_timestamped_tpu.decoding import DecodingOptions

    audios = {"a": _audio(6, 6), "b": _audio(7, 9)}
    batched = transcribe_batch(
        model, audios, tok, language="en", batch_size=2,
        temperature=[0.0], no_speech_threshold=None, logprob_threshold=None,
        compression_ratio_threshold=None,
        decode_options=DecodingOptions(beam_size=2),
    )
    for name, audio in audios.items():
        serial = transcribe_timestamped(
            model, audio, language="en", tokenizer=tok, beam_size=2,
            temperature=0.0, no_speech_threshold=None, logprob_threshold=None,
            compression_ratio_threshold=None,
        )
        b = batched[name]
        assert b["text"] == serial["text"], name
        ws_b = [w for s in b["segments"] for w in s.get("words", [])]
        ws_s = [w for s in serial["segments"] for w in s.get("words", [])]
        assert len(ws_b) == len(ws_s), name
        for wb, ws in zip(ws_b, ws_s):
            assert wb["text"] == ws["text"]
            assert wb["start"] == pytest.approx(ws["start"], abs=0.021)
            assert wb["end"] == pytest.approx(ws["end"], abs=0.021)
            if "confidence" in ws:
                assert wb["confidence"] == pytest.approx(ws["confidence"], abs=0.02)


def test_transcribe_batch_device_alignment_disfluencies(model, tok):
    """detect_disfluencies=True stays on the batched device path (cost rows
    fetched alongside jumps) and reproduces the host-aligned results."""
    audios = {"a": _audio(1, 5), "b": _audio(2, 8)}
    kw = dict(
        language="en", batch_size=2, detect_disfluencies=True,
        no_speech_threshold=None, logprob_threshold=None,
        compression_ratio_threshold=None,
    )
    host = transcribe_batch(model, audios, tok, device_alignment=False, **kw)
    dev = transcribe_batch(model, audios, tok, device_alignment=True, **kw)
    for name in audios:
        assert host[name]["text"] == dev[name]["text"]
        ws_h = [w for s in host[name]["segments"] for w in s.get("words", [])]
        ws_d = [w for s in dev[name]["segments"] for w in s.get("words", [])]
        assert [w["text"] for w in ws_h] == [w["text"] for w in ws_d]
        for a, b in zip(ws_h, ws_d):
            assert a["start"] == pytest.approx(b["start"], abs=0.021)
            assert a["end"] == pytest.approx(b["end"], abs=0.021)


def test_batched_kv_int4_matches_serial(model, tok):
    """kv_int4 threads through the batched pipeline's decode dispatch
    (batch.py passes kv_int4 to decode_window_jit): batched == serial with
    the same quantized cache."""
    engine = DecodeEngine(model, tok, kv_int4=True)
    audios = {"a": _audio(3, 6), "b": _audio(4, 9)}

    serial = {}
    for name, audio in audios.items():
        res = transcribe_windows(
            engine, audio, language="en", temperature=[0.0],
            no_speech_threshold=None, logprob_threshold=None,
            compression_ratio_threshold=None,
        )
        serial[name] = res.segments

    bt = BatchTranscriber(engine, batch_size=2)
    batched = bt.transcribe_streams(
        audios, language="en", temperature=[0.0],
        no_speech_threshold=None, logprob_threshold=None,
    )
    for name in audios:
        s_segs, b_segs = serial[name], batched[name]
        assert len(s_segs) == len(b_segs), name
        for s, b in zip(s_segs, b_segs):
            assert s.tokens == b.tokens, (name, s.tokens, b.tokens)


def test_stream_matches_per_batch_calls(model, tok):
    """transcribe_batch_stream pipelines the NEXT batch's upload+mel behind
    the current decode; results must be identical to independent
    transcribe_batch calls (the prepared mel is the same computation)."""
    from whisper_timestamped_tpu.parallel.batch import transcribe_batch_stream

    batches = [
        {"a": _audio(20, 4), "b": _audio(21, 6)},
        {"c": _audio(22, 3)},
        {"d": _audio(23, 5), "e": _audio(24, 4)},
    ]
    kw = dict(language="en", batch_size=2, temperature=[0.0],
              no_speech_threshold=0.6, logprob_threshold=-1.0)
    engine = DecodeEngine(model, tok)
    got = list(transcribe_batch_stream(model, iter(batches), tok,
                                       engine=engine, **kw))
    want = [transcribe_batch(model, b, tok, engine=engine, **kw)
            for b in batches]
    assert got == want


def test_stream_vad_mode_unpipelined_but_correct(model, tok):
    """vad forces the per-batch fallback path; output still matches."""
    from whisper_timestamped_tpu.parallel.batch import transcribe_batch_stream

    batches = [{"a": _audio(25, 6)}, {"b": _audio(26, 6)}]
    kw = dict(language="en", batch_size=2, temperature=[0.0],
              no_speech_threshold=None, logprob_threshold=None,
              vad=[(0.0, 3.0), (4.0, 5.5)])
    engine = DecodeEngine(model, tok)
    got = list(transcribe_batch_stream(model, iter(batches), tok,
                                       engine=engine, **kw))
    want = [transcribe_batch(model, b, tok, engine=engine, **kw)
            for b in batches]
    assert got == want


def test_stream_on_mesh_matches_serial(model, tok):
    """The serving loop composed with a dp x tp mesh — the production story
    (one `transcribe_batch_stream` feeding a v5e-8). Must be bit-identical to
    per-batch `transcribe_batch` calls on the same mesh engine, and
    token-identical to the unsharded serial window loop."""
    from whisper_timestamped_tpu.parallel.batch import transcribe_batch_stream

    batches = [
        {"a": _audio(60, 5), "b": _audio(61, 8)},
        {"c": _audio(62, 4)},
    ]
    kw = dict(language="en", batch_size=2, temperature=[0.0],
              no_speech_threshold=None, logprob_threshold=None)

    mesh = get_mesh(dp=2, tp=4)
    engine_mesh = DecodeEngine(model, tok, mesh=mesh)
    got = list(transcribe_batch_stream(model, iter(batches), tok,
                                       engine=engine_mesh, **kw))
    want = [transcribe_batch(model, b, tok, engine=engine_mesh, **kw)
            for b in batches]
    assert got == want

    engine_single = DecodeEngine(model, tok)
    want_single = [transcribe_batch(model, b, tok, engine=engine_single, **kw)
                   for b in batches]
    for res_mesh, res_one in zip(got, want_single):
        for name in res_mesh:
            assert [s["text"] for s in res_mesh[name]["segments"]] == [
                s["text"] for s in res_one[name]["segments"]
            ], name


def test_threaded_chunked_upload_equivalent(model, monkeypatch):
    """WTT_UPLOAD_THREADS issues the chunk puts concurrently; the assembled
    device mel must be identical to the serial chunked and monolithic paths."""
    from whisper_timestamped_tpu.parallel.batch import prepare_audio_batch

    audios = {f"s{i}": _audio(50 + i, 4) for i in range(5)}
    base = np.asarray(prepare_audio_batch(audios, model.dims.n_mels).mel_stack)
    monkeypatch.setenv("WTT_UPLOAD_CHUNK_MB", "0.1")
    serial = np.asarray(prepare_audio_batch(audios, model.dims.n_mels).mel_stack)
    monkeypatch.setenv("WTT_UPLOAD_THREADS", "4")
    threaded = np.asarray(prepare_audio_batch(audios, model.dims.n_mels).mel_stack)
    assert np.array_equal(base, serial)
    assert np.array_equal(base, threaded)


def test_prepared_audio_mismatch_raises(model, tok):
    from whisper_timestamped_tpu.parallel.batch import prepare_audio_batch

    prepared = prepare_audio_batch({"x": _audio(27, 3)}, model.dims.n_mels)
    with pytest.raises(ValueError, match="does not match"):
        transcribe_batch(model, {"y": _audio(28, 3)}, tok, language="en",
                         temperature=[0.0], _prepared=prepared)


def test_stream_early_break_and_reuse(model, tok):
    """Breaking out of the serving generator mid-stream must not wedge
    (daemon prefetch thread, bounded queue) and the engine stays usable."""
    from whisper_timestamped_tpu.parallel.batch import transcribe_batch_stream

    def endless():
        i = 0
        while True:  # a source that never ends (directory-watcher shape)
            yield {f"x{i}": _audio(30 + i, 3)}
            i += 1

    kw = dict(language="en", batch_size=2, temperature=[0.0],
              no_speech_threshold=None, logprob_threshold=None)
    engine = DecodeEngine(model, tok)
    gen = transcribe_batch_stream(model, endless(), tok, engine=engine, **kw)
    first = next(gen)
    assert list(first) == ["x0"] and first["x0"]["segments"]
    gen.close()  # must not hang on the blocked prefetch thread
    # engine still serves afterwards
    again = transcribe_batch(model, {"y": _audio(40, 3)}, tok,
                             engine=engine, **kw)
    assert again["y"]["segments"]


def test_stream_source_exception_propagates(model, tok):
    from whisper_timestamped_tpu.parallel.batch import transcribe_batch_stream

    def bad():
        yield {"a": _audio(41, 3)}
        raise RuntimeError("source broke")

    kw = dict(language="en", batch_size=2, temperature=[0.0],
              no_speech_threshold=None, logprob_threshold=None)
    gen = transcribe_batch_stream(model, bad(), tok, **kw)
    assert list(next(gen)) == ["a"]
    with pytest.raises(RuntimeError, match="source broke"):
        for _ in gen:
            pass
