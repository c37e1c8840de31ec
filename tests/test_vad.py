"""VAD subsystem tests: method normalization, energy splitter, timestamp maps."""

import numpy as np
import pytest

from whisper_timestamped_tpu.vad import (
    check_vad_method,
    do_convert_timestamps,
    get_vad_segments,
    remove_non_speech,
)


def test_check_vad_method():
    assert check_vad_method(True) == "silero"
    assert check_vad_method(False) is None
    assert check_vad_method(None) is None
    assert check_vad_method("auditok") == "auditok"
    assert check_vad_method([(0, 1), (2, 3)]) == [(0.0, 1.0), (2.0, 3.0)]
    assert check_vad_method("[(0, 1)]") == [(0, 1)]
    assert check_vad_method("silero:3.1", with_version=True) == ("silero", "v3.1")
    with pytest.raises(ValueError):
        check_vad_method("nonsense_method")


def _speech_like(sr=16000):
    """2s loud speech-ish noise, 2s silence, 2s loud again."""
    rng = np.random.default_rng(0)
    a = np.zeros(sr * 6, np.float32)
    a[: sr * 2] = rng.standard_normal(sr * 2) * 0.3
    a[sr * 4 :] = rng.standard_normal(sr * 2) * 0.3
    return a


def test_energy_vad_finds_speech_blocks():
    a = _speech_like()
    segs = get_vad_segments(a, method="energy", dilatation=0.0)
    assert len(segs) == 2
    assert segs[0]["start"] < 0.3 and abs(segs[0]["end"] - 2.0) < 0.3
    assert abs(segs[1]["start"] - 4.0) < 0.3


def test_dilation_merges_overlapping():
    a = _speech_like()
    segs = get_vad_segments(a, method="energy", dilatation=1.5)
    assert len(segs) == 1  # dilation bridges the 2s gap


def test_remove_non_speech_and_convert():
    a = _speech_like()
    speech, segments, convert = remove_non_speech(a, method="energy", dilatation=0.25)
    assert len(segments) == 2
    assert len(speech) < len(a)
    # time 0.5 in speech-time falls in first segment
    t = convert(0.5)
    assert segments[0][0] <= t <= segments[0][1]
    # a time in the second region maps past the cut gap
    dur0 = segments[0][1] - segments[0][0]
    t2 = convert(dur0 + 0.5)
    assert segments[1][0] <= t2 <= segments[1][1]
    # pair conversion keeps both ends in bounds
    s, e = convert(dur0 + 0.2, dur0 + 0.8)
    assert segments[1][0] <= s <= e <= segments[1][1]


def test_convert_timestamps_identity_single_segment():
    segs = [(0.0, 10.0)]
    assert do_convert_timestamps(segs, 3.217) == 3.22  # rounds to 2 decimals


def test_no_speech_at_all():
    a = np.zeros(16000 * 2, np.float32)
    speech, segments, convert = remove_non_speech(a, method="energy")
    assert len(segments) == 0 and len(speech) == 0
    assert convert(1.0) == 1.0  # identity fallback


def test_avoid_empty_speech():
    a = np.zeros(16000 * 2, np.float32)
    speech, segments, _ = remove_non_speech(a, method="energy", avoid_empty_speech=True)
    assert len(segments) == 1 and len(speech) == len(a)


def test_silero_without_weights_raises():
    a = _speech_like()
    with pytest.raises(FileNotFoundError):
        get_vad_segments(a, method="silero")


def test_silero_state_machine_synthetic():
    from whisper_timestamped_tpu.models.silero_jax import speech_probs_to_timestamps

    # 100 windows of 512 samples: speech at windows 10-30 and 60-80
    probs = np.zeros(100)
    probs[10:30] = 0.9
    probs[60:80] = 0.9
    segs = speech_probs_to_timestamps(probs, 100 * 512, min_silence_duration_ms=100)
    assert len(segs) == 2
    assert abs(segs[0]["start"] - 10 * 512) < 1000
    assert segs[0]["end"] < segs[1]["start"]
    # short blip below min_speech ignored
    probs2 = np.zeros(100)
    probs2[50] = 0.9  # 512 samples = 32ms < 250ms min_speech
    assert speech_probs_to_timestamps(probs2, 100 * 512) == []


def test_silero_hysteresis_brief_dip():
    from whisper_timestamped_tpu.models.silero_jax import speech_probs_to_timestamps

    probs = np.zeros(100)
    probs[10:50] = 0.9
    probs[30] = 0.1  # single-window dip (~32ms) under min_silence 100ms
    segs = speech_probs_to_timestamps(probs, 100 * 512)
    assert len(segs) == 1  # dip bridged


def _make_fake_silero_jit(tmp_path):
    """A torchscript model with the silero-v5 architecture and state_dict
    schema (STFT basis conv -> 4 reparam convs -> LSTMCell -> conv head,
    64-sample streaming context) — the oracle for the JAX port."""
    import torch
    import torch.nn as nn

    class Stft(nn.Module):
        def __init__(self):
            super().__init__()
            g = torch.Generator().manual_seed(7)
            self.register_buffer(
                "forward_basis_buffer", torch.randn(258, 1, 256, generator=g) * 0.1
            )

        def forward(self, x):  # (B, 576) -> (B, 129, T)
            out = nn.functional.conv1d(x[:, None, :], self.forward_basis_buffer, stride=128)
            return torch.sqrt(out[:, :129] ** 2 + out[:, 129:] ** 2 + 1e-12)

    class EncBlock(nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.reparam_conv = nn.Conv1d(cin, cout, 3, stride=stride, padding=1)

        def forward(self, x):
            return torch.relu(self.reparam_conv(x))

    class Decoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.rnn = nn.LSTMCell(128, 128)
            self.decoder = nn.Sequential(
                nn.Identity(), nn.ReLU(), nn.Conv1d(128, 1, 1), nn.Sigmoid()
            )

    class Inner(nn.Module):
        def __init__(self):
            super().__init__()
            self.stft = Stft()
            self.encoder = nn.Sequential(
                EncBlock(129, 128, 1), EncBlock(128, 64, 2),
                EncBlock(64, 64, 2), EncBlock(64, 128, 1),
            )
            self.decoder = Decoder()

    class FakeSilero(nn.Module):
        def __init__(self):
            super().__init__()
            self._model = Inner()
            self.register_buffer("_h", torch.zeros(1, 128))
            self.register_buffer("_c", torch.zeros(1, 128))
            self.register_buffer("_ctx", torch.zeros(64))

        @torch.jit.export
        def reset_states(self):
            self._h.zero_()
            self._c.zero_()
            self._ctx.zero_()

        def forward(self, x, sr: int):
            frame = torch.cat([self._ctx, x])[None]  # (1, 576)
            mag = self._model.stft(frame)
            feat = self._model.encoder(mag).mean(dim=-1)  # (1, 128)
            h, c = self._model.decoder.rnn(feat, (self._h, self._c))
            self._h.copy_(h)
            self._c.copy_(c)
            self._ctx.copy_(x[-64:])
            return self._model.decoder.decoder(h[:, :, None]).reshape(())

    torch.manual_seed(3)
    path = str(tmp_path / "silero_vad.jit")
    torch.jit.script(FakeSilero().eval()).save(path)
    return path


def test_jax_silero_port_matches_torchscript(tmp_path):
    from whisper_timestamped_tpu.models import silero_jax as sj

    path = _make_fake_silero_jit(tmp_path)
    jax_fn = sj.load_jax_prob_model(path)
    assert jax_fn is not None and getattr(jax_fn, "is_jax", False)
    ts_fn = sj.load_torchscript_prob_model(path)
    rng = np.random.default_rng(1)
    chunks = (rng.standard_normal((20, 512)) * 0.3).astype(np.float32)
    np.testing.assert_allclose(
        jax_fn(chunks, 16000), ts_fn(chunks, 16000), atol=1e-4
    )


def test_jax_silero_end_to_end_via_vad(tmp_path, monkeypatch):
    """vad='silero' resolves weights from SILERO_VAD_PATH and segments
    through the JAX port; segments equal the torchscript adapter's."""
    from whisper_timestamped_tpu.models import silero_jax as sj

    path = _make_fake_silero_jit(tmp_path)
    monkeypatch.setenv("SILERO_VAD_PATH", path)
    a = _speech_like()
    segs = get_vad_segments(a, method="silero", dilatation=0.0)
    assert sj._PROB_MODEL_CACHE[path].is_jax

    ts_segs = sj.silero_get_speech_timestamps(
        a, path, probs_fn=sj.load_torchscript_prob_model(path),
        min_speech_duration=0.1, min_silence_duration=0.1,
    )
    jx_segs = sj.silero_get_speech_timestamps(
        a, path, min_speech_duration=0.1, min_silence_duration=0.1,
    )
    assert jx_segs == ts_segs


def test_silero_unknown_architecture_falls_back(tmp_path, caplog):
    """A .jit model outside the known schema (e.g. the v3/v4 architectures the
    reference pins via "silero:3.1") must use the torchscript adapter WITH a
    loud revision warning, not silently mis-score (MIGRATION.md 'Silero VAD
    revisions')."""
    import logging

    import torch
    import torch.nn as nn

    from whisper_timestamped_tpu.models import silero_jax as sj

    class Odd(nn.Module):
        def __init__(self):
            super().__init__()
            self.lin = nn.Linear(512, 1)

        @torch.jit.export
        def reset_states(self):
            pass

        def forward(self, x, sr: int):
            return torch.sigmoid(self.lin(x)).reshape(())

    path = str(tmp_path / "odd.jit")
    torch.jit.script(Odd().eval()).save(path)
    assert sj.load_jax_prob_model(path) is None
    with caplog.at_level(logging.WARNING, logger="whisper_timestamped_tpu"):
        fn = sj._cached_prob_model(path)
    assert any(
        "v5 weight schema" in r.getMessage() and "torchscript" in r.getMessage()
        for r in caplog.records
    ), [r.getMessage() for r in caplog.records]
    assert not getattr(fn, "is_jax", False)
    probs = fn(np.zeros((3, 512), np.float32), 16000)
    assert probs.shape == (3,)


def test_silero_window_size_override():
    """silero:3.x pinnings chunk at the v3 util's 1536-sample window (the
    reference's torch.hub invocation, transcribe.py:1949-2023); default 512."""
    from whisper_timestamped_tpu.models.silero_jax import silero_get_speech_timestamps

    seen = {}

    def spy(chunks, sr):
        seen["shape"] = chunks.shape
        return np.zeros(len(chunks))

    audio = np.zeros(16000, np.float32)
    silero_get_speech_timestamps(audio, "unused", probs_fn=spy)
    assert seen["shape"][1] == 512
    silero_get_speech_timestamps(audio, "unused", probs_fn=spy,
                                 window_size_samples=1536)
    assert seen["shape"][1] == 1536


def test_silero_fake_prob_model_end_to_end():
    from whisper_timestamped_tpu.models.silero_jax import silero_get_speech_timestamps

    rng = np.random.default_rng(0)
    audio = np.zeros(16000 * 4, np.float32)
    audio[16000:32000] = rng.standard_normal(16000) * 0.5

    def fake_probs(chunks, sr):
        return (np.abs(chunks).mean(axis=-1) > 0.05).astype(float)

    segs = silero_get_speech_timestamps(
        audio, model_path="(unused)", probs_fn=fake_probs
    )
    assert len(segs) == 1
    assert abs(segs[0]["start"] - 16000) < 2000
    assert abs(segs[0]["end"] - 32000) < 2000


# ---------------------------------------------------------------------------
# Silero ONNX weight path (protobuf lifted by models/onnx_weights.py — no
# onnx/onnxruntime in this environment, reference transcribe.py:1956-2011)
# ---------------------------------------------------------------------------


def _pb_varint(v):
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            return bytes(out)


def _pb_len_field(num, data):
    return _pb_varint((num << 3) | 2) + _pb_varint(len(data)) + data


def _pb_tensor(name, arr):
    arr = np.asarray(arr, np.float32)
    msg = b"".join(_pb_varint(1 << 3) + _pb_varint(d) for d in arr.shape)  # dims
    msg += _pb_varint(2 << 3) + _pb_varint(1)  # data_type = FLOAT
    msg += _pb_len_field(8, name.encode())
    msg += _pb_len_field(9, arr.tobytes())
    return msg


def _write_fake_onnx(path, initializers, subgraph_initializers=None):
    """Serialize {name: array} dicts as a minimal valid ModelProto, optionally
    burying some initializers in an If-style node-attribute subgraph (the
    real silero onnx wraps its 8k/16k paths that way)."""
    nodes = b""
    if subgraph_initializers:
        sub = b"".join(
            _pb_len_field(5, _pb_tensor(n, a))
            for n, a in subgraph_initializers.items()
        )
        attr = _pb_len_field(6, sub)  # AttributeProto.g
        nodes = _pb_len_field(1, _pb_len_field(5, attr))  # GraphProto.node
    graph = nodes + b"".join(
        _pb_len_field(5, _pb_tensor(n, a)) for n, a in initializers.items()
    )
    with open(path, "wb") as f:
        f.write(_pb_len_field(7, graph))  # ModelProto.graph


def _jit_state_arrays(jit_path):
    import torch

    sd = torch.jit.load(jit_path, map_location="cpu").state_dict()
    return {k: v.detach().cpu().numpy() for k, v in sd.items()
            if k.startswith("_model.")}


def test_silero_onnx_weights_match_jit(tmp_path):
    """ONNX-initializer weights must drive the SAME jax network as the .jit
    parse — probs bit-equal on identical weights. Half the tensors are buried
    in an If-branch subgraph to exercise the recursive collector."""
    from whisper_timestamped_tpu.models import silero_jax as sj

    jit_path = _make_fake_silero_jit(tmp_path)
    arrays = _jit_state_arrays(jit_path)
    names = sorted(arrays)
    onnx_path = str(tmp_path / "silero_vad.onnx")
    _write_fake_onnx(
        onnx_path,
        {n: arrays[n] for n in names[::2]},
        subgraph_initializers={n: arrays[n] for n in names[1::2]},
    )

    onnx_fn = sj.load_onnx_prob_model(onnx_path)
    assert onnx_fn is not None and getattr(onnx_fn, "is_jax", False)
    jit_fn = sj.load_jax_prob_model(jit_path)
    rng = np.random.default_rng(5)
    chunks = (rng.standard_normal((16, 512)) * 0.3).astype(np.float32)
    np.testing.assert_array_equal(onnx_fn(chunks, 16000), jit_fn(chunks, 16000))


def test_silero_onnx_shape_fallback(tmp_path):
    """Exporters that mangle module paths: conv stack matched by shape
    chaining, LSTM by the ih/hh name fragments."""
    from whisper_timestamped_tpu.models import silero_jax as sj

    jit_path = _make_fake_silero_jit(tmp_path)
    arrays = _jit_state_arrays(jit_path)
    renamed = {}
    for i, (name, arr) in enumerate(sorted(arrays.items())):
        for frag in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            if frag in name:
                renamed[f"onnx::LSTM_{i}.{frag}"] = arr
                break
        else:
            renamed[f"onnx::Conv_{i}"] = arr
    onnx_path = str(tmp_path / "mangled.onnx")
    _write_fake_onnx(onnx_path, renamed)

    onnx_fn = sj.load_onnx_prob_model(onnx_path)
    assert onnx_fn is not None
    jit_fn = sj.load_jax_prob_model(jit_path)
    rng = np.random.default_rng(6)
    chunks = (rng.standard_normal((8, 512)) * 0.3).astype(np.float32)
    np.testing.assert_array_equal(onnx_fn(chunks, 16000), jit_fn(chunks, 16000))


def test_silero_onnx_end_to_end_via_vad(tmp_path, monkeypatch):
    """A user with only a cached silero_vad.onnx gets working vad='silero'
    (previously a dead end: _find_local_silero found the file but only .jit
    parsed). Segments must equal the .jit route's."""
    from whisper_timestamped_tpu.models import silero_jax as sj

    jit_path = _make_fake_silero_jit(tmp_path)
    onnx_path = str(tmp_path / "silero_vad.onnx")
    _write_fake_onnx(onnx_path, _jit_state_arrays(jit_path))

    a = _speech_like()
    monkeypatch.setenv("SILERO_VAD_PATH", jit_path)
    want = get_vad_segments(a, method="silero", dilatation=0.0)
    monkeypatch.setenv("SILERO_VAD_PATH", onnx_path)
    got = get_vad_segments(a, method="silero", dilatation=0.0)
    assert got == want
    assert sj._PROB_MODEL_CACHE[onnx_path].is_jax


def test_silero_onnx_schema_mismatch_raises(tmp_path, monkeypatch):
    """An unrecognized onnx must fail loudly, not mis-score."""
    from whisper_timestamped_tpu.models import silero_jax as sj

    onnx_path = str(tmp_path / "weird.onnx")
    _write_fake_onnx(onnx_path, {"w": np.zeros((3, 3), np.float32)})
    with pytest.raises(RuntimeError, match="v5 weight schema"):
        sj._cached_prob_model(onnx_path)
