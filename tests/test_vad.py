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


def test_silero_unknown_architecture_falls_back(tmp_path):
    """A .jit model outside the known schema must use the torchscript
    adapter, not silently mis-score."""
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
    fn = sj._cached_prob_model(path)
    assert not getattr(fn, "is_jax", False)
    probs = fn(np.zeros((3, 512), np.float32), 16000)
    assert probs.shape == (3,)


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
