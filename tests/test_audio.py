"""Audio front-end tests: STFT/mel against independent torch + transformers oracles."""

import numpy as np
import pytest

from whisper_timestamped_tpu import audio as A


def test_constants():
    assert A.N_SAMPLES == 480000
    assert A.N_FRAMES == 3000
    assert A.AUDIO_TIME_PER_TOKEN == 0.02


def test_mel_filters_match_transformers():
    # transformers' WhisperFeatureExtractor computes the same slaney filterbank
    # that whisper ships in mel_filters.npz.
    tf_audio = pytest.importorskip("transformers.audio_utils")
    ours = A.mel_filters(80)
    theirs = tf_audio.mel_filter_bank(
        num_frequency_bins=201,
        num_mel_filters=80,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm="slaney",
        mel_scale="slaney",
    ).T  # transformers returns (n_bins, n_mels)
    np.testing.assert_allclose(ours, theirs, atol=1e-7)


def test_stft_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.standard_normal(16000).astype(np.float32)
    ours = np.asarray(A._stft_power(np.asarray(x)[None], A.N_FFT, A.HOP_LENGTH))[0]
    window = torch.hann_window(A.N_FFT)
    st = torch.stft(torch.from_numpy(x), A.N_FFT, A.HOP_LENGTH, window=window, return_complex=True)
    theirs = (st[..., :-1].abs() ** 2).numpy().T  # (frames, bins)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-2)


def test_log_mel_matches_transformers_feature_extractor():
    transformers = pytest.importorskip("transformers")
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(3 * 16000) * 0.1).astype(np.float32)
    fe = transformers.WhisperFeatureExtractor()
    theirs = fe(x, sampling_rate=16000, return_tensors="np").input_features[0]  # (80, 3000)
    padded = A.pad_or_trim(x, A.N_SAMPLES)
    ours = np.asarray(A.log_mel_spectrogram(padded))
    assert ours.shape == theirs.shape == (80, 3000)
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_log_mel_batched_matches_single():
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((2, 32000)) * 0.2).astype(np.float32)
    batched = np.asarray(A.log_mel_spectrogram(x))
    singles = np.stack([np.asarray(A.log_mel_spectrogram(x[i])) for i in range(2)])
    np.testing.assert_allclose(batched, singles, atol=1e-6)


def test_pcm16_transport_lossless():
    # PCM-grid floats (what _read_wav/_read_via_ffmpeg produce) round-trip to
    # int16 exactly, and the int16 mel path equals the float32 mel path
    rng = np.random.default_rng(3)
    ints = rng.integers(-32768, 32768, 24000).astype(np.int16)
    x = ints.astype(np.float32) / 32768.0
    a16 = A.as_pcm16(x)
    assert a16 is not None and a16.dtype == np.int16
    assert np.array_equal(a16, ints)
    mel_f = np.asarray(A.log_mel_spectrogram(x))
    mel_i = np.asarray(A.log_mel_spectrogram(a16))
    np.testing.assert_array_equal(mel_f, mel_i)


def test_pcm16_transport_rejects_off_grid():
    rng = np.random.default_rng(4)
    # generic float audio off the int16 grid must NOT be quantized
    assert A.as_pcm16(rng.standard_normal(1000).astype(np.float32) * 0.1) is None
    # out-of-range samples (>|1|) must not wrap
    assert A.as_pcm16(np.asarray([2.0], np.float32)) is None


def test_log_mel_128_bins():
    x = np.zeros(16000, dtype=np.float32)
    out = A.log_mel_spectrogram(x, n_mels=128)
    assert out.shape == (128, 100)


def test_pad_or_trim():
    x = np.ones(10, np.float32)
    assert A.pad_or_trim(x, 4).shape == (4,)
    y = A.pad_or_trim(x, 20)
    assert y.shape == (20,) and y[10:].sum() == 0


def test_wav_roundtrip(tmp_path):
    import wave

    sr = 8000
    t = np.arange(sr) / sr
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = str(tmp_path / "tone.wav")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((sig * 32767).astype("<i2").tobytes())
    loaded = A.load_audio(path)
    assert loaded.dtype == np.float32
    assert abs(len(loaded) - 16000) <= 1  # resampled 8k -> 16k
    # spot-check content: dominant frequency should still be 440 Hz
    spec = np.abs(np.fft.rfft(loaded[:16000]))
    assert abs(np.argmax(spec) - 440) <= 2


def test_load_audio_array_passthrough():
    x = np.linspace(-1, 1, 100).astype(np.float32)
    np.testing.assert_array_equal(A.load_audio(x), x)


def test_load_audio_torch_tensor():
    """The reference's get_audio_tensor accepts torch tensors
    (transcribe.py:1340-1347); migrating callers pass them here too."""
    torch = pytest.importorskip("torch")
    x = np.linspace(-1, 1, 64).astype(np.float32)
    np.testing.assert_array_equal(A.load_audio(torch.from_numpy(x)), x)
    stereo = torch.from_numpy(np.stack([x, -x]))  # (2, n) -> mono mean
    np.testing.assert_allclose(A.load_audio(stereo), np.zeros_like(x), atol=1e-7)


def test_load_reference_fixture_wav():
    import os

    path = "/root/reference/tests/data/bonjour.wav"
    if not os.path.exists(path):
        pytest.skip("reference fixtures unavailable")
    x = A.load_audio(path)
    assert x.ndim == 1 and len(x) > 1000
    assert np.abs(x).max() <= 1.0
