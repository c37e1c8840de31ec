"""Silero-VAD speech-timestamp extraction.

The reference loads silero via ``torch.hub`` + the package's
``get_speech_timestamps`` util (reference ``transcribe.py:1949-2023``). Here:

  * the frame-probability model is pluggable: locally cached silero
    ``.jit`` weights run through torch-cpu (VAD is a host-side pre-pass; the
    TPU-native default is the energy VAD in vad.py), or any callable
    ``probs_fn(chunks (B, window), sample_rate) -> (B,)``;
  * the hysteresis state machine below reimplements the published silero
    ``get_speech_timestamps`` semantics (threshold / neg_threshold=thr-0.15,
    min_speech/min_silence durations, speech padding) and is unit-tested
    against synthetic probability tracks.

Nothing is downloaded: silero weights must already exist locally
(``SILERO_VAD_PATH`` or the torch.hub cache) — vad.py enforces this.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np

WINDOW_SIZE_SAMPLES = 512  # silero v4/v5 @ 16 kHz


def load_torchscript_prob_model(path: str) -> Callable[[np.ndarray, int], np.ndarray]:
    """Wrap a silero ``.jit`` model as a chunk->probability callable."""
    import torch

    model = torch.jit.load(path, map_location="cpu")
    model.eval()

    def probs_fn(chunks: np.ndarray, sample_rate: int) -> np.ndarray:
        out = []
        if hasattr(model, "reset_states"):
            model.reset_states()
        with torch.no_grad():
            for chunk in chunks:
                p = model(torch.from_numpy(chunk).float(), sample_rate)
                out.append(float(p.item() if hasattr(p, "item") else p))
        return np.asarray(out)

    return probs_fn


def speech_probs_to_timestamps(
    speech_probs: np.ndarray,
    audio_length_samples: int,
    *,
    threshold: float = 0.5,
    neg_threshold: Optional[float] = None,
    min_speech_duration_ms: float = 250,
    min_silence_duration_ms: float = 100,
    speech_pad_ms: float = 30,
    sample_rate: int = 16000,
    window_size_samples: int = WINDOW_SIZE_SAMPLES,
) -> List[dict]:
    """Hysteresis state machine over per-window speech probabilities
    (silero ``get_speech_timestamps`` semantics)."""
    if neg_threshold is None:
        neg_threshold = max(threshold - 0.15, 0.01)
    min_speech_samples = sample_rate * min_speech_duration_ms / 1000
    min_silence_samples = sample_rate * min_silence_duration_ms / 1000
    speech_pad_samples = sample_rate * speech_pad_ms / 1000

    triggered = False
    speeches: List[dict] = []
    current: dict = {}
    temp_end = 0

    for i, prob in enumerate(speech_probs):
        pos = window_size_samples * i
        if prob >= threshold and temp_end:
            temp_end = 0
        if prob >= threshold and not triggered:
            triggered = True
            current["start"] = pos
            continue
        if prob < neg_threshold and triggered:
            if not temp_end:
                temp_end = pos
            if pos - temp_end < min_silence_samples:
                continue
            current["end"] = temp_end
            if current["end"] - current["start"] > min_speech_samples:
                speeches.append(current)
            current = {}
            triggered = False
            temp_end = 0

    if current and audio_length_samples - current["start"] > min_speech_samples:
        current["end"] = audio_length_samples
        speeches.append(current)

    # pad segments, splitting inter-segment silences
    for i, speech in enumerate(speeches):
        if i == 0:
            speech["start"] = int(max(0, speech["start"] - speech_pad_samples))
        if i != len(speeches) - 1:
            silence = speeches[i + 1]["start"] - speech["end"]
            if silence < 2 * speech_pad_samples:
                speech["end"] += int(silence // 2)
                speeches[i + 1]["start"] = int(max(0, speeches[i + 1]["start"] - silence // 2))
            else:
                speech["end"] = int(min(audio_length_samples, speech["end"] + speech_pad_samples))
                speeches[i + 1]["start"] = int(max(0, speeches[i + 1]["start"] - speech_pad_samples))
        else:
            speech["end"] = int(min(audio_length_samples, speech["end"] + speech_pad_samples))

    return speeches


def silero_get_speech_timestamps(
    audio: np.ndarray,
    model_path: str,
    *,
    sample_rate: int = 16000,
    min_speech_duration: float = 0.1,
    min_silence_duration: float = 0.1,
    threshold: float = 0.5,
    probs_fn: Optional[Callable] = None,
) -> List[dict]:
    """Speech segments (sample units) for 16 kHz audio via silero weights.

    Matches the reference's invocation (``transcribe.py:2016-2023``:
    normalized audio, durations in ms)."""
    from ..vad import normalize_gain

    audio = normalize_gain(np.asarray(audio, np.float32))

    if probs_fn is None:
        if model_path.endswith(".onnx"):
            raise RuntimeError(
                "onnxruntime is not available in this environment; provide a "
                ".jit silero model or use the energy VAD."
            )
        probs_fn = load_torchscript_prob_model(model_path)

    n = len(audio)
    n_chunks = int(np.ceil(n / WINDOW_SIZE_SAMPLES))
    padded = np.zeros(n_chunks * WINDOW_SIZE_SAMPLES, np.float32)
    padded[:n] = audio
    chunks = padded.reshape(n_chunks, WINDOW_SIZE_SAMPLES)
    probs = np.asarray(probs_fn(chunks, sample_rate))

    return speech_probs_to_timestamps(
        probs,
        n,
        threshold=threshold,
        min_speech_duration_ms=round(min_speech_duration * 1000),
        min_silence_duration_ms=round(min_silence_duration * 1000),
        sample_rate=sample_rate,
    )
