"""whisper_timestamped_tpu — TPU-native speech transcription with word-level timestamps.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
``linto-ai/whisper-timestamped`` (reference ``whisper_timestamped/__init__.py:1-10``):
multilingual Whisper transcription, accurate word timestamps + confidences via
on-device DTW over cross-attention, VAD pre-filtering, disfluency detection,
OpenAI/HF checkpoint loading, CLI with six output formats, and subtitle tools —
all with the compute path owned by jitted JAX (no hooks, no per-step host copies).
"""

__version__ = "0.1.0"

from .audio import (  # noqa: F401
    SAMPLE_RATE,
    N_FFT,
    HOP_LENGTH,
    CHUNK_LENGTH,
    N_SAMPLES,
    N_FRAMES,
    load_audio,
    log_mel_spectrogram,
    pad_or_trim,
)

_LAZY = {
    "transcribe": ("whisper_timestamped_tpu.api", "transcribe_timestamped"),
    "transcribe_timestamped": ("whisper_timestamped_tpu.api", "transcribe_timestamped"),
    "load_model": ("whisper_timestamped_tpu.models.load", "load_model"),
    "available_models": ("whisper_timestamped_tpu.models.load", "available_models"),
    "Tokenizer": ("whisper_timestamped_tpu.tokenizer", "Tokenizer"),
    "get_tokenizer": ("whisper_timestamped_tpu.tokenizer", "get_tokenizer"),
    "decode": ("whisper_timestamped_tpu.decoding", "decode"),
    "DecodingOptions": ("whisper_timestamped_tpu.decoding", "DecodingOptions"),
    "DecodingResult": ("whisper_timestamped_tpu.decoding", "DecodingResult"),
    "detect_language": ("whisper_timestamped_tpu.decoding", "detect_language"),
    "perform_word_alignment": ("whisper_timestamped_tpu.alignment", "perform_word_alignment"),
    "remove_non_speech": ("whisper_timestamped_tpu.vad", "remove_non_speech"),
    "transcribe_batch": ("whisper_timestamped_tpu.parallel.batch", "transcribe_batch"),
    "transcribe_batch_stream": (
        "whisper_timestamped_tpu.parallel.batch", "transcribe_batch_stream"),
    # model-class analogs of the reference's `Whisper`/`ModelDimensions`
    # re-exports (reference __init__.py:5)
    "WhisperModel": ("whisper_timestamped_tpu.models.load", "WhisperModel"),
    "WhisperDims": ("whisper_timestamped_tpu.models.whisper_jax", "WhisperDims"),
    # drop-in aliases under the reference's exact names (reference
    # __init__.py:1-5 re-exports whisper.{Whisper,ModelDimensions,_MODELS,
    # _download}); here they resolve to the JAX-native equivalents
    "Whisper": ("whisper_timestamped_tpu.models.load", "WhisperModel"),
    "ModelDimensions": ("whisper_timestamped_tpu.models.whisper_jax", "WhisperDims"),
    "_MODELS": ("whisper_timestamped_tpu.models.load", "_MODELS"),
    "_download": ("whisper_timestamped_tpu.models.load", "_download"),
}

_LAZY_MODULES = {
    # module re-exports the reference forwards from whisper (__init__.py:2):
    # `whisper.normalizers.EnglishTextNormalizer()` keeps working
    "normalizers": "whisper_timestamped_tpu.normalizers",
    "audio": "whisper_timestamped_tpu.audio",
    "decoding": "whisper_timestamped_tpu.decoding",
    "tokenizer": "whisper_timestamped_tpu.tokenizer",
    "utils": "whisper_timestamped_tpu.utils",  # whisper.utils surface
    "model": "whisper_timestamped_tpu.models.whisper_jax",  # whisper.model surface
}


def __getattr__(name):
    import importlib

    if name in _LAZY:
        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    if name in _LAZY_MODULES:
        return importlib.import_module(_LAZY_MODULES[name])
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
