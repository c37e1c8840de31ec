from .profiling import stage_timer, get_stage_timings, reset_stage_timings, trace  # noqa: F401
from .compile_cache import enable_persistent_compile_cache  # noqa: F401

# whisper.utils surface (the reference re-exports that module,
# __init__.py:2): migrating `whisper.utils.get_writer(...)` keeps working.
# Lazy: this package is imported by the engine for profiling, and eager
# re-imports of cli/decoding would cycle back through it.
_WHISPER_UTILS = {
    "format_timestamp": ("whisper_timestamped_tpu.writers", "format_timestamp"),
    "get_writer": ("whisper_timestamped_tpu.writers", "get_writer"),
    "compression_ratio": ("whisper_timestamped_tpu.decoding", "compression_ratio"),
    "str2bool": ("whisper_timestamped_tpu.cli", "str2bool"),
    "optional_int": ("whisper_timestamped_tpu.cli", "optional_int"),
    "optional_float": ("whisper_timestamped_tpu.cli", "optional_float"),
}


def __getattr__(name):
    if name in _WHISPER_UTILS:
        import importlib

        module, attr = _WHISPER_UTILS[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
