from .profiling import stage_timer, get_stage_timings, reset_stage_timings, trace  # noqa: F401
