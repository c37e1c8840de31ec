"""Two-pass ("naive") engine: decode, then teacher-forced re-alignment.

Counterpart of the reference's ``_transcribe_timestamped_naive``
(``transcribe.py:1004-1338``), used for beam search / best_of>1 /
``trust_whisper_timestamps=False``. Implementation lands with the beam-search
milestone; the unified single-pass engine already covers greedy decoding and
temperature fallback (which the reference could only serve naively).
"""

from __future__ import annotations


def transcribe_naive(engine, audio, **options):
    raise NotImplementedError(
        "Beam search / best_of>1 (two-pass engine) is not implemented yet in "
        "this build; use greedy decoding or the temperature fallback schedule."
    )
