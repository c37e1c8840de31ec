"""Word/segment post-processing sanitizers.

Ports of ``remove_last_null_duration_words`` (reference
``transcribe.py:2202-2262``) and ``ensure_increasing_positions``
(``transcribe.py:2265-2295``): hallucination pruning at chunk ends and
monotonic timestamp repair with a minimum word duration.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Tuple

from .alignment import round_timestamp

logger = logging.getLogger("whisper_timestamped_tpu")


def remove_last_null_duration_words(
    transcription: Dict, words: List[Dict], recompute_text: bool = False
) -> Tuple[Dict, List[Dict]]:
    """Drop zero-duration words at the end of an audio chunk (hallucinations)."""
    segments_groups = {}
    seek = None
    current_chunk = -1
    for i, segment in enumerate(transcription["segments"]):
        if segment["seek"] != seek:
            current_chunk += 1
            seek = segment["seek"]
        segments_groups[i] = current_chunk

    current_chunk = -1
    is_last_empty = False
    to_remove = []
    for i in range(len(words) - 1, -1, -1):
        word = words[i]
        empty = word["start"] == word["end"]
        idx_segment = word["idx_segment"]
        group = segments_groups[idx_segment]
        if current_chunk != group:
            is_last_empty = empty
            current_chunk = group
        elif not empty:
            is_last_empty = False
        if is_last_empty:
            to_remove.append(i)
            full_word = "".join(word["tokens"])
            segment = transcription["segments"][idx_segment]
            text = segment["text"]
            if not text.endswith(full_word):  # tolerate one-char drift (issue #62)
                if text.endswith(full_word[:-1]):
                    full_word = full_word[:-1]
                elif text[:-1].endswith(full_word):
                    text = text[:-1]
                else:
                    raise RuntimeError(f"{text!r} not ending with {full_word!r}")
            text = text[: -len(full_word)] if full_word else text
            if i > 0 and words[i - 1]["idx_segment"] == idx_segment:
                segment["text"] = text
            else:
                logger.debug("Removing empty segment %d", idx_segment)
                transcription["segments"].pop(idx_segment)
                for j in range(i + 1, len(words)):
                    words[j]["idx_segment"] -= 1
            recompute_text = True

    for i in to_remove:
        words.pop(i)

    if recompute_text:
        transcription["text"] = "".join(s["text"] for s in transcription["segments"])

    return transcription, words


def ensure_increasing_positions(segments: List[Dict], min_duration: float = 0) -> List[Dict]:
    """Repair start/end so they are monotonically non-decreasing (recursive)."""
    has_modified_backward = False
    previous_end = 0
    for i, seg in enumerate(segments):
        if seg["start"] < previous_end:
            assert i > 0
            new_start = round_timestamp((previous_end + seg["start"]) / 2)
            if new_start < segments[i - 1]["start"] + min_duration:
                new_start = previous_end
            else:
                segments[i - 1]["end"] = new_start
                has_modified_backward = True
            seg["start"] = new_start
        if seg["end"] <= seg["start"] + min_duration:
            seg["end"] = seg["start"] + min_duration
        previous_end = seg["end"]
    if has_modified_backward:
        return ensure_increasing_positions(segments, min_duration)

    previous_end = 0
    for seg in segments:
        seg["start"] = round_timestamp(seg["start"])
        seg["end"] = round_timestamp(seg["end"])
        assert seg["start"] >= previous_end, (
            f"Got segment {seg} coming before the previous finishes ({previous_end} > {seg['start']})"
        )
        assert seg["end"] >= seg["start"], f"Got segment {seg} with end < start"
        previous_end = seg["end"]

    return segments
