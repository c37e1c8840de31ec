"""Output writers: txt / vtt / srt / tsv / csv / json (+ word-level variants).

Provides the formats the reference gets from whisper's writers plus its own
``write_csv`` (reference ``transcribe.py:2309-2325``, usage at
``transcribe.py:3140-3178``). Each writer takes an iterable of segment-like
dicts (``{"text", "start", "end", ...}``) — word dicts work too, which is how
the ``.words.*`` variants are produced.
"""

from __future__ import annotations

import csv as _csv
import json
import os
from typing import IO, Iterable, Iterator, List, Optional


def format_timestamp(
    seconds: float, always_include_hours: bool = False, decimal_marker: str = "."
) -> str:
    assert seconds >= 0, "non-negative timestamp expected"
    milliseconds = round(seconds * 1000.0)
    hours = milliseconds // 3_600_000
    milliseconds -= hours * 3_600_000
    minutes = milliseconds // 60_000
    milliseconds -= minutes * 60_000
    secs = milliseconds // 1_000
    milliseconds -= secs * 1_000
    hours_marker = f"{hours:02d}:" if always_include_hours or hours > 0 else ""
    return f"{hours_marker}{minutes:02d}:{secs:02d}{decimal_marker}{milliseconds:03d}"


def flatten(list_of_dicts: Iterable[dict], key: Optional[str] = None) -> Iterator:
    """Yield items of each dict's ``key`` list (segments → words)."""
    for d in list_of_dicts:
        for item in d.get(key, []) if key else d:
            yield item


def remove_keys(list_of_dicts: Iterable[dict], key: str) -> Iterator[dict]:
    for d in list_of_dicts:
        yield {k: d[k] for k in d.keys() - {key}}


def write_txt(transcript: Iterable[dict], file: IO):
    for segment in transcript:
        print(segment["text"].strip(), file=file, flush=True)


def write_vtt(transcript: Iterable[dict], file: IO):
    print("WEBVTT\n", file=file)
    for segment in transcript:
        print(
            f"{format_timestamp(segment['start'])} --> {format_timestamp(segment['end'])}\n"
            f"{segment['text'].strip().replace('-->', '->')}\n",
            file=file,
            flush=True,
        )


def write_srt(transcript: Iterable[dict], file: IO):
    for i, segment in enumerate(transcript, start=1):
        print(
            f"{i}\n"
            f"{format_timestamp(segment['start'], always_include_hours=True, decimal_marker=',')} --> "
            f"{format_timestamp(segment['end'], always_include_hours=True, decimal_marker=',')}\n"
            f"{segment['text'].strip().replace('-->', '->')}\n",
            file=file,
            flush=True,
        )


def write_csv(
    transcript: Iterable[dict],
    file: IO,
    sep: str = ",",
    text_first: bool = True,
    format_timestamps=None,
    header=False,
):
    writer = _csv.writer(file, delimiter=sep)
    if format_timestamps is None:
        format_timestamps = lambda x: x  # noqa: E731
    if header is True:
        header = ["text", "start", "end"] if text_first else ["start", "end", "text"]
    if header:
        writer.writerow(header)
    if text_first:
        writer.writerows(
            [
                [seg["text"].strip(), format_timestamps(seg["start"]), format_timestamps(seg["end"])]
                for seg in transcript
            ]
        )
    else:
        writer.writerows(
            [
                [format_timestamps(seg["start"]), format_timestamps(seg["end"]), seg["text"].strip()]
                for seg in transcript
            ]
        )


def write_tsv(transcript: Iterable[dict], file: IO):
    """start/end in integer milliseconds, tab-separated, with header.

    Plain prints like whisper's WriteTSV (which the reference reuses) — no
    csv-module quoting; tabs inside the text are replaced with spaces."""
    print("start", "end", "text", sep="\t", file=file)
    for seg in transcript:
        print(
            round(1000 * seg["start"]),
            round(1000 * seg["end"]),
            seg["text"].strip().replace("\t", " "),
            sep="\t",
            file=file,
        )


def write_json(result: dict, file: IO):
    json.dump(result, file, indent=2, ensure_ascii=False)


WRITERS = {
    "txt": write_txt,
    "vtt": write_vtt,
    "srt": write_srt,
    "tsv": write_tsv,
    "csv": write_csv,
}

VALID_FORMATS = ["txt", "vtt", "srt", "tsv", "csv", "json"]


def write_all_formats(result: dict, outname: str, formats: List[str]):
    """Write every requested format (+ ``.words.*`` variants) for one result."""
    segments = result["segments"]
    if "json" in formats:
        with open(outname + ".words.json", "w", encoding="utf-8") as f:
            write_json(result, f)
    if "txt" in formats:
        with open(outname + ".txt", "w", encoding="utf-8") as f:
            write_txt(segments, f)
    for fmt in ("vtt", "srt", "csv", "tsv"):
        if fmt in formats:
            writer = WRITERS[fmt]
            # newline="" is required for files handed to csv.writer (else \n
            # gets platform-translated on top of csv's own \r\n terminator)
            nl = "" if fmt == "csv" else None
            with open(f"{outname}.{fmt}", "w", encoding="utf-8", newline=nl) as f:
                writer(remove_keys(segments, "words"), f)
            with open(f"{outname}.words.{fmt}", "w", encoding="utf-8", newline=nl) as f:
                writer(flatten(segments, "words"), f)


def get_writer(output_format: str, output_dir: str):
    """``whisper.utils.get_writer`` analog (the writer-factory entry point
    migrating code calls; the reference reuses whisper's writers,
    ``transcribe.py:2973-2999``).

    Returns ``writer(result, audio_path)`` which writes
    ``<output_dir>/<audio basename>.<ext>`` — or every format (plus the
    ``.words.*`` word-level variants) for ``"all"``."""
    if output_format == "all":
        formats = list(VALID_FORMATS)
    else:
        if output_format not in VALID_FORMATS:
            raise ValueError(
                f"unknown output format {output_format!r}; "
                f"expected one of {VALID_FORMATS + ['all']}"
            )
        formats = [output_format]

    def writer(result: dict, audio_path: str, **_ignored):
        base = os.path.join(
            output_dir, os.path.splitext(os.path.basename(audio_path))[0]
        )
        if output_format == "all":
            write_all_formats(result, base, formats)
            return
        segments = result["segments"]
        if output_format == "json":
            with open(base + ".json", "w", encoding="utf-8") as f:
                write_json(result, f)
            return
        nl = "" if output_format == "csv" else None
        with open(f"{base}.{output_format}", "w", encoding="utf-8", newline=nl) as f:
            if output_format == "txt":
                write_txt(segments, f)
            else:
                WRITERS[output_format](remove_keys(segments, "words"), f)

    return writer
