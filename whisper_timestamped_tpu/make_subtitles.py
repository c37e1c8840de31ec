"""Subtitle splitter tool: words.json → srt/vtt with bounded line length.

Behavioral port of the reference's ``make_subtitles.py`` (``:8-65`` splitting,
``:83-103`` writers, ``:105-154`` CLI): segments longer than ``max_length``
characters are split at word boundaries, preferring cut points right after
punctuation, using the word-level timestamps.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import List, Optional

from .alignment import _punctuation
from .writers import write_srt, write_vtt


class _LineBuilder:
    """Accumulates words into a subtitle line, remembering the best
    punctuation cut point seen so far."""

    def __init__(self, start: float, use_space: bool):
        self.buf = ""
        self.start = start
        self.use_space = use_space
        # (cut position in buf, end time at the cut, start time after the cut)
        self.cut: Optional[tuple] = None

    def append(self, word: str) -> str:
        before = self.buf
        if self.buf and self.use_space:
            self.buf += " "
        self.buf += word
        return before

    def note_punctuation(self, end_time: float, next_start: Optional[float]):
        if self.buf and self.buf[-1] in _punctuation:
            self.cut = (len(self.buf), end_time, next_start)

    def flush_at_cut(self) -> dict:
        pos, end_time, next_start = self.cut
        emitted = {"text": self.buf[:pos], "start": self.start, "end": end_time}
        # NOTE: pos+1 assumes a space follows the cut; with use_space=False
        # this drops the next word's first character — a reference quirk
        # (reference make_subtitles.py:42) pinned by its goldens
        self.buf = self.buf[pos + 1 :]
        self.start = next_start
        self.cut = None
        return emitted


def split_long_segments(segments: List[dict], max_length: int, use_space: bool = True) -> List[dict]:
    """Split segments longer than ``max_length`` characters at word boundaries,
    preferring cut points right after punctuation (reference
    ``make_subtitles.py:8-65`` semantics)."""
    out: List[dict] = []
    for segment in segments:
        if len(segment["text"]) <= max_length:
            out.append(segment)
            continue

        meta_words = segment["words"]
        words = segment["text"].split() if use_space else [w["text"] for w in meta_words]
        if len(words) != len(meta_words):
            # punctuation may have been stripped from words; trust the words
            words = [w["text"] for w in meta_words]

        line = _LineBuilder(segment["start"], use_space)
        for i, (word, meta) in enumerate(zip(words, meta_words)):
            before = line.append(word)
            if len(line.buf) > max_length and before:
                if line.cut is not None:
                    out.append(line.flush_at_cut())
                else:
                    out.append({"text": before, "start": line.start,
                                "end": meta_words[i - 1]["end"]})
                    line.buf = word
                    line.start = meta["start"]
                    line.cut = None
            next_start = meta_words[i + 1]["start"] if i + 1 < len(meta_words) else None
            line.note_punctuation(meta["end"], next_start)

        if line.buf:
            out.append({"text": line.buf, "start": line.start, "end": segment["end"]})
    return out


def main(argv=None):
    supported_formats = ["srt", "vtt"]
    parser = argparse.ArgumentParser(
        description="Convert .words.json transcriptions to srt/vtt, cutting long segments",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("input", type=str, help="input json file, or input folder")
    parser.add_argument("output", type=str, help="output srt/vtt file, or output folder")
    parser.add_argument("--max_length", default=200, type=int,
                        help="maximum length of a segment in characters")
    parser.add_argument("--format", type=str, default="all",
                        choices=supported_formats + ["all"],
                        help="output format (when the output is a folder)")
    args = parser.parse_args(argv)

    if os.path.isdir(args.input) or not max(
        args.output.endswith(e) for e in supported_formats
    ):
        input_files = (
            [f for f in os.listdir(args.input) if f.endswith(".words.json")]
            if os.path.isdir(args.input)
            else [os.path.basename(args.input)]
        )
        extensions = [args.format] if args.format != "all" else ["srt", "vtt"]
        def stem(f):
            # reference behavior is a blind [:-11]; be graceful for inputs
            # that are json but not *.words.json (same result otherwise)
            return f[: -len(".words.json")] if f.endswith(".words.json") else os.path.splitext(f)[0]

        output_files = [
            [os.path.join(args.output, stem(f) + "." + e) for e in extensions]
            for f in input_files
        ]
        if os.path.isdir(args.input):
            input_files = [os.path.join(args.input, f) for f in input_files]
        else:
            input_files = [args.input]
        if not os.path.isdir(args.output):
            os.makedirs(args.output)
    else:
        input_files = [args.input]
        output_files = [[args.output]]
        outdir = os.path.dirname(args.output)
        if outdir and not os.path.isdir(outdir):
            os.makedirs(outdir)

    for fn, outputs in zip(input_files, output_files):
        with open(fn, "r", encoding="utf-8") as f:
            transcript = json.load(f)
        segments = transcript["segments"]
        if args.max_length:
            language = transcript["language"]
            use_space = language not in ["zh", "ja", "th", "lo", "my"]
            segments = split_long_segments(segments, args.max_length, use_space=use_space)
        for output in outputs:
            if output.endswith(".srt"):
                with open(output, "w", encoding="utf-8") as f:
                    write_srt(segments, file=f)
            elif output.endswith(".vtt"):
                with open(output, "w", encoding="utf-8") as f:
                    write_vtt(segments, file=f)
            else:
                raise RuntimeError(f"Unknown output format for {output}")


if __name__ == "__main__":
    main()
