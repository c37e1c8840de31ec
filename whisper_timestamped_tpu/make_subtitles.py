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
import string
from typing import List

from .writers import write_srt, write_vtt

_punctuation = (
    "".join(c for c in string.punctuation if c not in ["-", "'"]) + "。，！？：”、…"
)


def split_long_segments(segments: List[dict], max_length: int, use_space: bool = True) -> List[dict]:
    new_segments = []
    for segment in segments:
        text = segment["text"]
        if len(text) <= max_length:
            new_segments.append(segment)
            continue
        meta_words = segment["words"]
        if use_space:
            words = text.split()
        else:
            words = [w["text"] for w in meta_words]
        if len(words) != len(meta_words):
            # punctuation may have been removed from words; fall back to them
            words = [w["text"] for w in meta_words]
        current_text = ""
        current_start = segment["start"]
        current_best_idx = None
        current_best_end = None
        current_best_next_start = None
        for i, (word, meta) in enumerate(zip(words, meta_words)):
            current_text_before = current_text
            if current_text and use_space:
                current_text += " "
            current_text += word

            if len(current_text) > max_length and len(current_text_before):
                start = current_start
                if current_best_idx is not None:
                    text_out = current_text[:current_best_idx]
                    end = current_best_end
                    current_text = current_text[current_best_idx + 1 :]
                    current_start = current_best_next_start
                else:
                    text_out = current_text_before
                    end = meta_words[i - 1]["end"]
                    current_text = word
                    current_start = meta["start"]
                current_best_idx = None
                current_best_end = None
                current_best_next_start = None
                new_segments.append({"text": text_out, "start": start, "end": end})

            # prefer to cut right after punctuation
            if current_text and current_text[-1] in _punctuation:
                current_best_idx = len(current_text)
                current_best_end = meta["end"]
                current_best_next_start = (
                    meta_words[i + 1]["start"] if i + 1 < len(meta_words) else None
                )

        if len(current_text):
            new_segments.append(
                {"text": current_text, "start": current_start, "end": segment["end"]}
            )
    return new_segments


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
        output_files = [
            [os.path.join(args.output, f[: -len(".words.json")] + "." + e) for e in extensions]
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
