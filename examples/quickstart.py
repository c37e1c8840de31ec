#!/usr/bin/env python3
"""Quickstart: transcribe a file with word timestamps.

    python examples/quickstart.py audio.wav --model /path/to/large-v3.pt [--language fr]

The tokenizer vocabulary is discovered next to the checkpoint
(multilingual.tiktoken / gpt2.tiktoken / vocab.json) or passed via --tokenizer.
"""

import argparse
import json
import os
import sys

# allow running straight from a repo checkout without installing
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import whisper_timestamped_tpu as wtt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("audio")
    ap.add_argument("--model", required=True)
    ap.add_argument("--language", default=None)
    ap.add_argument("--tokenizer", default=None)
    ap.add_argument("--vad", default=False)
    args = ap.parse_args()

    model = wtt.load_model(args.model)
    result = wtt.transcribe_timestamped(
        model, args.audio, language=args.language, tokenizer=args.tokenizer, vad=args.vad
    )
    json.dump(result, sys.stdout, indent=2, ensure_ascii=False)


if __name__ == "__main__":
    main()
