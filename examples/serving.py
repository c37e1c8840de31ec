#!/usr/bin/env python3
"""Continuous serving loop: watch a directory, transcribe in pipelined batches.

    python examples/serving.py /path/in /path/out --model large-v3.pt \
        --batch_size 40 --language en

New .wav files dropped into IN_DIR are grouped into batches and fed through
``transcribe_batch_stream`` — batch k+1's audio upload + mel run on a worker
thread while batch k's windows decode on the TPU, so at steady state the
host→device transfer costs nothing. One .words.json per input lands in
OUT_DIR as each batch completes. Ctrl-C to stop.

(The reference has no serving story — strictly one file at a time,
``transcribe.py:3129``; this loop is the TPU-native replacement for running
N wrapper processes against N GPUs.)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import whisper_timestamped_tpu as wtt
from whisper_timestamped_tpu.api import _resolve_tokenizer
from whisper_timestamped_tpu.decoding import DecodingOptions
from whisper_timestamped_tpu.engine import DecodeEngine
from whisper_timestamped_tpu.parallel.batch import transcribe_batch_stream


def watch_batches(in_dir, done, batch_size, poll_s=1.0):
    """Yield {name: path} batches as files appear; block while idle."""
    while True:
        fresh = sorted(
            p for p in os.listdir(in_dir)
            if p.lower().endswith(".wav") and p not in done
        )
        if not fresh:
            time.sleep(poll_s)
            continue
        for i in range(0, len(fresh), batch_size):
            group = fresh[i : i + batch_size]
            done.update(group)
            yield {name: os.path.join(in_dir, name) for name in group}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("in_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--model", required=True)
    ap.add_argument("--tokenizer", default=None)
    ap.add_argument("--language", default=None)
    ap.add_argument("--batch_size", type=int, default=40)
    ap.add_argument("--kv_int8", action="store_true", default=True,
                    help="int8 cross-KV (the serving default: 2x KV capacity)")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    model = wtt.load_model(args.model)
    tok = _resolve_tokenizer(model, args.tokenizer, args.language, "transcribe")
    engine = DecodeEngine(model, tok, kv_int8=args.kv_int8)

    done = set()
    batches = watch_batches(args.in_dir, done, args.batch_size)
    t0 = time.time()
    n_files = 0
    for results in transcribe_batch_stream(
        model, batches, tok,
        engine=engine,
        language=args.language,
        batch_size=args.batch_size,
        temperature=[0.0],
        decode_options=DecodingOptions(language=args.language),
    ):
        for name, res in results.items():
            out = os.path.join(args.out_dir, name + ".words.json")
            with open(out, "w", encoding="utf-8") as f:
                json.dump(res, f, indent=2, ensure_ascii=False)
        n_files += len(results)
        print(f"[{time.time() - t0:8.1f}s] {n_files} files done "
              f"(last batch: {sorted(results)})", flush=True)


if __name__ == "__main__":
    main()
