#!/usr/bin/env python3
"""Batched multi-file pipeline on a device mesh (new capability vs the reference).

    python examples/batch_pipeline.py a.wav b.wav c.wav --model large-v3.pt --language en
"""

import argparse
import json
import os
import sys

# allow running straight from a repo checkout without installing
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import whisper_timestamped_tpu as wtt
from whisper_timestamped_tpu.api import _resolve_tokenizer
from whisper_timestamped_tpu.parallel.batch import transcribe_batch
from whisper_timestamped_tpu.parallel.mesh import get_mesh


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("audio", nargs="+")
    ap.add_argument("--model", required=True)
    ap.add_argument("--language", default=None,
                    help="omit for per-stream auto-detection")
    ap.add_argument("--tokenizer", default=None)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--tp", type=int, default=1, help="tensor-parallel degree")
    args = ap.parse_args()

    model = wtt.load_model(args.model)
    tok = _resolve_tokenizer(model, args.tokenizer, args.language, "transcribe")
    import jax

    mesh = get_mesh(tp=args.tp) if len(jax.devices()) > 1 else None
    results = transcribe_batch(
        model,
        {p: p for p in args.audio},
        tok,
        language=args.language,
        batch_size=args.batch_size,
        mesh=mesh,
    )
    json.dump(results, sys.stdout, indent=2, ensure_ascii=False)


if __name__ == "__main__":
    main()
