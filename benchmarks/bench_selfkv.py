"""A/B microbench: prompted window decode with bf16 vs int8 self-KV cache.

The e2e pipeline's conditioned windows run with the full 232-slot prompt
region, so the self-KV cache is ~312 slots — at large-v3 B=40 a ~4 GB/step
bf16 read (second only to the cross-KV). The int8 self-KV cache halves it.
The pipeline metric can't isolate this (quantization changes token
trajectories on synthetic audio, which changes the window count), so this
bench pins the trajectory cost out: same prompt shape, same token budget,
distinct mels per rep, min-of-reps.

Run on the real TPU: python benchmarks/bench_selfkv.py
Env: BENCH_MODEL, BENCH_BATCH, BENCH_TOKENS, BENCH_REPS.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from whisper_timestamped_tpu.utils.compile_cache import enable_persistent_compile_cache
enable_persistent_compile_cache()  # env vars are frozen pre-script by sitecustomize; this works in-process

import numpy as np
import jax.numpy as jnp

from bench import build_engine
from whisper_timestamped_tpu.audio import log_mel_spectrogram
from whisper_timestamped_tpu.decoding import DecodingOptions
from whisper_timestamped_tpu.engine import DecodeEngine


def main():
    model_name = os.environ.get("BENCH_MODEL", "large-v3")
    B = int(os.environ.get("BENCH_BATCH", "40"))
    n_tokens = int(os.environ.get("BENCH_TOKENS", "75"))
    reps = int(os.environ.get("BENCH_REPS", "4"))

    wm, tok, engine, dims = build_engine(model_name, kv_int8=True)

    def make_mel(seed):
        r = np.random.default_rng(seed)
        audio = (r.standard_normal(B * 30 * 16000) * 0.1).astype(np.float32)
        m = log_mel_spectrogram(audio.reshape(B, -1), n_mels=dims.n_mels)
        return jnp.pad(m, ((0, 0), (0, 0), (0, 3000 - m.shape[-1])))

    mels = [make_mel(i) for i in range(reps + 1)]
    opts = DecodingOptions(language="en", sample_len=n_tokens)
    # a long previous-text prompt forces the 232-slot region (the pipeline's
    # conditioned-window configuration)
    prompt = list(np.random.default_rng(0).integers(400, 2000, 150))

    for self8 in (False, True):
        eng = DecodeEngine(
            wm, tok, attn_dtype=jnp.bfloat16, kv_int8=True, self_kv_int8=self8
        )
        eng.decode_window(mels[-1], opts, prompt_tokens=prompt,
                          fetch_alignment=False)  # compile + warmup
        ts = []
        for rep in range(reps):
            t0 = time.time()
            res = eng.decode_window(mels[rep], opts, prompt_tokens=prompt,
                                    fetch_alignment=False)
            ts.append(time.time() - t0)
            assert res[0].tokens is not None
        best = min(ts)
        print(
            f"self_kv_int8={int(self8)}: window={best*1e3:.0f} ms "
            f"({best*1e3/n_tokens:.2f} ms/token upper bound) "
            f"reps={[round(t, 3) for t in ts]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
