"""Isolate the prompt-region cost: time decode_window with an empty prompt
(8-slot region) vs a full 224-token prompt (232-slot region) at the bench
geometry. Run on the real TPU:

    python benchmarks/profile_prompt_region.py

Also a canary for persistent-cache writes (JAX_EXPLAIN_CACHE_MISSES=1 makes
jax log WHY a write was skipped).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from whisper_timestamped_tpu.utils.compile_cache import enable_persistent_compile_cache
enable_persistent_compile_cache()  # env vars are frozen pre-script by sitecustomize; this works in-process
os.environ.setdefault("JAX_EXPLAIN_CACHE_MISSES", "true")

import numpy as np

from bench import GEOMETRIES, build_engine


def main():
    import jax.numpy as jnp

    from whisper_timestamped_tpu.audio import log_mel_spectrogram
    from whisper_timestamped_tpu.decoding import DecodingOptions

    model_name = os.environ.get("BENCH_MODEL", "large-v3")
    B = int(os.environ.get("BENCH_BATCH", "40"))
    n_tokens = int(os.environ.get("BENCH_TOKENS", "75"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    wm, tok, engine, dims = build_engine(model_name, kv_int8=True)

    rng = np.random.default_rng(0)
    prompt = rng.integers(400, 1900, 224).tolist()  # forces the 232 region

    def make_mel(seed):
        r = np.random.default_rng(seed)
        audio = (r.standard_normal(B * 30 * 16000) * 0.1).astype(np.float32)
        m = log_mel_spectrogram(audio.reshape(B, -1), n_mels=dims.n_mels)
        return jnp.pad(m, ((0, 0), (0, 0), (0, 3000 - m.shape[-1])))

    mels = [make_mel(i) for i in range(reps + 1)]
    opts = DecodingOptions(language="en", sample_len=n_tokens)

    resident_mb = int(os.environ.get("PROFILE_RESIDENT_MB", "0"))
    resident = None
    if resident_mb:
        # emulate the pipeline's resident device buffers (mel stack + attn)
        # to probe HBM-pressure effects on the decode program
        resident = jnp.zeros((resident_mb * 1024 * 1024 // 4,), jnp.float32)
        resident.block_until_ready()
        print(f"holding {resident_mb} MB resident", flush=True)

    for label, ptoks in (("region8_promptless", []), ("region232_prompted", prompt)):
        def run(mel):
            res = engine.decode_window(
                mel, opts, prompt_tokens=ptoks, fetch_alignment=False
            )
            # force host sync on small outputs only
            return [r.tokens[:4] for r in res]

        t0 = time.time()
        run(mels[-1])  # compile + warmup
        print(f"{label}: warmup {time.time() - t0:.1f}s", flush=True)
        times = []
        for rep in range(reps):
            t0 = time.time()
            run(mels[rep])
            times.append(time.time() - t0)
        print(f"{label}: times={[round(t, 2) for t in times]} "
              f"min={min(times):.2f}s", flush=True)


if __name__ == "__main__":
    main()
