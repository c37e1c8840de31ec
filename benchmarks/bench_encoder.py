"""Microbenchmark of the audio encoder's components at large-v3 geometry.

The pipeline profile (profile_breakdown.py) shows encoder+prefill ~= 763 ms of
a 2.2 s batch at B=24 — ~2.7x the bf16 compute roofline (~54 TFLOP at B=24 /
~197 TFLOP/s peak ~= 275 ms). This isolates where the gap lives: convs,
flash-attention sublayers, or MLP sublayers.

Run on the real TPU: python benchmarks/bench_encoder.py
Env: BENCH_MODEL, BENCH_BATCH, BENCH_REPS, BENCH_SECTIONS=convs,attn,mlp,full
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from whisper_timestamped_tpu.utils.compile_cache import enable_persistent_compile_cache
enable_persistent_compile_cache()  # env vars are frozen pre-script by sitecustomize; this works in-process

import numpy as np
import jax
import jax.numpy as jnp

from bench import GEOMETRIES
from whisper_timestamped_tpu.models.whisper_jax import (
    WhisperDims, _conv1d, _encoder_attention, _linear, _ln, cast_params,
    encode, init_params, sinusoids,
)


def timed(fn, arg_sets, probe=None):
    """Distinct inputs per rep (the tunnel memoizes identical-buffer runs);
    clock stops on a small host fetch (block_until_ready can return early)."""
    if probe is None:
        probe = lambda out: np.asarray(jax.tree.leaves(out)[0].ravel()[:4])
    out = fn(*arg_sets[-1])
    probe(out)
    ts = []
    for args in arg_sets[:-1]:
        t0 = time.time()
        out = fn(*args)
        probe(out)
        ts.append(time.time() - t0)
    return min(ts)


def main():
    model_name = os.environ.get("BENCH_MODEL", "large-v3")
    B = int(os.environ.get("BENCH_BATCH", "24"))
    reps = int(os.environ.get("BENCH_REPS", "4"))
    sections = os.environ.get("BENCH_SECTIONS", "convs,attn,mlp,full").split(",")

    dims = WhisperDims(n_audio_ctx=1500, n_text_ctx=448, **GEOMETRIES[model_name])
    params = cast_params(init_params(dims, jax.random.PRNGKey(0)), jnp.bfloat16)
    enc = params["encoder"]
    L, D, H, T = dims.n_audio_layer, dims.n_audio_state, dims.n_audio_head, dims.n_audio_ctx

    r = np.random.default_rng(0)

    def mk_mel(i):
        return jnp.asarray(
            (np.random.default_rng(i).standard_normal((B, dims.n_mels, 2 * T)) * 0.3)
            .astype(np.float32))

    def mk_x(i):
        return jnp.asarray(
            (np.random.default_rng(100 + i).standard_normal((B, T, D)) * 0.3)
            .astype(np.float32)).astype(jnp.bfloat16)

    mels = [mk_mel(i) for i in range(reps + 1)]
    xs = [mk_x(i) for i in range(reps + 1)]

    if "full" in sections:
        # params must be an ARGUMENT: closing over them inlines ~2 GB of
        # weights as HLO constants and overflows the remote compile service
        f = jax.jit(lambda p, m: encode(p, m, dims))
        t = timed(f, [(params, m) for m in mels])
        print(f"encode full       B={B}: {t*1e3:7.1f} ms", flush=True)

    if "convs" in sections:
        def convs(e, m):
            x = jnp.swapaxes(m, -1, -2).astype(jnp.bfloat16)
            x = jax.nn.gelu(_conv1d(x, e["conv1"], 1), approximate=False)
            x = jax.nn.gelu(_conv1d(x, e["conv2"], 2), approximate=False)
            return x + jnp.asarray(sinusoids(T, D)).astype(x.dtype)
        f = jax.jit(convs)
        t = timed(f, [(enc, m) for m in mels])
        print(f"convs+pos         B={B}: {t*1e3:7.1f} ms", flush=True)

    def one_block(x, bp):
        a = _encoder_attention(
            _linear(_ln(x, bp["attn_ln"]), bp["attn"]["q"]),
            _linear(_ln(x, bp["attn_ln"]), bp["attn"]["k"]),
            _linear(_ln(x, bp["attn_ln"]), bp["attn"]["v"]),
            H,
        )
        x = x + _linear(a, bp["attn"]["o"])
        h = jax.nn.gelu(_linear(_ln(x, bp["mlp_ln"]), bp["mlp"]["fc1"]), approximate=False)
        return x + _linear(h, bp["mlp"]["fc2"])

    if "attn" in sections:
        def attn_stack(blocks, x):
            def step(x, bp):
                a = _encoder_attention(
                    _linear(_ln(x, bp["attn_ln"]), bp["attn"]["q"]),
                    _linear(_ln(x, bp["attn_ln"]), bp["attn"]["k"]),
                    _linear(_ln(x, bp["attn_ln"]), bp["attn"]["v"]),
                    H,
                )
                return x + _linear(a, bp["attn"]["o"]), None
            return jax.lax.scan(step, x, blocks)[0]
        f = jax.jit(attn_stack)
        t = timed(f, [(enc["blocks"], x) for x in xs])
        print(f"attn sublayers x{L} B={B}: {t*1e3:7.1f} ms ({t/L*1e3:.2f} ms/layer)", flush=True)

    if "mlp" in sections:
        def mlp_stack(blocks, x):
            def step(x, bp):
                h = jax.nn.gelu(_linear(_ln(x, bp["mlp_ln"]), bp["mlp"]["fc1"]),
                                approximate=False)
                return x + _linear(h, bp["mlp"]["fc2"]), None
            return jax.lax.scan(step, x, blocks)[0]
        f = jax.jit(mlp_stack)
        t = timed(f, [(enc["blocks"], x) for x in xs])
        print(f"mlp sublayers x{L}  B={B}: {t*1e3:7.1f} ms ({t/L*1e3:.2f} ms/layer)", flush=True)


if __name__ == "__main__":
    main()
