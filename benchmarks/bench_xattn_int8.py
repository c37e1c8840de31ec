"""Microbenchmark: single-query cross-attention variants at large-v3 geometry.

Compares, per decode-step-equivalent (32 layers):
  - bf16 XLA attention (the default path)
  - int8 Pallas, head-pair grid (strided 128-byte DMA rows)
  - int8 Pallas, row-major grid (one contiguous (T, D) block per program)

Tunnel-honest timing: distinct input buffers per rep + host fetch of outputs.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from whisper_timestamped_tpu.utils.compile_cache import enable_persistent_compile_cache
enable_persistent_compile_cache()  # env vars are frozen pre-script by sitecustomize; this works in-process

import numpy as np
import jax
import jax.numpy as jnp

from whisper_timestamped_tpu.models.whisper_jax import _attention
from whisper_timestamped_tpu.ops.pallas_kernels import (
    cross_attention_int8_pallas,
    cross_attention_int8_rowmajor,
)

B, T, D, H, L = 12, 1500, 1280, 20, 32
REPS = 5


def make_inputs(seed):
    r = np.random.default_rng(seed)
    q = jnp.asarray(r.standard_normal((B, 1, D)).astype(np.float32), jnp.bfloat16)
    k8 = jnp.asarray(r.integers(-127, 127, (B, T, D)), jnp.int8)
    v8 = jnp.asarray(r.integers(-127, 127, (B, T, D)), jnp.int8)
    ks = jnp.asarray(r.random((B, T)).astype(np.float32) * 0.01)
    vs = jnp.asarray(r.random((B, T)).astype(np.float32) * 0.01)
    kb = jnp.asarray(r.standard_normal((B, T, D)).astype(np.float32), jnp.bfloat16)
    vb = jnp.asarray(r.standard_normal((B, T, D)).astype(np.float32), jnp.bfloat16)
    return q, k8, v8, ks, vs, kb, vb


def bf16_l(length):
    # q is carry-dependent so XLA cannot hoist the (loop-invariant-k/v)
    # attention out of the scan — each iteration re-reads K/V from HBM,
    # exactly like the real decode step
    @functools.partial(jax.jit, static_argnames=())
    def run(q, k, v):
        def body(q, _):
            o, s = _attention(q, k, v, H, return_scores=True)
            return o + jnp.bfloat16(1e-3), s[:, 0, 0, ::500]

        q, ss = jax.lax.scan(body, q, None, length=length)
        return q.astype(jnp.float32).sum() + ss.sum()

    return run


def int8_l(fn, length):
    @functools.partial(jax.jit, static_argnames=())
    def run(q, k8, ks, v8, vs):
        def body(q, _):
            o, s = fn(q, k8, ks, v8, vs, H)
            return o + jnp.bfloat16(1e-3), s[:, 0, 0, ::500]

        q, ss = jax.lax.scan(body, q, None, length=length)
        return q.astype(jnp.float32).sum() + ss.sum()

    return run


def timeit(name, make_fn, argsets):
    L1, L2 = 32, 160
    res = {}
    for length in (L1, L2):
        fn = make_fn(length)
        fn(*argsets[-1]).block_until_ready()
        times = []
        for rep in range(REPS):
            t0 = time.time()
            np.asarray(fn(*argsets[rep]))
            times.append(time.time() - t0)
        res[length] = min(times)
    per_layer = (res[L2] - res[L1]) / (L2 - L1)
    print(
        f"{name:28s} L{L1}={res[L1]*1e3:7.2f} ms  L{L2}={res[L2]*1e3:7.2f} ms"
        f"   -> {per_layer*1e6:7.1f} us/layer  ({per_layer*32*1e3:6.2f} ms / 32-layer step)"
    )


def main():
    argsets = [make_inputs(i) for i in range(REPS + 1)]
    bf16_args = [(a[0], a[5], a[6]) for a in argsets]
    i8_args = [(a[0], a[1], a[3], a[2], a[4]) for a in argsets]
    timeit("bf16 XLA", bf16_l, bf16_args)
    timeit("int8 pallas head-pair grid",
           lambda L: int8_l(cross_attention_int8_pallas, L), i8_args)
    timeit("int8 pallas row-major grid",
           lambda L: int8_l(cross_attention_int8_rowmajor, L), i8_args)


if __name__ == "__main__":
    main()
