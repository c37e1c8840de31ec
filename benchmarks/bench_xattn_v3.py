"""A/B the stacked cross-attention kernels at the serving shape:
int8 v2 (VPU weighted-V tail) vs int8 v3 (MXU weighted-V tail) vs int4
(nibble-packed, half the bytes), per block_t.

32 chained layer-calls per measurement (single-op timings through the axon
tunnel are swamped by the ~30 ms round-trip floor), distinct buffers per rep,
clock stopped on a host fetch. The per-layer time at the serving shape
(L=32, B=40, T=1500, D=1280, H=20) multiplies by 32 layers x 75 steps x 7
windows in every bench rep, so 0.1 ms/layer here is ~1.7 s per pipeline rep.

Run on the real TPU: python benchmarks/bench_xattn_v3.py
Env: XB_BATCH, XB_BLOCKT (comma list), XB_REPS, XB_VARIANTS (comma list).
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


def main():
    from whisper_timestamped_tpu.models.whisper_jax import _quantize_rows
    from whisper_timestamped_tpu.ops import pallas_kernels as pk

    L, T, D, H = 32, 1500, 1280, 20
    B = int(os.environ.get("XB_BATCH", "40"))
    reps = int(os.environ.get("XB_REPS", "4"))
    block_ts = [int(x) for x in os.environ.get("XB_BLOCKT", "512").split(",")]
    variants = os.environ.get("XB_VARIANTS", "v2,v3").split(",")
    par_b = os.environ.get("XB_PAR") == "1"  # mark batch grid dim parallel
    vmem_mb = int(os.environ.get("XB_VMEM", "0"))  # raise Mosaic VMEM budget
    # ~30% of layers carry alignment heads in large-v3; flag half on to
    # approximate the real score-emission mix
    gb_step = 2 * L * B * T * D / 1e9  # int8 K+V bytes per 32-layer sweep
    gb_step_i4 = gb_step / 2  # nibble-packed K+V

    del _quantize_rows  # int8 content is generated directly (a full-size f32
    # intermediate would overflow HBM: (L,B,T,D) f32 is ~9.8 GB at B=40)

    r = np.random.default_rng(0)
    qs = [
        jnp.asarray(np.random.default_rng(100 + i).standard_normal((B, 1, D))
                    .astype(np.float32) * 0.1, jnp.bfloat16)
        for i in range(reps + 1)
    ]

    def make_kv(seed):
        rr = np.random.default_rng(seed)
        k8 = jnp.asarray(rr.integers(-127, 128, (L, B, T, D), np.int8))
        v8 = jnp.asarray(rr.integers(-127, 128, (L, B, T, D), np.int8))
        ks = jnp.asarray(rr.uniform(0.001, 0.01, (L, B, T)).astype(np.float32))
        vs = jnp.asarray(rr.uniform(0.001, 0.01, (L, B, T)).astype(np.float32))
        return tuple(jax.block_until_ready(x) for x in (k8, ks, v8, vs))

    def make_kv_i4(seed):
        rr = np.random.default_rng(seed)
        k4 = jnp.asarray(rr.integers(-128, 128, (L, B, T // 2, D), np.int8))
        v4 = jnp.asarray(rr.integers(-128, 128, (L, B, T // 2, D), np.int8))
        ks = jnp.asarray(rr.uniform(0.001, 0.01, (L, B, T)).astype(np.float32))
        vs = jnp.asarray(rr.uniform(0.001, 0.01, (L, B, T)).astype(np.float32))
        return tuple(jax.block_until_ready(x) for x in (k4, ks, v4, vs))

    # two resident KV sets (one is ~4.9 GB; five would overflow HBM) —
    # alternating sets + a distinct q per rep keeps every call's argument
    # tuple unique, defeating the tunnel's execution memoization
    want_i8 = any(v in ("v2", "v3") for v in variants)
    kvs = [make_kv(0), make_kv(1)] if want_i8 else None
    kvs_i4 = [make_kv_i4(2), make_kv_i4(3)] if "i4" in variants else None

    fns = {
        "v2": pk.cross_attention_stacked_int8_pallas_v2,
        "v3": pk.cross_attention_stacked_int8_pallas_v3,
        "i4": pk.cross_attention_stacked_int4_pallas,
    }

    for name in variants:
        fn = fns[name]
        sets = kvs_i4 if name == "i4" else kvs
        gb = gb_step_i4 if name == "i4" else gb_step
        for bt in block_ts:

            @functools.partial(jax.jit, static_argnames=())
            def sweep(q, k8, ks, v8, vs, _fn=fn, _bt=bt):
                def body(carry, l):
                    out, _ = _fn(
                        l, carry, k8, ks, v8, vs, H, block_t=_bt,
                        score_flag=(l % 3 == 0).astype(jnp.int32),
                        emit_scores=True,
                        parallel_b=par_b, vmem_limit_mb=vmem_mb,
                    )
                    # chain: serialize the layer calls
                    return (carry + out.astype(carry.dtype)), None

                q2, _ = jax.lax.scan(body, q, jnp.arange(L, dtype=jnp.int32))
                return q2

            out = sweep(qs[-1], *sets[0])
            np.asarray(out)  # warmup + compile
            ts = []
            for i in range(reps):
                t0 = time.time()
                out = sweep(qs[i], *sets[i % 2])
                np.asarray(out)
                ts.append(time.time() - t0)
            best = min(ts)
            tag = f"{name}{' par' if par_b else ''}{f' vmem{vmem_mb}' if vmem_mb else ''}"
            print(
                f"{tag} block_t={bt}: {best*1e3:7.2f} ms / 32-layer sweep "
                f"({best*1e3/L:6.3f} ms/layer, {gb/best:5.0f} GB/s eff; "
                f"times={[round(t*1e3,1) for t in ts]})",
                flush=True,
            )


if __name__ == "__main__":
    main()
