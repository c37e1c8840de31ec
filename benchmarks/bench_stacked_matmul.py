"""Does the decode-step layer scan pay for per-layer WEIGHT slice copies?

Three variants of a pure weight-streaming decode loop (75 steps x 32 layers x
the 8 per-block matmuls at large-v3 geometry, B=24):

  A. scan with the stacked weights as xs (the current decode_step form)
  B. scan over the layer index only; matmuls via the scalar-prefetch Pallas
     stacked_matmul kernel reading tiles at the layer offset
  C. scan over the layer index only; weights closed over, XLA dynamic_slice

HBM floor per step: 8 matrices * 46 MB = 1.5 GB of weights -> ~1.8 ms at
819 GB/s. If A ~= floor, XLA already avoids the copy and the kernel is moot.

Run on TPU: python -u benchmarks/bench_stacked_matmul.py
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
from jax import lax

from whisper_timestamped_tpu.ops.pallas_kernels import stacked_matmul_pallas

L = int(os.environ.get("SMM_L", "32"))
D = int(os.environ.get("SMM_D", "1280"))
F = 4 * D
B = int(os.environ.get("SMM_B", "24"))
STEPS = int(os.environ.get("SMM_STEPS", "75"))


def make_weights(key):
    ks = jax.random.split(key, 8)
    s = D**-0.5
    w = {
        "q": jax.random.normal(ks[0], (L, D, D), jnp.bfloat16) * s,
        "k": jax.random.normal(ks[1], (L, D, D), jnp.bfloat16) * s,
        "v": jax.random.normal(ks[2], (L, D, D), jnp.bfloat16) * s,
        "o": jax.random.normal(ks[3], (L, D, D), jnp.bfloat16) * s,
        "cq": jax.random.normal(ks[4], (L, D, D), jnp.bfloat16) * s,
        "co": jax.random.normal(ks[5], (L, D, D), jnp.bfloat16) * s,
        "fc1": jax.random.normal(ks[6], (L, D, F), jnp.bfloat16) * s,
        "fc2": jax.random.normal(ks[7], (L, F, D), jnp.bfloat16) * (F**-0.5),
    }
    return w


def block_math(x, wq, wk, wv, wo, wcq, wco, wfc1, wfc2):
    a = x @ wq + x @ wk + x @ wv
    x = x + (a @ wo) * 0.02
    x = x + ((x @ wcq) @ wco) * 0.02
    h = jax.nn.gelu(x @ wfc1, approximate=False)
    x = x + (h @ wfc2) * 0.02
    return x


@jax.jit
def run_scan_xs(w, x0):
    def step(x, _):
        def layer(xc, wl):
            return block_math(xc, wl["q"], wl["k"], wl["v"], wl["o"],
                              wl["cq"], wl["co"], wl["fc1"], wl["fc2"]), None

        x, _ = lax.scan(layer, x, w)
        return x, None

    x, _ = lax.scan(step, x0, None, length=STEPS)
    return x


@jax.jit
def run_pallas(w, x0):
    def step(x, _):
        def layer(xc, l):
            mm = lambda a, wa: stacked_matmul_pallas(l, a, wa)
            a = mm(xc, w["q"]) + mm(xc, w["k"]) + mm(xc, w["v"])
            xc = xc + mm(a, w["o"]) * 0.02
            xc = xc + mm(mm(xc, w["cq"]), w["co"]) * 0.02
            h = jax.nn.gelu(mm(xc, w["fc1"]), approximate=False)
            xc = xc + mm(h, w["fc2"]) * 0.02
            return xc, None

        x, _ = lax.scan(layer, x, jnp.arange(L))
        return x, None

    x, _ = lax.scan(step, x0, None, length=STEPS)
    return x


@jax.jit
def run_dynslice(w, x0):
    def step(x, _):
        def layer(xc, l):
            wl = {k: lax.dynamic_index_in_dim(v, l, 0, keepdims=False)
                  for k, v in w.items()}
            return block_math(xc, wl["q"], wl["k"], wl["v"], wl["o"],
                              wl["cq"], wl["co"], wl["fc1"], wl["fc2"]), None

        x, _ = lax.scan(layer, x, jnp.arange(L))
        return x, None

    x, _ = lax.scan(step, x0, None, length=STEPS)
    return x


def main():
    key = jax.random.PRNGKey(0)
    w = make_weights(key)
    bytes_per_step = sum(int(v.nbytes) for v in w.values())
    print(f"L={L} D={D} B={B} steps={STEPS}; weights {bytes_per_step/1e9:.2f} GB/step"
          f" -> floor ~{bytes_per_step/819e9*1e3:.2f} ms/step", flush=True)

    xs = [jax.random.normal(jax.random.PRNGKey(10 + i), (B, D), jnp.bfloat16)
          for i in range(4)]

    for name, fn in [("A scan-xs", run_scan_xs), ("B pallas", run_pallas),
                     ("C dynslice", run_dynslice)]:
        try:
            # sync by fetching the (small) result: through the TPU tunnel,
            # block_until_ready returns at dispatch, not completion
            np.asarray(fn(w, xs[-1]))  # compile
            ts = []
            for x0 in xs[:-1]:
                t0 = time.time()
                np.asarray(fn(w, x0))
                ts.append(time.time() - t0)
            best = min(ts)
            print(f"{name}: {best*1e3:.1f} ms total, {best/STEPS*1e3:.2f} ms/step"
                  f" ({bytes_per_step/(best/STEPS)/1e9:.0f} GB/s effective)", flush=True)
        except Exception as e:  # keep other variants running
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    # numeric agreement (loose: bf16 matmul order differs)
    ya = run_scan_xs(w, xs[0])
    yb = run_pallas(w, xs[0])
    err = float(jnp.max(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ya.astype(jnp.float32)))) + 1e-9
    print(f"max |A-B| = {err:.4g} (rel {err/scale:.3g})", flush=True)


if __name__ == "__main__":
    main()
