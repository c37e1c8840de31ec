"""Real-chip numeric validation of the Pallas decode kernels.

The unit tests exercise every kernel in interpret mode on CPU; this script
compiles them under real Mosaic on the TPU and cross-checks against the XLA
math paths at small shapes — run it after kernel changes before trusting a
benchmark number. Prints one line per check with the max abs diff.

Usage: PYTHONPATH=/root/.axon_site python benchmarks/validate_tpu_kernels.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from whisper_timestamped_tpu.utils.compile_cache import enable_persistent_compile_cache
enable_persistent_compile_cache()  # env vars are frozen pre-script by sitecustomize; this works in-process

import numpy as np
import jax

if os.environ.get("VALIDATE_BACKEND") == "cpu":
    # dry-run mode (interpret kernels): the image's sitecustomize overrides
    # JAX_PLATFORMS, so force through jax.config before backend init
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def check(name, got, want, atol):
    got, want = np.asarray(got, np.float32), np.asarray(want, np.float32)
    diff = float(np.abs(got - want).max())
    status = "OK " if diff <= atol else "FAIL"
    print(f"{status} {name}: max|diff|={diff:.2e} (atol {atol})")
    return diff <= atol


def main():
    from whisper_timestamped_tpu.models.whisper_jax import (
        _attention,
        _prefill_flash_attention,
        _quantize_rows,
        _quantize_rows_int4,
        _unpack_int4_rows,
        cross_attention,
    )
    from whisper_timestamped_tpu.ops.pallas_kernels import (
        cross_attention_stacked_int4_pallas,
        cross_attention_stacked_int8_pallas_v2,
        cross_attention_stacked_pallas_v2,
        self_attention_stacked_int8_pallas,
        self_attention_stacked_pallas,
    )

    print(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    ok = True
    L, B, T, D, H = 3, 2, 300, 256, 4
    r = np.random.default_rng(0)
    q = jnp.asarray(r.standard_normal((B, 1, D)).astype(np.float32))
    xk = jnp.asarray(r.standard_normal((L, B, T, D)).astype(np.float32))
    xv = jnp.asarray(r.standard_normal((L, B, T, D)).astype(np.float32))

    # bf16 v2 stacked cross-attention
    o1, s1 = cross_attention_stacked_pallas_v2(
        1, q.astype(jnp.bfloat16), xk.astype(jnp.bfloat16),
        xv.astype(jnp.bfloat16), H, block_t=128, interpret=None,
    )
    o2, s2 = _attention(
        q.astype(jnp.bfloat16), xk[1].astype(jnp.bfloat16),
        xv[1].astype(jnp.bfloat16), H, return_scores=True,
    )
    ok &= check("xattn_stacked_v2 out", o1, o2, 2e-2)
    ok &= check("xattn_stacked_v2 scores", s1, s2, 5e-2)

    # int8 v2
    k8, ks = _quantize_rows(xk)
    v8, vs = _quantize_rows(xv)
    o1, s1 = cross_attention_stacked_int8_pallas_v2(
        1, q, k8, ks, v8, vs, H, block_t=128, interpret=None
    )
    o2, s2 = cross_attention(
        q, k8[1], xv=v8[1], xk_scale=ks[1], xv_scale=vs[1], n_head=H,
        allow_pallas=False,
    )
    ok &= check("xattn_stacked_int8_v2 out", o1, o2, 3e-2)
    ok &= check("xattn_stacked_int8_v2 scores", s1, s2, 5e-2)

    # int8 v3 (MXU weighted-V tail)
    from whisper_timestamped_tpu.ops.pallas_kernels import (
        cross_attention_stacked_int8_pallas_v3,
    )

    o3, s3 = cross_attention_stacked_int8_pallas_v3(
        1, q, k8, ks, v8, vs, H, block_t=128, interpret=None
    )
    ok &= check("xattn_stacked_int8_v3 out", o3, o2, 3e-2)
    ok &= check("xattn_stacked_int8_v3 scores", s3, s2, 5e-2)

    # int8 v4 (all-s8 MXU dots; q/p 8-bit rounded)
    from whisper_timestamped_tpu.ops.pallas_kernels import (
        cross_attention_stacked_int8_pallas_v4,
    )

    o4, s4 = cross_attention_stacked_int8_pallas_v4(
        1, q, k8, ks, v8, vs, H, block_t=128, interpret=None
    )
    ok &= check("xattn_stacked_int8_v4 out", o4, o2, 3e-2)
    ok &= check("xattn_stacked_int8_v4 scores", s4, s2, 5e-2)

    # int4 (nibble-packed): oracle = XLA int8 path on the unpacked values
    from whisper_timestamped_tpu.models.whisper_jax import (
        _int4_scales_frame_order,
    )

    k4, ks4 = _quantize_rows_int4(xk)
    v4, vs4 = _quantize_rows_int4(xv)
    k8u, v8u = _unpack_int4_rows(k4), _unpack_int4_rows(v4)
    ks4f, vs4f = _int4_scales_frame_order(ks4), _int4_scales_frame_order(vs4)
    o1, s1 = cross_attention_stacked_int4_pallas(
        1, q, k4, ks4, v4, vs4, H, block_t=128, interpret=None
    )
    o2, s2 = cross_attention(
        q, k8u[1], xv=v8u[1], xk_scale=ks4f[1], xv_scale=vs4f[1], n_head=H,
        allow_pallas=False,
    )
    ok &= check("xattn_stacked_int4 out", o1, o2, 3e-2)
    ok &= check("xattn_stacked_int4 scores", s1, s2, 5e-2)
    o1_s8, s1_s8 = cross_attention_stacked_int4_pallas(
        1, q, k4, ks4, v4, vs4, H, block_t=128, interpret=None, use_s8=True
    )
    ok &= check("xattn_stacked_int4_s8 out", o1_s8, o2, 4e-2)
    ok &= check("xattn_stacked_int4_s8 scores", s1_s8, s2, 5e-2)
    # score gating leaves the output untouched (compare against the SAME
    # kernel variant: an earlier revision reused o1 for the s8 output and
    # compared the gated non-s8 run against the s8 one — a guaranteed 5e-3
    # "failure" that was really a variable clobber, not a kernel defect)
    o3, _ = cross_attention_stacked_int4_pallas(
        1, q, k4, ks4, v4, vs4, H, block_t=128,
        score_flag=jnp.int32(0), interpret=None,
    )
    ok &= check("xattn_stacked_int4 gated out", o3, o1, 1e-5)

    # stacked self-attention, bf16 + int8, with the [pad, pos] mask
    ctx = 64
    pos = jnp.int32(40)
    pad = jnp.asarray([0, 5], jnp.int32)
    kc = jnp.asarray(r.standard_normal((L, B, ctx, D)).astype(np.float32))
    vc = jnp.asarray(r.standard_normal((L, B, ctx, D)).astype(np.float32))
    slots = np.arange(ctx)
    valid = (slots[None, :] <= 40) & (
        (slots[None, :] >= np.asarray(pad)[:, None]) | (slots[None, :] == 40)
    )
    mask = jnp.asarray(np.where(valid, 0.0, -np.inf).astype(np.float32))[:, None, None]
    o1 = self_attention_stacked_pallas(
        1, q.astype(jnp.bfloat16), kc.astype(jnp.bfloat16),
        vc.astype(jnp.bfloat16), pos, pad, H, interpret=None,
    )
    o2, _ = _attention(
        q.astype(jnp.bfloat16), kc[1].astype(jnp.bfloat16),
        vc[1].astype(jnp.bfloat16), H, mask=mask,
    )
    ok &= check("self_stacked out", o1, o2, 2e-2)

    kq, kqs = _quantize_rows(kc)
    vq, vqs = _quantize_rows(vc)
    o1 = self_attention_stacked_int8_pallas(
        1, q, kq, kqs, vq, vqs, pos, pad, H, interpret=None
    )
    kd = kq[1].astype(jnp.float32) * kqs[1][..., None]
    vd = vq[1].astype(jnp.float32) * vqs[1][..., None]
    o2, _ = _attention(q, kd, vd, H, mask=mask)
    ok &= check("self_stacked_int8 out", o1, o2, 3e-2)

    # flash prefill (left-pad causal self + cross)
    P = 32
    qp = jnp.asarray(r.standard_normal((B, P, D)).astype(np.float32))
    kp = jnp.asarray(r.standard_normal((B, P, D)).astype(np.float32))
    vp = jnp.asarray(r.standard_normal((B, P, D)).astype(np.float32))
    pad_len = jnp.asarray([0, 7], jnp.int32)
    slots = np.arange(P)
    valid = (slots[None, None, :] >= np.asarray(pad_len)[:, None, None]) & (
        slots[None, None, :] <= slots[None, :, None]
    )
    valid |= slots[None, :, None] == slots[None, None, :]
    fmask = jnp.asarray(np.where(valid, 0.0, -np.inf).astype(np.float32))[:, None]
    if jax.default_backend() == "tpu":
        f = _prefill_flash_attention(qp, kp, vp, H, pad_len=pad_len, causal=True)
        fc = _prefill_flash_attention(qp, xk[0], xv[0], H)
    else:
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            f = _prefill_flash_attention(qp, kp, vp, H, pad_len=pad_len, causal=True)
            fc = _prefill_flash_attention(qp, xk[0], xv[0], H)
    u, _ = _attention(qp, kp, vp, H, mask=fmask)
    f, u = np.asarray(f), np.asarray(u)
    live = max(
        float(np.abs(f[b, int(pad_len[b]):] - u[b, int(pad_len[b]):]).max())
        for b in range(B)
    )
    status = "OK " if live <= 2e-2 else "FAIL"
    print(f"{status} prefill_flash self (live rows): max|diff|={live:.2e}")
    ok &= live <= 2e-2
    uc, _ = _attention(qp, xk[0], xv[0], H)
    ok &= check("prefill_flash cross", fc, uc, 2e-2)

    # production geometry (large-v3 decode shapes) with the single-tile
    # whole-context config (block_t=1536 needs the raised VMEM budget) —
    # the small-T checks above collapse to one tile for every block_t, so
    # they never exercise the config the serving default actually runs
    if os.environ.get("VALIDATE_BIG", "1") == "1":
        Tb, Db, Hb = 1500, 1280, 20
        qb = jnp.asarray(r.standard_normal((2, 1, Db)).astype(np.float32))
        xkb = jnp.asarray(
            (r.standard_normal((2, 2, Tb, Db)) * 0.5).astype(np.float32)
        )
        xvb = jnp.asarray(
            (r.standard_normal((2, 2, Tb, Db)) * 0.5).astype(np.float32)
        )
        o1, s1 = cross_attention_stacked_pallas_v2(
            1, qb.astype(jnp.bfloat16), xkb.astype(jnp.bfloat16),
            xvb.astype(jnp.bfloat16), Hb, block_t=1536, vmem_limit_mb=64,
            interpret=None,
        )
        o2, s2 = _attention(
            qb.astype(jnp.bfloat16), xkb[1].astype(jnp.bfloat16),
            xvb[1].astype(jnp.bfloat16), Hb, return_scores=True,
        )
        ok &= check("xattn_bf16_v2 T=1500 bt=1536 out", o1, o2, 2e-2)
        ok &= check("xattn_bf16_v2 T=1500 bt=1536 scores", s1, s2, 5e-2)

        k8b, ksb = _quantize_rows(xkb)
        v8b, vsb = _quantize_rows(xvb)
        o1, s1 = cross_attention_stacked_int8_pallas_v2(
            1, qb, k8b, ksb, v8b, vsb, Hb, block_t=1536, vmem_limit_mb=64,
            interpret=None,
        )
        o2, s2 = cross_attention(
            qb, k8b[1], xv=v8b[1], xk_scale=ksb[1], xv_scale=vsb[1],
            n_head=Hb, allow_pallas=False,
        )
        ok &= check("xattn_int8_v2 T=1500 bt=1536 out", o1, o2, 3e-2)
        ok &= check("xattn_int8_v2 T=1500 bt=1536 scores", s1, s2, 5e-2)

        o1, s1 = cross_attention_stacked_int8_pallas_v4(
            1, qb, k8b, ksb, v8b, vsb, Hb, block_t=1536, vmem_limit_mb=64,
            interpret=None,
        )
        ok &= check("xattn_int8_v4 T=1500 bt=1536 out", o1, o2, 3e-2)
        ok &= check("xattn_int8_v4 T=1500 bt=1536 scores", s1, s2, 5e-2)

        k4b, ks4b = _quantize_rows_int4(xkb)
        v4b, vs4b = _quantize_rows_int4(xvb)
        o1, s1 = cross_attention_stacked_int4_pallas(
            1, qb, k4b, ks4b, v4b, vs4b, Hb, block_t=1536, vmem_limit_mb=64,
            interpret=None,
        )
        k8u, v8u = _unpack_int4_rows(k4b), _unpack_int4_rows(v4b)
        o2, s2 = cross_attention(
            qb, k8u[1], xv=v8u[1], xk_scale=_int4_scales_frame_order(ks4b)[1],
            xv_scale=_int4_scales_frame_order(vs4b)[1], n_head=Hb,
            allow_pallas=False,
        )
        ok &= check("xattn_int4 T=1500 bt=1536 out", o1, o2, 3e-2)
        ok &= check("xattn_int4 T=1500 bt=1536 scores", s1, s2, 5e-2)

        o1, s1 = cross_attention_stacked_int4_pallas(
            1, qb, k4b, ks4b, v4b, vs4b, Hb, block_t=1536, vmem_limit_mb=64,
            interpret=None, use_s8=True,
        )
        ok &= check("xattn_int4_s8 T=1500 bt=1536 out", o1, o2, 4e-2)
        ok &= check("xattn_int4_s8 T=1500 bt=1536 scores", s1, s2, 5e-2)

    print("ALL OK" if ok else "FAILURES PRESENT")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
