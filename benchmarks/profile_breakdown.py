"""Macro breakdown of the bench pipeline at large-v3: encoder vs prefill vs
decode loop vs device alignment, plus an optional jax.profiler trace.

Run on the real TPU: python benchmarks/profile_breakdown.py
Env: BENCH_MODEL, BENCH_BATCH, BENCH_TOKENS, BENCH_TRACE=/tmp/trace_dir
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
from whisper_timestamped_tpu.audio import log_mel_spectrogram
from whisper_timestamped_tpu.decoding import DecodingOptions
from whisper_timestamped_tpu.engine import DecodeEngine
from whisper_timestamped_tpu.models.alignment_heads import ALIGNMENT_HEADS
from whisper_timestamped_tpu.models.load import WhisperModel
from whisper_timestamped_tpu.models.whisper_jax import (
    WhisperDims, cast_params, encode, init_params,
)
from whisper_timestamped_tpu.tokenizer import Tokenizer, BytePairEncoder, synthetic_ranks


def timed(fn, arg_sets, probe=None):
    """Each rep gets DISTINCT input buffers (the TPU tunnel memoizes
    executions on identical arguments), and the clock stops on a SMALL host
    fetch (``probe``) — through the tunnel, block_until_ready returns at
    dispatch, not completion, so only a device->host copy is an honest sync."""
    if probe is None:
        probe = lambda out: np.asarray(jax.tree.leaves(out)[0])
    out = fn(*arg_sets[-1])
    probe(out)
    ts = []
    for args in arg_sets[:-1]:
        t0 = time.time()
        out = fn(*args)
        probe(out)
        ts.append(time.time() - t0)
    return min(ts), out


def main():
    model_name = os.environ.get("BENCH_MODEL", "large-v3")
    B = int(os.environ.get("BENCH_BATCH", "24"))
    n_tokens = int(os.environ.get("BENCH_TOKENS", "75"))
    kv_int8 = os.environ.get("BENCH_KV_INT8") == "1"
    kv_int4 = os.environ.get("BENCH_KV_INT4") == "1"
    self_int8 = os.environ.get("BENCH_SELF_INT8") == "1"
    w_int8 = os.environ.get("BENCH_W_INT8") == "1"
    enc_int8 = os.environ.get("BENCH_ENC_INT8") == "1"

    dims = WhisperDims(n_audio_ctx=1500, n_text_ctx=448, **GEOMETRIES[model_name])
    params = cast_params(init_params(dims, jax.random.PRNGKey(0)), jnp.bfloat16)

    ranks = synthetic_ranks()
    pad_base = dims.n_vocab - 1509 - (100 if dims.n_vocab == 51866 else 99) - len(ranks)
    for i in range(pad_base):
        ranks[b"\x00" + str(i).encode()] = len(ranks)
    n_langs = 100 if dims.n_vocab == 51866 else 99
    tok = Tokenizer(bpe=BytePairEncoder(ranks), multilingual=True,
                    num_languages=n_langs, language="en", task="transcribe")

    heads = ALIGNMENT_HEADS.get(model_name) or [(dims.n_text_layer - 1, h) for h in range(6)]
    wm = WhisperModel(params=params, dims=dims, alignment_heads=heads)
    engine = DecodeEngine(wm, tok, attn_dtype=jnp.bfloat16, kv_int8=kv_int8,
                          kv_int4=kv_int4, self_kv_int8=self_int8, w_int8=w_int8,
                          enc_int8=enc_int8)

    reps = int(os.environ.get("BENCH_REPS", "4"))

    def make_mel(seed):
        r = np.random.default_rng(seed)
        audio = (r.standard_normal(B * 30 * 16000) * 0.1).astype(np.float32)
        m = log_mel_spectrogram(audio.reshape(B, -1), n_mels=dims.n_mels)
        return jnp.pad(m, ((0, 0), (0, 0), (0, 3000 - m.shape[-1])))

    mels = [jax.block_until_ready(make_mel(i)) for i in range(reps + 1)]
    mel = mels[0]

    opts = DecodingOptions(language="en", sample_len=n_tokens)

    # --- full window decode (device only, includes encoder) ---
    from whisper_timestamped_tpu.decoding import decode_window_jit
    from whisper_timestamped_tpu.engine import TIME_PER_POSITION

    buf, plen, sot_from_end = engine.build_prompt((), opts)
    prompt = jnp.asarray(np.tile(buf[None], (B, 1)))
    prompt_len = jnp.full((B,), plen, jnp.int32)
    sm, bm = engine._masks(opts)
    max_init_ts = round(opts.max_initial_timestamp / TIME_PER_POSITION)

    def raw(mel):
        return decode_window_jit(
            engine.model.params, mel, prompt, prompt_len, sm, bm,
            jnp.float32(0.0), jax.random.PRNGKey(0),
            dims=dims, align_heads=engine.align_heads, max_new=n_tokens,
            sample_begin=len(buf),
            eot=tok.eot, ts_begin=tok.timestamp_begin,
            no_timestamps=tok.no_timestamps,
            sot_index_from_end=sot_from_end,
            max_initial_timestamp_index=max_init_ts,
            suppress_blank=True, without_timestamps=False,
            attn_dtype=jnp.bfloat16, kv_int8=kv_int8 and not kv_int4,
            kv_int4=kv_int4, self_kv_int8=self_int8,
        )

    t_all, out = timed(raw, [(m,) for m in mels], probe=lambda o: np.asarray(o["n_steps"]))
    n_steps = int(np.asarray(out["n_steps"]))
    print(f"window decode total (enc+prefill+loop): {t_all*1e3:.1f} ms"
          f" -> {t_all*1e3/n_tokens:.2f} ms/token upper bound @ B={B}"
          f" [loop ran {n_steps} steps]", flush=True)

    # --- device alignment (distinct attn buffers per rep) ---
    from whisper_timestamped_tpu.device_align import compute_jumps_batch, make_task

    align_args = []
    for m in mels:
        res = engine.decode_window(m, opts, fetch_alignment=False)
        tasks = []
        R = res[0].attn_dev.shape[1]
        for rr in res:
            toks = [tok.timestamp_begin] + [t for t in rr.tokens if t < tok.eot][: n_tokens - 2] + [
                tok.timestamp_begin + 1500
            ]
            rows = [0] + list(range(len(toks) - 2)) + [max(rr.n_text - 1, 0)]
            if len(toks) > 2:
                t = make_task(toks, rr.batch_index * R, rows, tok)
                if t is not None:
                    tasks.append(t)
        flat = res[0].attn_dev.reshape(-1, *res[0].attn_dev.shape[2:])
        align_args.append((flat, tasks))
    n_tasks = len(align_args[0][1])
    t_align, _ = timed(compute_jumps_batch, align_args)
    print(f"device align ({n_tasks} tasks): {t_align*1e3:.1f} ms", flush=True)

    total = t_all + t_align
    print(f"pipeline: {total*1e3:.1f} ms -> {B*30/total:.1f}x RT  "
          f"[decode(+enc) {100*t_all/total:.0f}% | align {100*t_align/total:.0f}%]", flush=True)

    # --- 1-token window decode: total - one step ~= encoder + prefill ---
    # (the standalone jit(encode) program has been observed to kill the remote
    # compile service; the 1-token decode reuses the battle-tested program
    # shape and isolates the loop cost by subtraction)
    if os.environ.get("BENCH_ONETOKEN", "1") == "1":
        def raw1(mel):
            return decode_window_jit(
                engine.model.params, mel, prompt, prompt_len, sm, bm,
                jnp.float32(0.0), jax.random.PRNGKey(0),
                dims=dims, align_heads=engine.align_heads, max_new=1,
                sample_begin=len(buf),
                eot=tok.eot, ts_begin=tok.timestamp_begin,
                no_timestamps=tok.no_timestamps,
                sot_index_from_end=sot_from_end,
                max_initial_timestamp_index=max_init_ts,
                suppress_blank=True, without_timestamps=False,
                attn_dtype=jnp.bfloat16, kv_int8=kv_int8 and not kv_int4,
                kv_int4=kv_int4, self_kv_int8=self_int8,
            )

        t1, _ = timed(raw1, [(m,) for m in mels], probe=lambda o: np.asarray(o["n_steps"]))
        per_tok = (t_all - t1) / (n_tokens - 1)
        print(f"1-token window decode: {t1*1e3:.1f} ms (enc+prefill+1 step)"
              f" -> loop {per_tok*1e3:.2f} ms/token,"
              f" enc+prefill ~= {(t1 - per_tok)*1e3:.1f} ms", flush=True)

    # --- encoder alone ---
    # params must be an ARGUMENT: closing over them inlines ~2 GB of weights
    # as HLO constants, which overflows the remote compile service (HTTP 413)
    if os.environ.get("BENCH_ENCODER", "0") == "1":
        enc_jit = jax.jit(lambda p, m: jnp.mean(encode(p, m, dims).astype(jnp.float32)))
        t_enc, xa = timed(enc_jit, [(params, m) for m in mels], probe=lambda o: float(o))
        print(f"encoder B={B}: {t_enc*1e3:.1f} ms "
              f"(decode loop+prefill ~= {(t_all-t_enc)*1e3:.1f} ms"
              f" -> {(t_all-t_enc)*1e3/n_tokens:.2f} ms/token)", flush=True)

    trace_dir = os.environ.get("BENCH_TRACE")
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            jax.block_until_ready(raw(mel))
        print(f"trace written to {trace_dir}")


if __name__ == "__main__":
    main()
