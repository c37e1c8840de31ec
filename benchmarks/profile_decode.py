"""Breakdown profiling of the bench loop: device decode vs host fetch vs alignment.

Run on the real TPU: python benchmarks/profile_decode.py
Env: BENCH_MODEL, BENCH_BATCH, BENCH_TOKENS as in bench.py.
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
from whisper_timestamped_tpu.alignment import perform_word_alignment
from whisper_timestamped_tpu.audio import log_mel_spectrogram
from whisper_timestamped_tpu.decoding import DecodingOptions, decode_window_jit, MAX_NEW_TOKENS
from whisper_timestamped_tpu.engine import DecodeEngine
from whisper_timestamped_tpu.models.alignment_heads import ALIGNMENT_HEADS
from whisper_timestamped_tpu.models.load import WhisperModel
from whisper_timestamped_tpu.models.whisper_jax import WhisperDims, cast_params, init_params
from whisper_timestamped_tpu.tokenizer import Tokenizer, BytePairEncoder, synthetic_ranks


def main():
    model_name = os.environ.get("BENCH_MODEL", "large-v3")
    B = int(os.environ.get("BENCH_BATCH", "12"))
    n_tokens = int(os.environ.get("BENCH_TOKENS", "75"))
    kv_int8 = os.environ.get("BENCH_KV_INT8") == "1"

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
    print(f"model={model_name} B={B} n_tokens={n_tokens} K_align_heads={len(heads)} kv_int8={kv_int8}")
    wm = WhisperModel(params=params, dims=dims, alignment_heads=heads)
    engine = DecodeEngine(wm, tok, attn_dtype=jnp.bfloat16, kv_int8=kv_int8)

    def make_mel(seed):
        r = np.random.default_rng(seed)
        audio = (r.standard_normal(B * 30 * 16000) * 0.1).astype(np.float32)
        m = log_mel_spectrogram(audio.reshape(B, -1), n_mels=dims.n_mels)
        return jnp.pad(m, ((0, 0), (0, 0), (0, 3000 - m.shape[-1])))

    opts = DecodingOptions(language="en", sample_len=n_tokens)
    reps = int(os.environ.get("BENCH_REPS", "4"))
    mels = [make_mel(i) for i in range(reps + 1)]

    # warmup/compile
    res = engine.decode_window(mels[-1], opts)

    # --- stage A: pure device time (raw jit call, block_until_ready, no fetch)
    buf, plen, sot_from_end = engine.build_prompt((), opts)
    prompt = jnp.asarray(np.tile(buf[None], (B, 1)))
    prompt_len = jnp.full((B,), plen, jnp.int32)
    sm, bm = engine._masks(opts)
    from whisper_timestamped_tpu.engine import TIME_PER_POSITION
    max_init_ts = round(opts.max_initial_timestamp / TIME_PER_POSITION)

    def raw_call(mel):
        return decode_window_jit(
            engine.model.params, mel, prompt, prompt_len, sm, bm,
            jnp.float32(0.0), jax.random.PRNGKey(0),
            dims=dims, align_heads=engine.align_heads, max_new=n_tokens,
            eot=tok.eot, ts_begin=tok.timestamp_begin, no_timestamps=tok.no_timestamps,
            sot_index_from_end=sot_from_end, max_initial_timestamp_index=max_init_ts,
            suppress_blank=True, without_timestamps=False,
            attn_dtype=jnp.bfloat16, kv_int8=kv_int8,
        )

    for rep in range(reps):
        t0 = time.time()
        out = raw_call(mels[rep])
        jax.block_until_ready(out)
        t_dev = time.time() - t0

        t0 = time.time()
        tokens_np = np.asarray(out["tokens"])
        lp_np = np.asarray(out["token_logprobs"])
        t_small = time.time() - t0
        t0 = time.time()
        attn_np = np.asarray(out["attn"])
        t_attn = time.time() - t0
        t0 = time.time()
        ts_lp_np = np.asarray(out["ts_logprobs"])
        t_tslp = time.time() - t0

        t0 = time.time()
        results = engine.unpack_window_outputs(out, 0.0)
        t_unpack = time.time() - t0

        t0 = time.time()
        for r in results:
            toks = [tok.timestamp_begin] + [t for t in r.tokens if t < tok.eot][: n_tokens - 2] + [
                tok.timestamp_begin + 1500
            ]
            attn = np.concatenate(
                [r.attn[:1], r.attn[: len(toks) - 2], r.attn[-1:]], axis=0
            )[: len(toks)]
            if attn.shape[0] == len(toks) and len(toks) > 2:
                perform_word_alignment(toks, attn, tok, detect_disfluencies=False)
        t_align = time.time() - t0

        total = t_dev + t_unpack + t_align
        print(
            f"rep{rep}: device={t_dev:.3f}s fetch[small={t_small:.3f} attn({attn_np.nbytes/1e6:.1f}MB)={t_attn:.3f} "
            f"ts_lp({ts_lp_np.nbytes/1e6:.1f}MB)={t_tslp:.3f}] unpack={t_unpack:.3f}s align={t_align:.3f}s "
            f"| total={total:.3f}s -> {B*30/total:.1f}x RT"
        )


if __name__ == "__main__":
    main()
