"""Long-form transcription engine: the 30-second sliding-window loop.

Owns what the reference delegates to ``whisper.transcribe`` (invoked at
reference ``transcribe.py:902-904``): window seeking, the temperature-fallback
schedule, quality thresholds (compression ratio 2.4 / logprob −1.0 / no-speech
0.6, reference ``transcribe.py:111-113``), prompt threading via
``condition_on_previous_text`` (``transcribe.py:201-204``), and timestamp-token
segmentation. Each window is ONE jitted device call that also returns the
per-token log-probabilities and alignment-head cross-attention the word
aligner consumes — the data the reference collects via hooks.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .audio import (
    HOP_LENGTH,
    N_FRAMES,
    N_SAMPLES,
    SAMPLE_RATE,
    as_pcm16,
    log_mel_spectrogram,
    pad_or_trim,
)
from .decoding import (
    MAX_NEW_TOKENS,
    PROMPT_REGION,
    DecodingOptions,
    build_blank_mask,
    build_suppress_mask,
    compression_ratio,
    decode_window_jit,
    detect_language,
)
from .models.load import WhisperModel
from .models.whisper_jax import kernel_knob_key
from .tokenizer import Tokenizer
from .utils.profiling import stage_timer

logger = logging.getLogger("whisper_timestamped_tpu")

INPUT_STRIDE = 2  # mel frames per output token position (conv2 stride)
TIME_PER_POSITION = INPUT_STRIDE * HOP_LENGTH / SAMPLE_RATE  # 0.02 s


@dataclass
class WindowDecodeResult:
    """Everything one window decode produced (per batch element)."""

    tokens: List[int]  # sampled tokens, EOT excluded
    text: str
    avg_logprob: float
    no_speech_prob: float
    temperature: float
    compression_ratio: float
    token_logprobs: np.ndarray  # (n_tokens,) logprob of each sampled token
    attn: np.ndarray  # (n_tokens, K, T_audio) alignment-head cross-attention
    sum_logprob: float = 0.0
    # timestamp-slice logprob rows per step (n_tokens, 1501): end-token
    # re-estimation heuristic input (reference transcribe.py:528-538)
    ts_logprobs: Optional[np.ndarray] = None
    # the row PREDICTING the final EOT, when EOT was sampled (early-EOT
    # segments append <|endoftext|> and align it with this row — reference
    # transcribe.py:518-523)
    eot_attn: Optional[np.ndarray] = None  # (K, T_audio)
    hit_limit: bool = False  # decode reached max_new without EOT ("stuck LM")
    # --- device-alignment mode (fetch_alignment=False): the big buffers stay
    # on device; attn/ts_logprobs/eot_attn above are None ---
    attn_dev: Optional[Any] = None  # device (B, max_new, K, T_audio)
    ts_logprobs_dev: Optional[Any] = None  # device (B, max_new, 1501)
    batch_index: int = 0
    n_text: int = 0  # sampled text tokens (row n_text predicts the final EOT)

    def ts_logprob_row(self, i: int) -> Optional[np.ndarray]:
        """Row i of the timestamp-logprob buffer, fetched lazily in device
        mode (the repair heuristic that needs it is rare)."""
        if self.ts_logprobs is not None:
            return self.ts_logprobs[i] if i < len(self.ts_logprobs) else None
        if self.ts_logprobs_dev is not None and i < self.ts_logprobs_dev.shape[1]:
            return np.asarray(self.ts_logprobs_dev[self.batch_index, i])
        return None


@dataclass
class Segment:
    """One transcription segment plus the alignment payload for its tokens."""

    id: int
    seek: int
    start: float
    end: float
    text: str
    tokens: List[int]
    temperature: float
    avg_logprob: float
    compression_ratio: float
    no_speech_prob: float
    # span [a, b) into the window's sampled-token arrays
    token_span: Tuple[int, int] = (0, 0)
    window: Optional[WindowDecodeResult] = None
    mel_frame_offset: int = 0  # window start frame in the full mel
    segment_frames: int = N_FRAMES  # actual content frames in this window

    def to_dict(self) -> Dict[str, Any]:
        return dict(
            id=self.id,
            seek=self.seek,
            start=self.start,
            end=self.end,
            text=self.text,
            tokens=list(self.tokens),
            temperature=self.temperature,
            avg_logprob=self.avg_logprob,
            compression_ratio=self.compression_ratio,
            no_speech_prob=self.no_speech_prob,
        )


class DecodeEngine:
    """Bound (model, tokenizer, options-geometry) with cached jit buffers.

    ``mesh``: a ``jax.sharding.Mesh`` with ("dp", "tp") axes. The engine
    shards the model parameters itself (megatron TP rules from
    ``parallel/mesh.py``) and places every window batch on the mesh — callers
    never handle sharding. Under tp>1 the stacked DECODE kernels run via
    ``shard_map`` (each shard holds whole heads; see ``attach_mesh``) when
    the geometry allows; encoder/prefill and incompatible geometries use the
    partitioned XLA math path. The reference has no counterpart: it is
    strictly single-device batch-1 (reference ``transcribe.py:806``).
    """

    def __init__(self, model: WhisperModel, tokenizer: Tokenizer, attn_dtype=jnp.float32,
                 kv_int8: Optional[bool] = None, layer_unroll: Optional[int] = None,
                 mesh=None, self_kv_int8: Optional[bool] = None,
                 kv_int4: Optional[bool] = None, w_int8: Optional[bool] = None,
                 enc_int8: Optional[bool] = None):
        self.model = model
        self.tokenizer = tokenizer
        self.dims = model.dims
        self.attn_dtype = attn_dtype
        # int8 cross-KV (2x KV capacity; memory lever); env default WTT_KV_INT8
        self.kv_int8 = (
            os.environ.get("WTT_KV_INT8") == "1" if kv_int8 is None else kv_int8
        )
        # int4 cross-KV (nibble-packed along T): halves the decode loop's
        # dominant HBM stream again vs int8, at ~4-bit quantization error on
        # the attention scores the aligner consumes. Env default WTT_KV_INT4;
        # wins over kv_int8 when both are set.
        self.kv_int4 = (
            os.environ.get("WTT_KV_INT4") == "1" if kv_int4 is None else kv_int4
        )
        # int8 self-KV: halves the second HBM stream of the decode step (the
        # (L, B, ctx, D) cache read, ~2 GB/step at large-v3 B=40 with the
        # 232-slot prompt region); rows are quantized as they are written.
        # Env default WTT_SELF_KV_INT8.
        self.self_kv_int8 = (
            os.environ.get("WTT_SELF_KV_INT8") == "1"
            if self_kv_int8 is None
            else self_kv_int8
        )
        # weight-only int8 for the decode loop (per-output-channel scales on
        # an int8 COPY of the decoder blocks; bf16 originals keep serving the
        # encoder/prefill/cross-KV projections). Env default WTT_W_INT8.
        self.w_int8 = (
            os.environ.get("WTT_W_INT8") == "1" if w_int8 is None else w_int8
        )
        # W8A8 encoder matmuls (compute lever: int8 MXU at 2x the bf16 rate;
        # dynamic per-token activation scales). Env default WTT_ENC_INT8.
        self.enc_int8 = (
            os.environ.get("WTT_ENC_INT8") == "1" if enc_int8 is None else enc_int8
        )
        self.mesh = None
        self.kernel_mesh = None  # set by attach_mesh when tp>1 kernels engage
        self.tp = 1
        self.allow_pallas = True
        if mesh is not None:
            if self.w_int8 or self.enc_int8:
                logger.warning(
                    "w_int8/enc_int8 are not supported together with a mesh "
                    "(no sharding rules for the quantized copies); disabling"
                )
                self.w_int8 = False
                self.enc_int8 = False
            self.attach_mesh(mesh)
        if self.enc_int8:
            import dataclasses

            from .models.whisper_jax import quantize_linear_tree

            enc = dict(self.model.params["encoder"])
            enc["blocks_w8"] = jax.jit(quantize_linear_tree)(enc["blocks"])
            self.model = dataclasses.replace(
                self.model, params={**self.model.params, "encoder": enc}
            )
        if self.w_int8:
            import dataclasses

            from .models.whisper_jax import quantize_linear_tree

            dec = dict(self.model.params["decoder"])
            dec["blocks_w8"] = jax.jit(quantize_linear_tree)(dec["blocks"])

            @jax.jit
            def _q_logits(d):
                w = (
                    d["proj"]["w"] if d.get("proj") is not None
                    else d["tok_emb"].T
                )  # (D, V)
                s = (
                    jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True)
                    / 127.0
                )
                w8 = jnp.round(
                    w.astype(jnp.float32) / jnp.maximum(s, 1e-8)
                ).astype(jnp.int8)
                return {"w8": w8, "s": s.astype(jnp.float32)}

            dec["logits_w8"] = _q_logits(dec)
            self.model = dataclasses.replace(
                self.model, params={**self.model.params, "decoder": dec}
            )
        # layer_unroll: experimental knob. Unrolling the decode-step layer
        # scan was hypothesized to remove the per-step stacked-param slice
        # copies (~4ms/step at large-v3 B=12 in profiles), but measured SLOWER
        # end-to-end (169x vs 230x realtime) — XLA loses in-place cache
        # aliasing in the unrolled form. Default stays the rolled scan.
        self.layer_unroll = layer_unroll or 1
        heads = model.alignment_heads
        if not heads:
            # fallback: all heads of the top half of decoder layers
            # (reference transcribe.py:259-261 / perform_word_alignment default)
            L, H = self.dims.n_text_layer, self.dims.n_text_head
            heads = [(l, h) for l in range(L // 2, L) for h in range(H)]
        self.align_heads: Tuple[Tuple[int, int], ...] = tuple(heads)
        self._mask_cache: Dict[Any, Tuple[jnp.ndarray, jnp.ndarray]] = {}

    # ------------------------------------------------------------------
    def attach_mesh(self, mesh) -> None:
        """Shard the model parameters over ``mesh`` and route all subsequent
        decodes through it (dp over the window batch, megatron TP over
        heads/FFN). Idempotent: re-attaching the same mesh is a no-op-cost
        re-placement."""
        from dataclasses import replace as dc_replace

        from .parallel.mesh import shard_params

        from .models.whisper_jax import tp_kernels_compatible

        self.mesh = mesh
        self.tp = int(dict(mesh.shape).get("tp", 1))
        # allow_pallas gates the UNSHARDED kernels (encoder flash, prefill,
        # per-layer fallbacks) — those still run the XLA math path under tp>1
        # so GSPMD inserts the collectives. The stacked DECODE kernels run
        # under TP anyway, via shard_map over kernel_mesh (each shard holds
        # whole heads, so per-shard attention is complete locally); a
        # geometry whose head axis does not split evenly keeps the XLA path.
        self.allow_pallas = self.tp == 1
        self.kernel_mesh = (
            mesh if self.tp > 1 and tp_kernels_compatible(mesh, self.dims)
            else None
        )
        self.model = dc_replace(
            self.model, params=shard_params(self.model.params, mesh)
        )

    def _place(self, tree):
        """Put window-batch inputs on the mesh (dp-sharded when divisible,
        replicated otherwise). Identity without a mesh."""
        if self.mesh is None:
            return tree
        from .parallel.mesh import place_batch

        return place_batch(tree, self.mesh)

    # ------------------------------------------------------------------
    def _masks(self, options: DecodingOptions):
        key = (options.suppress_tokens if not isinstance(options.suppress_tokens, list)
               else tuple(options.suppress_tokens), options.suppress_blank)
        if key not in self._mask_cache:
            sm = jnp.asarray(build_suppress_mask(self.tokenizer, options, self.dims.n_vocab))
            bm = jnp.asarray(build_blank_mask(self.tokenizer, self.dims.n_vocab))
            self._mask_cache[key] = (sm, bm)
        return self._mask_cache[key]

    def build_prompt(
        self,
        prompt_tokens: Sequence[int],
        options: DecodingOptions,
        region: Optional[int] = None,
    ) -> Tuple[np.ndarray, int, int]:
        """Right-aligned prompt buffer. Returns (buffer (P,), prompt_len, sot_index_from_end).

        The buffer length P picks the smallest static prompt region that fits
        (PROMPT_REGION_SMALL for promptless windows); ``region`` forces a size
        (the batched pipeline must keep all rows uniform)."""
        tok = self.tokenizer
        # sot sequence from the options (not tokenizer state, which is shared)
        sot_seq = [tok.sot]
        if tok.is_multilingual:
            sot_seq.append(tok.to_language_token(options.language or tok.language or "en"))
            sot_seq.append(tok.translate if options.task == "translate" else tok.transcribe)
        if options.without_timestamps:
            sot_seq.append(tok.no_timestamps)
        prefix = list(options.prefix or [])
        if options.sample_len:
            # whisper trims the prefix to n_ctx//2 - sample_len when a sample
            # budget is set (DecodingTask._get_initial_tokens)
            max_prefix = max(0, self.dims.n_text_ctx // 2 - options.sample_len)
            prefix = prefix[-max_prefix:] if max_prefix else []
        # the fixed prompt region must always fit sot_prev + sot_seq + prefix
        max_prefix = PROMPT_REGION - len(sot_seq) - 1
        prefix = prefix[-max_prefix:] if max_prefix > 0 else []
        budget = min(
            self.dims.n_text_ctx // 2 - 1,
            PROMPT_REGION - len(sot_seq) - len(prefix) - 1,
        )
        initial: List[int] = []
        if prompt_tokens:
            initial.append(tok.sot_prev)
            if budget > 0:  # a huge prefix can consume the whole history budget
                initial.extend(list(prompt_tokens)[-budget:])
        initial.extend(sot_seq)
        initial.extend(prefix)
        if region is None:
            from .decoding import PROMPT_REGION_SMALL

            region = PROMPT_REGION_SMALL if len(initial) <= PROMPT_REGION_SMALL else PROMPT_REGION
        assert len(initial) <= region
        buf = np.full((region,), tok.eot, np.int32)
        buf[region - len(initial):] = initial
        sot_index_from_end = len(initial) - initial.index(tok.sot)
        return buf, len(initial), sot_index_from_end

    # ------------------------------------------------------------------
    def decode_window(
        self,
        mel: np.ndarray,  # (n_mels, 3000) or (B, n_mels, 3000)
        options: DecodingOptions,
        prompt_tokens: Sequence[int] = (),
        temperature: float = 0.0,
        rng_seed: int = 0,
        fetch_alignment: bool = True,
        capture_attention: bool = True,
    ) -> List[WindowDecodeResult]:
        tok = self.tokenizer
        # keep device arrays on device (host<->device traffic is precious);
        # numpy inputs are uploaded once here
        if not isinstance(mel, jnp.ndarray):
            mel = jnp.asarray(np.asarray(mel, np.float32))
        mel = mel.astype(jnp.float32)
        if mel.ndim == 2:
            mel = mel[None]
        B = mel.shape[0]
        buf, plen, sot_from_end = self.build_prompt(prompt_tokens, options)
        prompt = jnp.asarray(np.tile(buf[None], (B, 1)))
        prompt_len = jnp.full((B,), plen, jnp.int32)
        mel, prompt, prompt_len = self._place((mel, prompt, prompt_len))
        sm, bm = self._masks(options)
        max_init_ts = (
            round(options.max_initial_timestamp / TIME_PER_POSITION)
            if options.max_initial_timestamp is not None
            else None
        )
        out = decode_window_jit(
            self.model.params,
            mel,
            prompt,
            prompt_len,
            sm,
            bm,
            jnp.float32(temperature),
            jax.random.PRNGKey(rng_seed),
            dims=self.dims,
            align_heads=self.align_heads,
            max_new=options.sample_len or MAX_NEW_TOKENS,
            sample_begin=len(buf),
            eot=tok.eot,
            ts_begin=tok.timestamp_begin,
            no_timestamps=tok.no_timestamps,
            sot_index_from_end=sot_from_end,
            max_initial_timestamp_index=max_init_ts,
            suppress_blank=options.suppress_blank,
            without_timestamps=options.without_timestamps,
            attn_dtype=self.attn_dtype,
            kv_int8=self.kv_int8 and not self.kv_int4,
            kv_int4=self.kv_int4,
            self_kv_int8=self.self_kv_int8,
            layer_unroll=self.layer_unroll,
            allow_pallas=self.allow_pallas,
            capture_attention=capture_attention,
            kernel_knobs=kernel_knob_key(),
            mesh=self.kernel_mesh,
        )
        return self.unpack_window_outputs(
            out, temperature, fetch_alignment=fetch_alignment and capture_attention
        )

    def unpack_window_outputs(
        self, out, temperature, fetch_alignment: bool = True
    ) -> List[WindowDecodeResult]:
        """Device buffers -> per-element WindowDecodeResult (single host
        transfer per buffer). Shared by the serial and batched pipelines.

        ``fetch_alignment=False`` leaves the attention / timestamp-logprob
        buffers on device (device-alignment mode): only the token ids,
        logprobs and scalars — a few KB — cross the host boundary. The big
        buffers dominate the transfer cost on remote-tunnel TPUs."""
        # ONE host transfer for all the small outputs — on remote-tunnel TPUs
        # every np.asarray is a separate round trip (~0.1 s each)
        small = jax.device_get(
            (out["tokens"], out["token_logprobs"], out["sum_logprobs"],
             out["no_speech_prob"])
        )
        tokens_all, logprobs_all, sum_lp, nsp = (np.asarray(x) for x in small)
        return self.build_window_results(
            tokens_all, logprobs_all, sum_lp, nsp, out, temperature,
            fetch_alignment=fetch_alignment,
        )

    def build_window_results(
        self,
        tokens_all: np.ndarray,  # (B, M) int32, already on host
        logprobs_all: np.ndarray,  # (B, M) float32
        sum_lp: np.ndarray,  # (B,)
        nsp: np.ndarray,  # (B,)
        out,  # the device output dict (attn/ts_logprob buffer handles)
        temperature,
        fetch_alignment: bool = True,
    ) -> List[WindowDecodeResult]:
        """Host-array half of ``unpack_window_outputs``: the device-flow loop
        lands the small outputs via one packed read
        (``deviceflow.pack_host_outputs``) and feeds them here directly."""
        tok = self.tokenizer
        if fetch_alignment:
            ts_lp_all, attn_all = jax.device_get((out["ts_logprobs"], out["attn"]))
            attn_all = np.asarray(attn_all, np.float32)

        results = []
        for b in range(tokens_all.shape[0]):
            toks = tokens_all[b]
            eot_pos = np.nonzero(toks == tok.eot)[0]
            hit_limit = len(eot_pos) == 0
            n_text = int(eot_pos[0]) if len(eot_pos) else len(toks)
            text_tokens = toks[:n_text].tolist()
            text = tok.decode(text_tokens)
            # whisper avg_logprob: sum over sampled (incl. final EOT) / (len+1)
            avg_lp = float(sum_lp[b]) / (n_text + 1)
            results.append(
                WindowDecodeResult(
                    tokens=text_tokens,
                    text=text,
                    avg_logprob=avg_lp,
                    no_speech_prob=float(nsp[b]),
                    temperature=float(temperature),
                    compression_ratio=compression_ratio(text),
                    token_logprobs=logprobs_all[b, :n_text],
                    attn=attn_all[b, :n_text] if fetch_alignment else None,
                    sum_logprob=float(sum_lp[b]),
                    ts_logprobs=ts_lp_all[b, :n_text] if fetch_alignment else None,
                    eot_attn=(
                        attn_all[b, n_text] if fetch_alignment and not hit_limit else None
                    ),
                    hit_limit=hit_limit,
                    attn_dev=None if fetch_alignment else out["attn"],
                    ts_logprobs_dev=None if fetch_alignment else out["ts_logprobs"],
                    batch_index=b,
                    n_text=n_text,
                )
            )
        return results

    # ------------------------------------------------------------------
    def decode_window_beam(
        self,
        mel: np.ndarray,  # (n_mels, 3000)
        options: DecodingOptions,
        prompt_tokens: Sequence[int] = (),
    ) -> WindowDecodeResult:
        """Beam-search decode of one window (no attention capture — the
        teacher-forced pass supplies alignment data in the naive engine)."""
        from .decoding_beam import decode_window_beam_jit, rank_beam_results

        tok = self.tokenizer
        # keep device-resident mel on device (np.asarray would round-trip it
        # through the host on every beam window)
        mel = jnp.asarray(mel, jnp.float32)
        if mel.ndim == 2:
            mel = mel[None]
        assert mel.shape[0] == 1, "beam decode is per-window (B=1)"
        buf, plen, sot_from_end = self.build_prompt(
            prompt_tokens, options, region=PROMPT_REGION
        )
        sm, bm = self._masks(options)
        K = options.beam_size
        patience = options.patience if options.patience is not None else 1.0
        max_candidates = max(1, round(K * patience))
        max_init_ts = (
            round(options.max_initial_timestamp / TIME_PER_POSITION)
            if options.max_initial_timestamp is not None
            else None
        )
        mel = self._place(mel) if self.mesh is not None else mel
        out = decode_window_beam_jit(
            self.model.params,
            jnp.asarray(mel),
            jnp.asarray(buf),
            jnp.int32(plen),
            sm,
            bm,
            dims=self.dims,
            beam_size=K,
            max_candidates=max_candidates,
            max_new=options.sample_len or MAX_NEW_TOKENS,
            sample_begin=PROMPT_REGION,
            eot=tok.eot,
            ts_begin=tok.timestamp_begin,
            no_timestamps=tok.no_timestamps,
            sot_index_from_end=sot_from_end,
            max_initial_timestamp_index=max_init_ts,
            suppress_blank=options.suppress_blank,
            without_timestamps=options.without_timestamps,
            allow_pallas=self.allow_pallas,
            mesh=self.kernel_mesh,
            kv_int8=self.kv_int8 and not self.kv_int4,
        )
        tokens, sum_lp = rank_beam_results(
            {k: np.asarray(v) if hasattr(v, "shape") else v for k, v in out.items()},
            tok.eot,
            options.length_penalty,
        )
        text = tok.decode(tokens)
        return WindowDecodeResult(
            tokens=tokens,
            text=text,
            avg_logprob=float(sum_lp) / (len(tokens) + 1),
            no_speech_prob=float(np.asarray(out["no_speech_prob"])),
            temperature=0.0,
            compression_ratio=compression_ratio(text),
            token_logprobs=np.zeros(len(tokens), np.float32),
            attn=np.zeros((0,)),
            sum_logprob=float(sum_lp),
            hit_limit=int(np.asarray(out["n_steps"])) >= (options.sample_len or MAX_NEW_TOKENS)
            and int(np.asarray(out["n_finished"])) == 0,
        )

    def decode_window_beam_batch(
        self,
        mels,  # (B, n_mels, 3000) numpy or device
        options: DecodingOptions,
        prompts: Sequence[Sequence[int]],  # per-row prompt tokens
        languages: Optional[Sequence[Optional[str]]] = None,
    ) -> List[WindowDecodeResult]:
        """Beam-search decode of B independent windows in ONE program
        (pass-1 of the batched naive pipeline). Row prompts/languages may
        differ; all rows share the full prompt region so shapes stay
        uniform. No attention capture — alignment comes from the
        teacher-forced pass, as in the serial naive engine."""
        from .decoding_beam import decode_window_beam_batch_jit, rank_beam_results

        tok = self.tokenizer
        mels = jnp.asarray(mels, jnp.float32)
        B = mels.shape[0]

        def row_opts(i: int) -> DecodingOptions:
            lang = languages[i] if languages else None
            if lang is None or lang == options.language:
                return options
            return DecodingOptions(**{**options.__dict__, "language": lang})

        bufs, lens, sot_from_end = [], [], None
        for i in range(B):
            buf, plen, sot_from_end = self.build_prompt(
                list(prompts[i]) if i < len(prompts) else [],
                row_opts(i), region=PROMPT_REGION,
            )
            bufs.append(buf)
            lens.append(plen)
        sm, bm = self._masks(options)
        K = options.beam_size
        patience = options.patience if options.patience is not None else 1.0
        max_candidates = max(1, round(K * patience))
        max_init_ts = (
            round(options.max_initial_timestamp / TIME_PER_POSITION)
            if options.max_initial_timestamp is not None
            else None
        )
        max_new = options.sample_len or MAX_NEW_TOKENS
        out = decode_window_beam_batch_jit(
            self.model.params,
            self._place(mels),
            self._place(jnp.asarray(np.stack(bufs))),
            self._place(jnp.asarray(np.asarray(lens, np.int32))),
            sm,
            bm,
            dims=self.dims,
            beam_size=K,
            max_candidates=max_candidates,
            max_new=max_new,
            sample_begin=PROMPT_REGION,
            eot=tok.eot,
            ts_begin=tok.timestamp_begin,
            no_timestamps=tok.no_timestamps,
            sot_index_from_end=sot_from_end,
            max_initial_timestamp_index=max_init_ts,
            suppress_blank=options.suppress_blank,
            without_timestamps=options.without_timestamps,
            allow_pallas=self.allow_pallas,
            mesh=self.kernel_mesh,
            kv_int8=self.kv_int8 and not self.kv_int4,
        )
        host = {k: np.asarray(v) for k, v in out.items()}
        results = []
        for b in range(B):
            row = {k: v[b] for k, v in host.items()}
            tokens, sum_lp = rank_beam_results(row, tok.eot, options.length_penalty)
            text = tok.decode(tokens)
            results.append(
                WindowDecodeResult(
                    tokens=tokens,
                    text=text,
                    avg_logprob=float(sum_lp) / (len(tokens) + 1),
                    no_speech_prob=float(row["no_speech_prob"]),
                    temperature=0.0,
                    compression_ratio=compression_ratio(text),
                    token_logprobs=np.zeros(len(tokens), np.float32),
                    attn=np.zeros((0,)),
                    sum_logprob=float(sum_lp),
                    hit_limit=int(row["n_steps"]) >= max_new
                    and int(row["n_finished"]) == 0,
                    batch_index=b,
                    n_text=len(tokens),
                )
            )
        return results

    def decode_window_best_of(
        self,
        mel: np.ndarray,
        options: DecodingOptions,
        prompt_tokens: Sequence[int],
        temperature: float,
        rng_seed: int,
        fetch_alignment: bool = True,
        capture_attention: bool = True,
    ) -> WindowDecodeResult:
        """best_of sampling: n_group independent samples, best avg-logprob wins
        (whisper GreedyDecoder + MaximumLikelihoodRanker with no penalty)."""
        n = options.best_of or 1
        mel = jnp.asarray(mel, jnp.float32)  # stays on device if already there
        if mel.ndim == 2:
            mel = mel[None]
        batch = jnp.repeat(mel, n, axis=0)
        results = self.decode_window(
            batch, options, prompt_tokens, temperature=temperature, rng_seed=rng_seed,
            fetch_alignment=fetch_alignment, capture_attention=capture_attention,
        )
        # NOTE: decode_window uses one PRNG key folded per batch element via
        # jax.random.categorical over the batch, so samples differ per row.
        return max(results, key=lambda r: sequence_score(r, options.length_penalty))

    # ------------------------------------------------------------------
    def decode_with_fallback(
        self,
        mel: np.ndarray,
        options: DecodingOptions,
        prompt_tokens: Sequence[int],
        temperatures: Sequence[float],
        compression_ratio_threshold: Optional[float],
        logprob_threshold: Optional[float],
        no_speech_threshold: Optional[float],
        rng_seed: int = 0,
        fetch_alignment: bool = True,
        capture_attention: bool = True,
    ) -> WindowDecodeResult:
        """whisper's decode_with_fallback: escalate temperature on bad output.

        At t==0 beam search is used when beam_size is set; at t>0 best_of
        sampling (whisper transcribe.py's decode_with_fallback semantics).
        """
        result = None
        for t in temperatures:
            if t == 0 and options.beam_size:
                result = self.decode_window_beam(mel, options, prompt_tokens)
            elif t > 0 and (options.best_of or 0) > 1:
                result = self.decode_window_best_of(
                    mel, options, prompt_tokens, float(t), rng_seed,
                    fetch_alignment=fetch_alignment,
                    capture_attention=capture_attention,
                )
                result.temperature = float(t)
            else:
                result = self.decode_window(
                    mel, options, prompt_tokens, temperature=float(t), rng_seed=rng_seed,
                    fetch_alignment=fetch_alignment,
                    capture_attention=capture_attention,
                )[0]
            if not needs_fallback(
                result, compression_ratio_threshold, logprob_threshold,
                no_speech_threshold,
            ):
                break
        return result


def sequence_score(result: WindowDecodeResult, length_penalty: Optional[float]) -> float:
    """whisper MaximumLikelihoodRanker: length-normalized sum logprob (or the
    GNMT length penalty when set). Shared by best_of selection in the serial
    and batched pipelines."""
    length = len(result.tokens)
    if length_penalty is None:
        return result.sum_logprob / max(length, 1)
    return result.sum_logprob / (((5.0 + length) / 6.0) ** length_penalty)


def needs_fallback(
    result: WindowDecodeResult,
    compression_ratio_threshold: Optional[float],
    logprob_threshold: Optional[float],
    no_speech_threshold: Optional[float],
) -> bool:
    """whisper's retry predicate (shared by the serial and batched pipelines):
    too-repetitive or low-confidence output retries at the next temperature,
    EXCEPT when the window is silence (no-speech wins unconditionally)."""
    nf = False
    if (
        compression_ratio_threshold is not None
        and result.compression_ratio > compression_ratio_threshold
    ):
        nf = True  # too repetitive
    if logprob_threshold is not None and result.avg_logprob < logprob_threshold:
        nf = True  # low confidence
    if no_speech_threshold is not None and result.no_speech_prob > no_speech_threshold:
        nf = False  # silence: don't bother retrying
    return nf


# ---------------------------------------------------------------------------
# The sliding-window loop
# ---------------------------------------------------------------------------


@dataclass
class TranscribeResult:
    text: str
    segments: List[Segment]
    language: Optional[str]
    language_probs: Optional[dict] = None


def transcribe_windows(
    engine: DecodeEngine,
    audio: np.ndarray,  # 16 kHz float32
    *,
    language: Optional[str] = None,
    task: str = "transcribe",
    temperature: Sequence[float] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
    compression_ratio_threshold: Optional[float] = 2.4,
    logprob_threshold: Optional[float] = -1.0,
    no_speech_threshold: Optional[float] = 0.6,
    condition_on_previous_text: bool = True,
    initial_prompt: Optional[str] = None,
    decode_options: Optional[DecodingOptions] = None,
    return_language_probs: bool = False,
    verbose_callback=None,
    rng_seed: int = 0,
    fetch_alignment: bool = True,
    capture_attention: bool = True,
) -> TranscribeResult:
    """whisper-semantics long-form loop, emitting alignment-ready segments."""
    tok = engine.tokenizer
    dims = engine.dims
    if isinstance(temperature, (int, float)):
        temperature = [float(temperature)]

    with stage_timer("mel"):
        # stays on device: windows are sliced/padded with jnp so only the
        # decode outputs ever cross the host boundary; PCM-grid audio ships
        # as int16 (lossless, half the upload bytes)
        audio_np = np.asarray(audio, np.float32)
        pcm16 = as_pcm16(audio_np)
        mel_full = log_mel_spectrogram(
            pcm16 if pcm16 is not None else audio_np,
            n_mels=dims.n_mels, padding=N_SAMPLES,
        )
    content_frames = mel_full.shape[-1] - N_FRAMES
    content_duration = content_frames * HOP_LENGTH / SAMPLE_RATE

    # --- language ---
    language_probs = None
    def _first_window():
        w = mel_full[:, :N_FRAMES]
        if w.shape[-1] < N_FRAMES:
            w = jnp.pad(w, ((0, 0), (0, N_FRAMES - w.shape[-1])))
        return w

    if language is None:
        if engine.tokenizer.is_multilingual:
            if verbose_callback is not None:
                # whisper's verbose message (reproduced by the reference at
                # transcribe.py:817-820)
                print(
                    "Detecting language using up to the first 30 seconds. "
                    "Use `--language` to specify the language"
                )
            codes, probs = detect_language(
                engine.model.params, _first_window()[None], dims, tok,
                allow_pallas=engine.allow_pallas,
            )
            language, language_probs = codes[0], probs[0]
        else:
            language = "en"
    elif return_language_probs and engine.tokenizer.is_multilingual:
        _, probs = detect_language(
            engine.model.params, _first_window()[None], dims, tok,
            allow_pallas=engine.allow_pallas,
        )
        language_probs = probs[0]

    base_opts = decode_options or DecodingOptions()
    base_opts = DecodingOptions(
        **{
            **base_opts.__dict__,
            "task": task,
            "language": language,
        }
    )

    all_tokens: List[int] = []
    initial_prompt_tokens: List[int] = []
    if initial_prompt is not None:
        initial_prompt_tokens = tok.encode(" " + initial_prompt.strip())
        all_tokens.extend(initial_prompt_tokens)
    prompt_reset_since = 0

    segments: List[Segment] = []
    seek = 0
    while seek < content_frames:
        mel_window = mel_full[:, seek : seek + N_FRAMES]
        segment_size = min(N_FRAMES, content_frames - seek)
        if mel_window.shape[-1] < N_FRAMES:
            mel_window = jnp.pad(mel_window, ((0, 0), (0, N_FRAMES - mel_window.shape[-1])))

        with stage_timer("decode"):
            result = engine.decode_with_fallback(
                mel_window,
                base_opts,
                all_tokens[prompt_reset_since:],
                temperature,
                compression_ratio_threshold,
                logprob_threshold,
                no_speech_threshold,
                rng_seed=rng_seed + seek,
                fetch_alignment=fetch_alignment,
                capture_attention=capture_attention,
            )

        window_segments, seek = extract_window_segments(
            result, seek, segment_size, tok, no_speech_threshold, logprob_threshold
        )

        for seg in window_segments:
            seg.id = len(segments)
            segments.append(seg)
            if verbose_callback is not None:
                verbose_callback(seg)
            all_tokens.extend(seg.tokens)

        if not condition_on_previous_text or result.temperature > 0.5:
            prompt_reset_since = len(all_tokens)

    text = "".join(s.text for s in segments)
    return TranscribeResult(
        text=text, segments=segments, language=language, language_probs=language_probs
    )


def extract_window_segments(
    result: WindowDecodeResult,
    seek: int,
    segment_size: int,
    tok: Tokenizer,
    no_speech_threshold: Optional[float],
    logprob_threshold: Optional[float],
) -> Tuple[List[Segment], int]:
    """Timestamp-token segmentation + seek advance for one decoded window
    (whisper's transcribe-loop semantics). Returns (segments, new_seek).
    Shared by the serial loop and the batched multi-file pipeline."""
    time_offset = seek * HOP_LENGTH / SAMPLE_RATE
    segment_duration = segment_size * HOP_LENGTH / SAMPLE_RATE

    if no_speech_threshold is not None:
        should_skip = result.no_speech_prob > no_speech_threshold
        if logprob_threshold is not None and result.avg_logprob > logprob_threshold:
            should_skip = False
        if should_skip:
            return [], seek + segment_size

    tokens = np.array(result.tokens)
    ts_begin = tok.timestamp_begin
    timestamp_mask = tokens >= ts_begin
    single_timestamp_ending = (
        len(tokens) >= 2 and not timestamp_mask[-2] and timestamp_mask[-1]
    )

    consecutive = (
        np.where(timestamp_mask[:-1] & timestamp_mask[1:])[0] + 1
        if len(tokens) >= 2
        else np.array([], int)
    )
    window_segments: List[Segment] = []
    if len(consecutive) > 0:
        slices = consecutive.tolist()
        if single_timestamp_ending:
            slices.append(len(tokens))
        last_slice = 0
        for current_slice in slices:
            sliced = tokens[last_slice:current_slice]
            start_pos = int(sliced[0]) - ts_begin
            end_pos = int(sliced[-1]) - ts_begin
            window_segments.append(
                _new_segment(
                    seek,
                    time_offset + start_pos * TIME_PER_POSITION,
                    time_offset + end_pos * TIME_PER_POSITION,
                    sliced.tolist(),
                    result,
                    token_span=(last_slice, current_slice),
                    tok=tok,
                    mel_frame_offset=seek,
                    segment_frames=segment_size,
                )
            )
            last_slice = current_slice
        if single_timestamp_ending:
            seek += segment_size
        else:
            last_timestamp_pos = int(tokens[last_slice - 1]) - ts_begin
            seek += last_timestamp_pos * INPUT_STRIDE
    else:
        duration = segment_duration
        timestamps = tokens[timestamp_mask]
        if len(timestamps) > 0 and int(timestamps[-1]) != ts_begin:
            duration = (int(timestamps[-1]) - ts_begin) * TIME_PER_POSITION
        window_segments.append(
            _new_segment(
                seek,
                time_offset,
                time_offset + duration,
                tokens.tolist(),
                result,
                token_span=(0, len(tokens)),
                tok=tok,
                mel_frame_offset=seek,
                segment_frames=segment_size,
            )
        )
        seek += segment_size
    return window_segments, seek


def _new_segment(seek, start, end, seg_tokens, window: WindowDecodeResult, token_span, tok, mel_frame_offset, segment_frames):
    text_tokens = [t for t in seg_tokens if t < tok.eot]
    return Segment(
        id=-1,
        seek=int(seek),
        start=float(start),
        end=float(end),
        text=tok.decode(text_tokens),
        tokens=seg_tokens,
        temperature=window.temperature,
        avg_logprob=window.avg_logprob,
        compression_ratio=window.compression_ratio,
        no_speech_prob=window.no_speech_prob,
        token_span=tuple(token_span),
        window=window,
        mel_frame_offset=mel_frame_offset,
        segment_frames=segment_frames,
    )
