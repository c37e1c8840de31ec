"""Batched multi-file transcription pipeline (data parallelism over streams).

The reference processes files serially, one 30-s window at a time
(``transcribe.py:3129``, batch-1 asserted at ``transcribe.py:806``). This
pipeline keeps many audio streams in flight: at every step it gathers one
pending window from each active stream, decodes them as ONE batched jitted
call (sharded over the mesh's ``dp`` axis when given), then advances each
stream's seek/prompt state on the host. Temperature fallback re-decodes only
the failing subset — still batched.

Windows of one stream are serially dependent through
``condition_on_previous_text`` (and through the seek advance, which depends on
the decoded timestamps either way), so the pipeline takes one window per
active stream per step; parallelism comes from the number of streams in
flight, not from pooling a single stream's windows.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..audio import (
    HOP_LENGTH,
    N_FRAMES,
    as_pcm16,
    load_audio,
    log_mel_spectrogram,
    pad_or_trim,
)
from ..decoding import DecodingOptions
from ..engine import (
    DecodeEngine,
    Segment,
    WindowDecodeResult,
    extract_window_segments,
    needs_fallback,
)
from ..models.whisper_jax import kernel_knob_key
from ..postprocess import ensure_increasing_positions
from ..tokenizer import Tokenizer
from ..utils.profiling import stage_timer

logger = logging.getLogger("whisper_timestamped_tpu")


@dataclass
class _Stream:
    """Per-file decoding state. The stream's mel lives in the transcriber's
    stacked device array (row ``row``) — only token ids and scalars ever
    cross the host boundary during the decode loop."""

    name: str
    row: int  # index into the stacked device mel array
    content_frames: int
    seek: int = 0
    all_tokens: List[int] = field(default_factory=list)
    prompt_reset_since: int = 0
    segments: List[Segment] = field(default_factory=list)
    done: bool = False
    language: Optional[str] = None
    language_probs: Optional[dict] = None


@dataclass
class PreparedAudio:
    """A batch's device-resident mel stack plus host metadata.

    Produced by :func:`prepare_audio_batch`; consumed by
    ``BatchTranscriber.transcribe_streams(prepared=...)`` /
    ``transcribe_batch(_prepared=...)``. The point of the split: preparation
    is dominated by the host→device audio upload (the pipeline's single
    largest copy — ~6 MB/stream/minute even as int16), so a serving loop can
    prepare batch k+1 on a worker thread while batch k's decode occupies the
    device (see :func:`transcribe_batch_stream`)."""

    mel_stack: Any  # device (N, n_mels, T_max + N_FRAMES)
    lengths: List[int]  # per-stream sample counts, audios order
    names: List[str]


def prepare_audio_batch(audios: Dict[str, Any], n_mels: int) -> PreparedAudio:
    """Host audio load + lossless int16 stack + mel dispatch (async).

    One batched on-device mel for ALL streams (shorter audio is zero-padded
    to the longest, which IS whisper's window padding — log-mel of appended
    zeros equals the per-stream padding). The mel stack stays on device for
    the whole run: every window batch is a jitted dynamic-slice gather, so no
    mel bytes ever cross the host↔device boundary after the initial audio
    upload. Thread-safe (JAX dispatch is); returns without blocking on the
    mel computation."""
    with stage_timer("prepare_audio"):  # off-critical-path when prefetched
        wavs = [np.asarray(load_audio(a), np.float32) for a in audios.values()]
        lengths = [w.shape[-1] for w in wavs]
        audio_stack = np.zeros((len(wavs), max(lengths)), np.float32)
        for i, w in enumerate(wavs):
            audio_stack[i, : len(w)] = w
        # PCM-grid audio ships as int16 (lossless, halves the upload)
        pcm16 = as_pcm16(audio_stack)
        send = pcm16 if pcm16 is not None else audio_stack
        # Ship in ~chunk_mb slices, not one giant put: a serving loop uploads
        # the NEXT batch while the current batch decodes, and one multi-
        # hundred-MB transfer head-of-line-blocks the decode loop's small
        # per-window reads on remote-tunnel backends (measured: per-window
        # align fetches stretching seconds behind a monolithic upload). The
        # on-device concatenate costs one cheap HBM copy.
        chunk_mb = float(os.environ.get("WTT_UPLOAD_CHUNK_MB", "16"))
        rows_per = max(1, int(chunk_mb * 1e6 // max(send[0].nbytes, 1)))
        if rows_per >= len(send):
            dev = jnp.asarray(send)
        else:
            starts = range(0, len(send), rows_per)
            # WTT_UPLOAD_THREADS>1 issues the chunk puts from a thread pool:
            # on remote-tunnel backends each put pays a round trip, so a few
            # transfers in flight raise aggregate upload bandwidth (on local
            # PCIe backends it makes no difference; default stays serial)
            n_thr = int(os.environ.get("WTT_UPLOAD_THREADS", "1"))
            if n_thr > 1:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=n_thr) as ex:
                    parts = list(
                        ex.map(lambda i: jnp.asarray(send[i : i + rows_per]), starts)
                    )
            else:
                parts = [jnp.asarray(send[i : i + rows_per]) for i in starts]
            dev = jnp.concatenate(parts, axis=0)
        mel = log_mel_spectrogram(
            dev, n_mels=n_mels, padding=N_FRAMES * HOP_LENGTH,
        )
    return PreparedAudio(mel_stack=mel, lengths=lengths, names=list(audios))


@jax.jit
def _slice_windows_jit(mel_stack, rows, seeks):
    """Per-row (n_mels, N_FRAMES) windows out of the stacked device mel."""
    n_mels = mel_stack.shape[1]

    def one(row, seek):
        m = jax.lax.dynamic_index_in_dim(mel_stack, row, 0, keepdims=False)
        return jax.lax.dynamic_slice(m, (0, seek), (n_mels, N_FRAMES))

    return jax.vmap(one)(rows, seeks)


class BatchTranscriber:
    """Fixed-batch window decoder over many audio streams.

    ``batch_size`` windows are decoded per device call (padded with silence
    when fewer are pending, so one program serves the whole run). When a
    ``jax.sharding.Mesh`` is provided, the window batch is sharded over its
    ``dp`` axis.
    """

    def __init__(
        self,
        engine: DecodeEngine,
        batch_size: int = 8,
        mesh=None,
        fetch_alignment: bool = True,
        tail_batch: Optional[int] = None,
    ):
        self.engine = engine
        self.batch_size = batch_size
        if mesh is not None and engine.mesh is None:
            # self-contained mesh path: the engine shards its own params
            engine.attach_mesh(mesh)
        self.mesh = mesh if mesh is not None else engine.mesh
        # False = device-alignment mode: attention buffers stay on device and
        # the batched Pallas aligner (device_align.py) consumes them later
        self.fetch_alignment = fetch_alignment
        # name -> {"language", "language_probs"} after transcribe_streams
        self.stream_meta: Dict[str, dict] = {}
        # optional smaller static batch for late "tail" iterations (few
        # streams still active): per-step cost is ~batch-proportional
        # (HBM-bound), so decoding 3 stragglers in a 40-row program wastes
        # most of the step. Costs one extra compiled program per prompt
        # region; None disables.
        self.tail_batch = tail_batch

    # --------------------------------------------------------------
    def _decode_batch(
        self,
        mels: np.ndarray,
        prompts: List[Sequence[int]],
        options: DecodingOptions,
        temperature: float,
        rng_seed: int,
        languages: Optional[List[Optional[str]]] = None,
    ) -> List[WindowDecodeResult]:
        out = self._dispatch_batch(
            mels, prompts, options, temperature, rng_seed, languages
        )
        with stage_timer("decode_fetch_unpack"):
            return self.engine.unpack_window_outputs(
                out, temperature, fetch_alignment=self.fetch_alignment
            )

    def _dispatch_batch(
        self,
        mels: np.ndarray,  # (B, n_mels, 3000)
        prompts: List[Sequence[int]],
        options: DecodingOptions,
        temperature: float,
        rng_seed: int,
        languages: Optional[List[Optional[str]]] = None,
    ):
        """Dispatch one batched window decode; returns the device output dict
        WITHOUT blocking (jax dispatch is async) — callers overlap host work
        or other device fetches with the execution, then unpack. Prompts (and
        languages) may differ per row — prompts are right-aligned into the
        shared prompt region with per-row lengths, and each row's sot
        sequence carries its own language token."""
        engine = self.engine

        def row_opts(i: int) -> DecodingOptions:
            lang = languages[i] if languages else None
            if lang is None or lang == options.language:
                return options
            return DecodingOptions(**{**options.__dict__, "language": lang})

        with stage_timer("decode_prompt_build"):
            bufs, lens, sot_from_end = [], [], None
            for i, p in enumerate(prompts):
                buf, plen, sfe = engine.build_prompt(p, row_opts(i))
                bufs.append(buf)
                lens.append(plen)
                sot_from_end = sfe
        if len({len(b) for b in bufs}) > 1:
            # mixed small/full prompt regions: rebuild uniformly at full size
            from ..decoding import PROMPT_REGION

            bufs = [
                engine.build_prompt(p, row_opts(i), region=PROMPT_REGION)[0]
                for i, p in enumerate(prompts)
            ]
        prompt = np.stack(bufs)
        prompt_len = np.asarray(lens, np.int32)
        return self._dispatch_arrays(
            mels, prompt, prompt_len, options, temperature, rng_seed,
            sot_index_from_end=sot_from_end,
        )

    def _dispatch_arrays(
        self,
        mels,  # (B, n_mels, 3000) numpy or device
        prompt,  # (B, P) numpy or device
        prompt_len,  # (B,) numpy or device
        options: DecodingOptions,
        temperature: float,
        rng_seed: int,
        *,
        sot_index_from_end: int,
    ):
        """Dispatch the window-decode program on prebuilt prompt buffers.
        Device-resident inputs (the device-flow fast path's chained state)
        pass straight through."""
        engine = self.engine
        tok = engine.tokenizer
        sm, bm = engine._masks(options)
        from ..decoding import MAX_NEW_TOKENS, decode_window_jit
        from ..engine import TIME_PER_POSITION

        max_init_ts = (
            round(options.max_initial_timestamp / TIME_PER_POSITION)
            if options.max_initial_timestamp is not None
            else None
        )

        def put(x):
            if self.mesh is None:
                return jnp.asarray(x)
            from .mesh import place_batch

            return place_batch(jnp.asarray(x), self.mesh)

        dispatch_timer = stage_timer("decode_dispatch")
        dispatch_timer.__enter__()
        out = decode_window_jit(
            engine.model.params,
            # device-resident mels pass straight through (np.asarray would
            # round-trip the (B, n_mels, 3000) batch through the host)
            put(mels if isinstance(mels, jnp.ndarray) else np.asarray(mels, np.float32)),
            put(prompt),
            put(prompt_len),
            sm,
            bm,
            jnp.float32(temperature),
            jax.random.PRNGKey(rng_seed),
            dims=engine.dims,
            align_heads=engine.align_heads,
            max_new=options.sample_len or MAX_NEW_TOKENS,
            sample_begin=prompt.shape[1],
            eot=tok.eot,
            ts_begin=tok.timestamp_begin,
            no_timestamps=tok.no_timestamps,
            sot_index_from_end=sot_index_from_end,
            max_initial_timestamp_index=max_init_ts,
            suppress_blank=options.suppress_blank,
            without_timestamps=options.without_timestamps,
            attn_dtype=engine.attn_dtype,
            kv_int8=engine.kv_int8 and not engine.kv_int4,
            kv_int4=engine.kv_int4,
            self_kv_int8=engine.self_kv_int8,
            layer_unroll=engine.layer_unroll,
            allow_pallas=engine.allow_pallas,
            kernel_knobs=kernel_knob_key(),
            mesh=getattr(engine, "kernel_mesh", None),
        )
        dispatch_timer.__exit__(None, None, None)
        return out

    # --------------------------------------------------------------
    def _gather_windows(
        self, rows: List[int], seeks: List[int], batch: Optional[int] = None
    ) -> jnp.ndarray:
        """(B, n_mels, N_FRAMES) window batch sliced out of the device mel
        stack — one tiny jitted gather, zero host traffic."""
        B = batch or self.batch_size
        rows = np.asarray((rows + [0] * B)[:B], np.int32)
        seeks = np.asarray((seeks + [0] * B)[:B], np.int32)
        return _slice_windows_jit(self._mel_stack, jnp.asarray(rows), jnp.asarray(seeks))

    # --------------------------------------------------------------
    def _detect_stream_languages(self, streams: List[_Stream]) -> None:
        """Batched language-ID over each stream's first 30-s window.

        Chunks are padded to ``batch_size`` so one compiled program serves
        every chunk."""
        from ..decoding import detect_language

        engine = self.engine
        B = self.batch_size
        for c0 in range(0, len(streams), B):
            chunk = streams[c0 : c0 + B]
            mel_dev = self._gather_windows([s.row for s in chunk], [0] * len(chunk))
            if engine.mesh is not None:
                from .mesh import place_batch

                mel_dev = place_batch(mel_dev, engine.mesh)
            codes, probs = detect_language(
                engine.model.params, mel_dev, engine.dims, engine.tokenizer,
                allow_pallas=engine.allow_pallas,
            )
            for s, code, p in zip(chunk, codes, probs):
                s.language = code
                s.language_probs = p

    # --------------------------------------------------------------
    def _decode_batch_best_of(
        self,
        mels: np.ndarray,
        prompts: List[Sequence[int]],
        options: DecodingOptions,
        temperature: float,
        rng_seed: int,
        languages: Optional[List[Optional[str]]],
    ) -> List[WindowDecodeResult]:
        """best_of at t>0 by row replication: each row is decoded
        ``best_of`` times (independent samples — decode_window draws one
        categorical per batch row per step) in batch-size chunks; the
        best-scoring sample per row wins (whisper MaximumLikelihoodRanker,
        same rule as the serial engine's decode_window_best_of)."""
        from ..engine import sequence_score

        n = options.best_of or 1
        if temperature <= 0 or n <= 1:
            return self._decode_batch(
                mels, prompts, options, temperature, rng_seed, languages
            )
        B = len(prompts)  # the (possibly tail-sized) window batch
        n_rows = len(prompts)
        rep_idx = [i for i in range(n_rows) for _ in range(n)]
        best: List[Optional[WindowDecodeResult]] = [None] * n_rows
        for c0 in range(0, len(rep_idx), B):
            chunk = rep_idx[c0 : c0 + B]
            pad = B - len(chunk)
            idx = np.asarray(chunk + [0] * pad, np.int32)
            sub_mels = (
                jnp.take(mels, jnp.asarray(idx), axis=0)
                if isinstance(mels, jnp.ndarray)
                else np.take(np.asarray(mels), idx, axis=0)
            )
            sub_prompts = [prompts[i] for i in chunk] + [[]] * pad
            sub_langs = (
                [languages[i] for i in chunk] + [None] * pad if languages else None
            )
            rs = self._decode_batch(
                sub_mels, sub_prompts, options, temperature, rng_seed + c0, sub_langs
            )
            for k, i in enumerate(chunk):
                if best[i] is None or sequence_score(
                    rs[k], options.length_penalty
                ) > sequence_score(best[i], options.length_penalty):
                    best[i] = rs[k]
        return best

    # --------------------------------------------------------------
    def _apply_window_results(
        self,
        batch: List[_Stream],
        results: List[WindowDecodeResult],
        sizes: List[int],
        no_speech_threshold: Optional[float],
        logprob_threshold: Optional[float],
        condition_on_previous_text: bool,
    ) -> List[Segment]:
        """Per-stream segment extraction + seek/prompt bookkeeping for one
        decoded window batch (shared by the host loop and the device flow)."""
        tok = self.engine.tokenizer
        new_segments: List[Segment] = []
        for s, result, size in zip(batch, results, sizes):
            segs, new_seek = extract_window_segments(
                result, s.seek, size, tok, no_speech_threshold, logprob_threshold
            )
            s.seek = new_seek
            for seg in segs:
                seg.id = len(s.segments)
                s.segments.append(seg)
                s.all_tokens.extend(seg.tokens)
                new_segments.append(seg)
            if not condition_on_previous_text or result.temperature > 0.5:
                s.prompt_reset_since = len(s.all_tokens)
            if s.seek >= s.content_frames:
                s.done = True
        return new_segments

    # --------------------------------------------------------------
    def _device_flow_ok(self, streams, opts, temperature, no_speech_threshold) -> bool:
        """The device-resident window-advance flow (parallel/deviceflow.py)
        engages when the host makes no data-dependent decision between
        windows: greedy single-temperature decoding (no fallback re-decode).
        The no-speech window skip is computed ON DEVICE by
        ``advance_window_state`` so quality thresholds stay on the fast path.
        WTT_DEVICE_FLOW=0 forces the host loop (used by the equivalence
        tests)."""
        return (
            os.environ.get("WTT_DEVICE_FLOW", "1") != "0"
            and len(temperature) == 1
            and float(temperature[0]) == 0.0
            and (opts.best_of or 1) <= 1
            and not opts.beam_size
            and not opts.without_timestamps
            and not opts.prefix
            and len(streams) <= self.batch_size
            and self.tail_batch is None
        )

    def _run_device_flow(
        self,
        streams: List[_Stream],
        opts: DecodingOptions,
        t0: float,
        *,
        no_speech_threshold: Optional[float],
        logprob_threshold: Optional[float],
        condition_on_previous_text: bool,
        rng_seed: int,
        window_hook,
    ) -> Dict[str, List[Segment]]:
        """Pipelined window loop with device-resident advance state.

        Window 0 is dispatched from host-built prompts (uniform promptless
        rows hit the small prompt-region program; this also covers
        initial_prompt seeding), but its outputs are NOT processed before the
        loop: the device advance state is chained off its device token buffer,
        so window 1 dispatches as soon as window 0's done mask lands. Every
        window is dispatched from jitted state — seek, done mask, rolling
        prompt history — chained straight off the previous decode's device
        outputs, so the host never sits between two windows waiting for
        tokens. The host drains outputs one iteration behind (segment
        bookkeeping, the fetch/unpack, and the alignment hook all overlap the
        next window's execution) and blocks only on the tiny per-iteration
        done mask. Host and device seek states are cross-checked every
        iteration; divergence raises instead of silently decoding wrong
        windows."""
        from ..decoding import PROMPT_REGION, PROMPT_REGION_SMALL
        from .deviceflow import (
            advance_window_state,
            build_prompt_batch,
            initial_state,
            pack_host_outputs,
            split_host_outputs,
        )

        engine = self.engine
        tok = engine.tokenizer
        B = self.batch_size
        H = engine.dims.n_text_ctx // 2 - 1
        eot, ts_begin = tok.eot, tok.timestamp_begin
        n_streams = len(streams)

        def put(tree):
            if self.mesh is None:
                return tree
            from .mesh import place_batch

            return place_batch(tree, self.mesh)

        def active_snapshot():
            act = [s for s in streams if not s.done and s.seek < s.content_frames]
            return act, [min(N_FRAMES, s.content_frames - s.seek) for s in act]

        def fetch(tok_np, lp_np, sum_np, nsp_np, out):
            # Host-side build from the packed read; in host-alignment mode the
            # big attention/ts buffers are additionally fetched here — which
            # MUST run while no decode is in flight: tunnel reads issued
            # after a dispatch block until that execution completes
            # (measured: ~decode-time per read otherwise)
            with stage_timer("decode_fetch_unpack"):
                return engine.build_window_results(
                    tok_np, lp_np, sum_np, nsp_np, out, t0,
                    fetch_alignment=self.fetch_alignment,
                )

        hook_prepare = getattr(window_hook, "prepare", None)

        def extract(results, act, sizes):
            """Host bookkeeping + hook phase 1 (prepare), run in the idle gap
            right after a window's outputs land: the prepare phase's batched
            end-repair read must hit an idle device (a read issued behind an
            in-flight decode blocks until that decode completes)."""
            segs = self._apply_window_results(
                act, [results[s.row] for s in act], sizes,
                no_speech_threshold, logprob_threshold, condition_on_previous_text,
            )
            prep = (
                hook_prepare(segs)
                if (hook_prepare is not None and window_hook is not None and segs)
                else None
            )
            return segs, prep

        def run_hook(segs, prep) -> None:
            """Hook phase 2 (align dispatch): overlaps the next decode."""
            if window_hook is not None and segs:
                window_hook(segs, prep) if hook_prepare is not None else window_hook(segs)

        def check_seeks(seeks):
            for s in streams:
                if int(seeks[s.row]) != s.seek:
                    raise RuntimeError(
                        f"device-flow seek divergence for {s.name}: "
                        f"device {int(seeks[s.row])} vs host {s.seek}"
                    )

        act0, sizes0 = active_snapshot()
        if not act0:
            return {s.name: s.segments for s in streams}

        # ---- device state BEFORE window 0 (hist carries any initial_prompt
        # seed; it only feeds prompts when conditioning is on) ----
        state, frames_dev = initial_state(
            [s.all_tokens[s.prompt_reset_since:] for s in streams],
            [s.seek for s in streams],
            [s.content_frames for s in streams],
            B, H, eot, place=put,
        )
        rows_dev = jnp.asarray(
            np.asarray([s.row for s in streams] + [0] * (B - n_streams), np.int32)
        )
        S = 3 if tok.is_multilingual else 1
        sot_np = np.full((B, S), tok.sot, np.int32)
        if tok.is_multilingual:
            task_tok = tok.translate if opts.task == "translate" else tok.transcribe
            for i in range(B):
                lang = streams[i].language if i < n_streams else None
                sot_np[i, 1] = tok.to_language_token(lang or opts.language or "en")
                sot_np[i, 2] = task_tok
        sot_dev = put(jnp.asarray(sot_np))
        if not condition_on_previous_text:
            cbuf = np.full((B, PROMPT_REGION_SMALL), eot, np.int32)
            cbuf[:, PROMPT_REGION_SMALL - S:] = sot_np
            const_prompt = put(jnp.asarray(cbuf))
            const_plen = put(jnp.asarray(np.full((B,), S, np.int32)))

        def start_async_copies(*arrays):
            for arr in arrays:
                copy_async = getattr(arr, "copy_to_host_async", None)
                if copy_async is not None:
                    copy_async()

        # ---- window 0: host-built prompts, device-chained state ----
        prompts0 = [s.all_tokens[s.prompt_reset_since:] for s in streams] + \
            [[]] * (B - n_streams)
        langs0 = [s.language for s in streams] + [None] * (B - n_streams)
        mels0 = self._gather_windows([s.row for s in streams], [s.seek for s in streams])
        with stage_timer("devflow_dispatch"):
            out0 = self._dispatch_batch(
                mels0, prompts0, opts, t0, rng_seed + 104729, langs0
            )
            state = advance_window_state(
                out0["tokens"], state, frames_dev, eot=eot, ts_begin=ts_begin,
                no_speech_prob=out0["no_speech_prob"],
                sum_logprobs=out0["sum_logprobs"],
                no_speech_threshold=no_speech_threshold,
                logprob_threshold=logprob_threshold,
            )
            packed = pack_host_outputs(
                out0["tokens"], out0["token_logprobs"], out0["sum_logprobs"],
                out0["no_speech_prob"], state,
            )
        M = int(out0["tokens"].shape[1])
        # exactly ONE outstanding copy ahead of the blocking read: extra
        # outstanding copies queue tunnel round trips in front of it
        # (measured ~+1.4 s/window with several in flight)
        start_async_copies(packed)

        pending = (out0, act0, sizes0)
        it = 1
        while True:
            # ONE blocking read per window: lands this window's done mask,
            # seek state AND its small outputs together (pack_host_outputs)
            with stage_timer("devflow_done_fetch"):
                p = np.asarray(packed)
            tok_np, lp_np, sum_np, nsp_np, done, seeks = split_host_outputs(p, M)
            p_out, p_act, p_sizes = pending
            p_results = fetch(tok_np, lp_np, sum_np, nsp_np, p_out)
            # idle-gap work: bookkeeping + the hook's prepare phase (its
            # batched end-repair read needs the device idle)
            segs, prep = extract(p_results, p_act, p_sizes)
            check_seeks(seeks)
            if bool(done[:n_streams].all()):
                run_hook(segs, prep)
                break
            p_act, p_sizes = active_snapshot()  # mirror == dispatch-time state
            mels = _slice_windows_jit(self._mel_stack, rows_dev, state.seek)
            if condition_on_previous_text:
                prompt, plen = build_prompt_batch(
                    state.hist, state.count, sot_dev,
                    region=PROMPT_REGION, eot=eot, sot_prev=tok.sot_prev,
                )
            else:
                prompt, plen = const_prompt, const_plen
            with stage_timer("devflow_dispatch"):
                out = self._dispatch_arrays(
                    mels, prompt, plen, opts, t0,
                    rng_seed + 104729 * (it + 1), sot_index_from_end=S,
                )
                state = advance_window_state(
                    out["tokens"], state, frames_dev, eot=eot, ts_begin=ts_begin,
                    no_speech_prob=out["no_speech_prob"],
                    sum_logprobs=out["sum_logprobs"],
                    no_speech_threshold=no_speech_threshold,
                    logprob_threshold=logprob_threshold,
                )
                packed = pack_host_outputs(
                    out["tokens"], out["token_logprobs"], out["sum_logprobs"],
                    out["no_speech_prob"], state,
                )
            start_async_copies(packed)

            # hook phase 2 rides behind this window's execution (it only
            # DISPATCHES device programs; results resolve at assembly time)
            run_hook(segs, prep)
            pending = (out, p_act, p_sizes)
            it += 1

        logger.debug("device flow: %d window iterations", it)
        return {s.name: s.segments for s in streams}

    # --------------------------------------------------------------
    def transcribe_streams(
        self,
        audios: Dict[str, Any],  # name -> path/array
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
        rng_seed: int = 0,
        window_hook=None,
        prepared: Optional[PreparedAudio] = None,
    ) -> Dict[str, List[Segment]]:
        """Decode all streams; returns name -> alignment-ready segments.

        ``window_hook(segments)`` is invoked after every batched window step
        with that step's newly extracted segments — the device-alignment mode
        uses it to consume (and release) each step's attention buffer instead
        of retaining every buffer until the whole run finishes."""
        engine = self.engine
        tok = engine.tokenizer
        dims = engine.dims
        if isinstance(temperature, (int, float)):
            temperature = [float(temperature)]

        if language is None and not tok.is_multilingual:
            language = "en"

        opts = DecodingOptions(
            **{**(decode_options.__dict__ if decode_options else DecodingOptions().__dict__),
               "task": task, "language": language}
        )

        # Mel front-end (see prepare_audio_batch) — or a PreparedAudio handed
        # in by a serving loop that uploaded this batch while the previous
        # batch's decode occupied the device (transcribe_batch_stream).
        with stage_timer("batch_mel"):
            if prepared is None:
                prepared = prepare_audio_batch(audios, dims.n_mels)
            elif prepared.names != list(audios):
                raise ValueError(
                    "prepared audio batch does not match the streams: "
                    f"{prepared.names} vs {list(audios)}"
                )
            self._mel_stack = prepared.mel_stack
            lengths = prepared.lengths

        streams: List[_Stream] = []
        for row, (name, n_samples) in enumerate(zip(audios, lengths)):
            streams.append(
                _Stream(
                    name=name,
                    row=row,
                    # same value the per-stream mel would give: frame count
                    # minus the 30-s padding (HOP divides N_SAMPLES exactly)
                    content_frames=n_samples // HOP_LENGTH,
                    language=language,
                )
            )

        if initial_prompt:
            # seeds every stream's history exactly like the serial loop
            # (engine.transcribe_windows / reference transcribe.py:201-204)
            ip_tokens = tok.encode(" " + initial_prompt.strip())
            for s in streams:
                s.all_tokens.extend(ip_tokens)

        if language is None:
            # per-stream language ID over the first windows, batched
            # (the reference detects per file, transcribe.py:817-867)
            self._detect_stream_languages(streams)
        self.stream_meta = {
            s.name: {"language": s.language, "language_probs": s.language_probs}
            for s in streams
        }

        if self._device_flow_ok(streams, opts, temperature, no_speech_threshold):
            return self._run_device_flow(
                streams, opts, float(temperature[0]),
                no_speech_threshold=no_speech_threshold,
                logprob_threshold=logprob_threshold,
                condition_on_previous_text=condition_on_previous_text,
                rng_seed=rng_seed,
                window_hook=window_hook,
            )

        B = self.batch_size
        n_iter = 0
        # window_hook runs one iteration LATE: its device work and host fetch
        # (e.g. the device aligner's jumps transfer) ride behind the NEXT
        # window's decode execution instead of adding a blocking round trip
        # between iterations (tunnel latency is a real per-iteration cost).
        # Its PREPARE phase (which may read from the device) runs eagerly at
        # extraction time, while the device is idle.
        hook_prepare = getattr(window_hook, "prepare", None)
        pending_hook: List[tuple] = []  # [(segments, prepared-entries or None)]

        def flush_hook():
            for segs, prep in pending_hook:
                if hook_prepare is not None:
                    window_hook(segs, prep)
                else:
                    window_hook(segs)
            pending_hook.clear()

        while True:
            active = [s for s in streams if not s.done and s.seek < s.content_frames]
            if not active:
                break
            n_iter += 1
            B_eff = B
            if self.tail_batch and len(active) <= self.tail_batch:
                B_eff = self.tail_batch  # straggler phase: smaller program
            batch = active[:B_eff]
            prompts = []
            sizes = []
            languages: List[Optional[str]] = []
            for s in batch:
                # NOT gated on condition_on_previous_text: with conditioning
                # off, prompt_reset_since advances after every window, so only
                # window 0 sees a prompt (the initial_prompt seed) — whisper's
                # semantics (serial loop engine.py:644, reference
                # transcribe.py:201-204)
                prompts.append(s.all_tokens[s.prompt_reset_since:])
                sizes.append(min(N_FRAMES, s.content_frames - s.seek))
                languages.append(s.language)
            # pad the batch to the fixed size (row 0 repeated; results ignored)
            n_real = len(batch)
            prompts += [[]] * (B_eff - n_real)
            languages += [None] * (B_eff - n_real)
            mels = self._gather_windows(
                [s.row for s in batch], [s.seek for s in batch], batch=B_eff
            )

            # per-iteration key (the serial path varies its key per window via
            # rng_seed + seek, engine.py; reusing one key across iterations
            # would correlate the sampling noise of every window)
            it_seed = rng_seed + 104729 * n_iter
            logger.debug("window iteration %d: %d active streams", n_iter, n_real)
            beam_first = bool(opts.beam_size) and temperature[0] <= 0
            simple = temperature[0] <= 0 or (opts.best_of or 1) <= 1
            with stage_timer(f"batch_decode_b{B_eff}_a{n_real}"):
                if beam_first:
                    # whisper decodes with beam search at t==0 only; fallback
                    # temperatures sample (decode_with_fallback semantics,
                    # engine.py decode_with_fallback)
                    if window_hook is not None:
                        flush_hook()
                    results = engine.decode_window_beam_batch(
                        mels, opts, prompts, languages,
                    )
                elif simple:
                    out = self._dispatch_batch(
                        mels, prompts, opts, temperature[0], it_seed, languages
                    )
                    # start the device->host copies of the small outputs now:
                    # the transfers ride behind the align work below instead
                    # of costing their own round trip at unpack time
                    for k in ("tokens", "token_logprobs", "sum_logprobs",
                              "no_speech_prob"):
                        copy_async = getattr(out[k], "copy_to_host_async", None)
                        if copy_async is not None:
                            copy_async()
                    if window_hook is not None:
                        flush_hook()  # overlaps the decode
                    with stage_timer("decode_fetch_unpack"):
                        results = engine.unpack_window_outputs(
                            out, temperature[0],
                            fetch_alignment=self.fetch_alignment,
                        )
                else:
                    if window_hook is not None:
                        flush_hook()
                    results = self._decode_batch_best_of(
                        mels, prompts, opts, temperature[0], it_seed, languages
                    )

            # temperature fallback on the failing subset (batched re-decode)
            for ti, t in enumerate(temperature[1:], start=1):
                failing = [
                    i for i in range(n_real)
                    if needs_fallback(
                        results[i], compression_ratio_threshold, logprob_threshold,
                        no_speech_threshold,
                    )
                ]
                if not failing:
                    break
                n_pad = B_eff - len(failing)
                # fixed-shape device gather: one compiled program for any
                # failing-subset size
                sub_idx = jnp.asarray(np.asarray((failing + [0] * B_eff)[:B_eff], np.int32))
                sub_mels = jnp.take(mels, sub_idx, axis=0)
                sub_prompts = [prompts[i] for i in failing] + [[]] * n_pad
                sub_langs = [languages[i] for i in failing] + [None] * n_pad
                retry = self._decode_batch_best_of(
                    sub_mels, sub_prompts, opts, t, it_seed + ti, sub_langs
                )
                for k, i in enumerate(failing):
                    results[i] = retry[k]

            new_segments = self._apply_window_results(
                batch, results[:n_real], sizes,
                no_speech_threshold, logprob_threshold, condition_on_previous_text,
            )
            if new_segments and window_hook is not None:
                # prepare NOW (device idle after the unpack); align later
                prep = hook_prepare(new_segments) if hook_prepare is not None else None
                pending_hook.append((new_segments, prep))

        if window_hook is not None:
            flush_hook()
        return {s.name: s.segments for s in streams}


def transcribe_batch(
    model,
    audios: Dict[str, Any],
    tokenizer: Tokenizer,
    *,
    language: Optional[str] = None,
    batch_size: int = 8,
    mesh=None,
    compute_word_confidence: bool = True,
    detect_disfluencies: bool = False,
    remove_punctuation_from_words: bool = False,
    refine_whisper_precision: float = 0.5,
    min_word_duration: float = 0.02,
    remove_empty_words: bool = False,
    vad=False,
    device_alignment: Optional[bool] = None,
    engine: Optional[DecodeEngine] = None,
    _prepared: Optional[PreparedAudio] = None,
    _deferred_assembly: bool = False,
    **window_options,
) -> Dict[str, dict]:
    """High-level batched API: name -> full whisper-timestamped result dict.

    ``vad`` applies per-stream speech extraction on the host before the batched
    decode; word/segment timestamps are mapped back to original-audio time.
    ``device_alignment`` keeps attention on device and aligns with the batched
    Pallas cost+DTW kernels (default: ON on accelerators, OFF on CPU,
    WTT_DEVICE_ALIGN env overrides — see device_align.default_device_alignment).
    ``engine`` overrides the default DecodeEngine (custom attn dtype /
    int8 cross-KV / pre-attached mesh). ``_deferred_assembly`` (private, used
    by :func:`transcribe_batch_stream`) returns a zero-arg ``finish()``
    closure instead of results once the device decode is complete, so the
    align-fetch drain + host assembly can run off-thread while the next
    batch decodes."""
    from ..api import (
        align_and_score_segment,
        device_align_segments,
        finalize_transcription,
        prepare_segment_tokens,
        should_use_space,
    )
    from ..device_align import MAX_K, default_device_alignment
    from ..vad import check_vad_method, remove_non_speech

    device_alignment_explicit = device_alignment is not None
    if device_alignment is None:
        device_alignment = default_device_alignment()

    vad = check_vad_method(vad)
    converts: Dict[str, Any] = {}
    speech_activity: Dict[str, Any] = {}
    if vad is not None:
        preprocessed = {}
        for name, audio in audios.items():
            wav = load_audio(audio)
            speech, segs, convert = remove_non_speech(
                wav, method=vad, avoid_empty_speech=True
            )
            preprocessed[name] = speech
            converts[name] = convert
            speech_activity[name] = [{"start": s, "end": e} for (s, e) in segs]
        audios = preprocessed

    if engine is None:
        engine = DecodeEngine(model, tokenizer, mesh=mesh)
    elif mesh is not None and engine.mesh is None:
        engine.attach_mesh(mesh)
    decode_opts = window_options.get("decode_options")
    beam_mode = bool(decode_opts is not None and decode_opts.beam_size)
    if beam_mode:
        # beam windows carry no on-the-fly attention; alignment comes from a
        # batched teacher-forced pass with the naive engine's word semantics
        # (the reference forces its naive engine for beam too,
        # transcribe.py:233-245)
        if device_alignment and device_alignment_explicit:
            logger.warning(
                "beam_size uses teacher-forced (naive-engine) alignment; "
                "device_alignment does not apply to the beam pipeline"
            )
        # the naive pass needs per-stream host audio for segment re-windowing
        audios = {name: load_audio(a) for name, a in audios.items()}
    full_device = (
        device_alignment
        and not beam_mode
        and len(engine.align_heads) <= MAX_K
    )
    if device_alignment and not full_device and not beam_mode:
        # never downgrade silently when explicitly requested (the reference
        # warns on every such repair/fallback, e.g. transcribe.py:496-538);
        # the auto-resolved default degrades with an info line only
        reasons = []
        if len(engine.align_heads) > MAX_K:
            reasons.append(
                f"{len(engine.align_heads)} alignment heads exceed the device "
                f"aligner's capacity ({MAX_K})"
            )
        (logger.warning if device_alignment_explicit else logger.info)(
            "device_alignment %s but falling back to host alignment: %s",
            "requested" if device_alignment_explicit else "auto-enabled",
            "; ".join(reasons),
        )
    tail_batch = os.environ.get("WTT_TAIL_BATCH")
    bt = BatchTranscriber(
        engine, batch_size=batch_size, mesh=mesh, fetch_alignment=not full_device,
        tail_batch=int(tail_batch) if tail_batch else None,
    )

    refine_nframes = round(refine_whisper_precision / 0.02)

    # device-alignment mode: align each window step's segments as soon as the
    # step completes, then drop the step's attention buffer — retaining every
    # window's (B, max_new, K, T) buffer until the whole run finishes would
    # grow HBM linearly with audio length
    jumps_map: Dict[int, Any] = {}
    preps_map: Dict[int, Any] = {}
    pending_aligns: List[Tuple[list, Any]] = []

    def _prepare_step(new_segments: List[Segment]):
        """Phase 1 (host + one cheap batched device read): runs in the idle
        gap between a window's outputs landing and the next dispatch, so the
        end-repair rows never block behind an in-flight decode."""
        from ..api import prefetch_ts_repair_rows

        with stage_timer("batch_prepare"):
            ts_rows = prefetch_ts_repair_rows(new_segments, engine.tokenizer)
            return [
                (seg, prepare_segment_tokens(
                    seg, engine.tokenizer, ts_row=ts_rows.get(id(seg))))
                for seg in new_segments
            ]

    def _align_step(new_segments: List[Segment], entries=None) -> None:
        with stage_timer("batch_align"):
            if entries is None:
                entries = _prepare_step(new_segments)
            # dispatch the align programs + async jump copies only: the
            # resolver runs at assembly time, so the fetch never blocks the
            # window loop (the align compute itself queues behind the next
            # decode on the device)
            resolver = device_align_segments(
                entries, engine.tokenizer, refine_nframes, fetch=False,
                fetch_cost=detect_disfluencies,
            )
            for seg, p in entries:
                preps_map[id(seg)] = p
                # release the big device buffers (attention + ts logprobs)
                seg.window.attn_dev = None
                seg.window.ts_logprobs_dev = None
            pending_aligns.append((entries, resolver))

    _align_step.prepare = _prepare_step

    all_segments = bt.transcribe_streams(
        audios, language=language, prepared=_prepared,
        window_hook=_align_step if full_device else None, **window_options,
    )

    if beam_mode:
        results = _assemble_naive_batch(
            engine, bt, audios, all_segments,
            language=language,
            task=window_options.get("task", "transcribe"),
            batch_size=batch_size,
            refine_nframes=refine_nframes,
            refine_whisper_precision=refine_whisper_precision,
            remove_punctuation_from_words=remove_punctuation_from_words,
            compute_word_confidence=compute_word_confidence,
            detect_disfluencies=detect_disfluencies,
            remove_empty_words=remove_empty_words,
            min_word_duration=min_word_duration,
            converts=converts,
            speech_activity=speech_activity,
        )
        return (lambda: results) if _deferred_assembly else results

    # Everything past this point is align-fetch draining + pure host
    # assembly: no new device programs, and every engine/transcriber field it
    # needs is snapshotted here (stream_meta is REPLACED, never mutated, by
    # the next batch). The serving loop exploits that: with
    # ``_deferred_assembly=True`` it runs ``finish`` on a worker thread so
    # batch k's assembly (and the caller's serialization of batch k-1)
    # overlap batch k+1's decode on the device.
    stream_meta = bt.stream_meta

    def finish():
        for entries, resolver in pending_aligns:
            for (seg, _p), j in zip(entries, resolver()):
                jumps_map[id(seg)] = j
        return _assemble()

    def _assemble():
        results = {}
        assemble_timer = stage_timer("batch_assemble")
        assemble_timer.__enter__()
        for name, segments in all_segments.items():
            meta = stream_meta.get(name, {})
            stream_language = meta.get("language") or language or "en"
            use_space = should_use_space(stream_language)
            words: List[dict] = []
            seg_dicts: List[dict] = []
            for seg in segments:
                if full_device and preps_map.get(id(seg)) is None:
                    continue
                jumps = jumps_map.get(id(seg))
                cost = None
                if jumps is not None and detect_disfluencies:
                    jumps, cost = jumps
                ws, seg_dict = align_and_score_segment(
                    seg, engine.tokenizer, use_space=use_space,
                    refine_whisper_precision_nframes=refine_nframes,
                    remove_punctuation_from_words=remove_punctuation_from_words,
                    compute_word_confidence=compute_word_confidence,
                    include_punctuation_in_confidence=False,
                    detect_disfluencies=detect_disfluencies,
                    precomputed_jumps=jumps,
                    precomputed_cost=cost,
                    prepared=preps_map.get(id(seg)) if full_device else None,
                )
                if ws is None:
                    continue
                idx = len(seg_dicts)
                for w in ws:
                    w["idx_segment"] = idx
                seg_dict["id"] = idx
                seg_dicts.append(seg_dict)
                words.extend(ws)
            transcription = {
                "text": "".join(s["text"] for s in seg_dicts),
                "segments": seg_dicts,
                "language": stream_language,
            }
            if meta.get("language_probs") is not None:
                transcription["language_probs"] = meta["language_probs"]
            transcription = finalize_transcription(
                transcription, words,
                remove_empty_words=remove_empty_words,
                min_word_duration=min_word_duration,
                trust_whisper_timestamps=True,
                refine_whisper_precision=refine_whisper_precision,
                vad_convert=converts.get(name),
            )
            if name in speech_activity:
                transcription["speech_activity"] = speech_activity[name]
            results[name] = transcription
        assemble_timer.__exit__(None, None, None)
        return results

    if _deferred_assembly:
        return finish
    return finish()


def _assemble_naive_batch(
    engine: DecodeEngine,
    bt: BatchTranscriber,
    audios: Dict[str, np.ndarray],
    all_segments: Dict[str, List[Segment]],
    *,
    language: Optional[str],
    task: str,
    batch_size: int,
    refine_nframes: int,
    refine_whisper_precision: float,
    remove_punctuation_from_words: bool,
    compute_word_confidence: bool,
    detect_disfluencies: bool,
    remove_empty_words: bool,
    min_word_duration: float,
    converts: Dict[str, Any],
    speech_activity: Dict[str, Any],
) -> Dict[str, dict]:
    """Batched pass-2 assembly for beam-decoded streams.

    Beam windows carry no on-the-fly attention, so word timestamps come from
    the naive engine's teacher-forced alignment — but batched: every stream
    gets a ``naive_word_requests`` generator and ``drive_teacher_forced_batch``
    runs their segment forwards as shared batched programs (the reference
    realigns file-by-file, segment-by-segment, ``transcribe.py:1131``)."""
    from ..api import finalize_transcription, should_use_space
    from ..engine import TranscribeResult
    from ..engine_naive import drive_teacher_forced_batch, naive_word_requests

    gens = {}
    seg_dicts_map: Dict[str, List[dict]] = {}
    for name, segments in all_segments.items():
        meta = bt.stream_meta.get(name, {})
        stream_language = meta.get("language") or language or "en"
        whisper_segments = [seg.to_dict() for seg in segments]
        for i, s in enumerate(whisper_segments):
            s["id"] = i
        seg_dicts_map[name] = whisper_segments
        result = TranscribeResult(
            text="".join(s["text"] for s in whisper_segments),
            segments=segments,
            language=stream_language,
            language_probs=meta.get("language_probs"),
        )
        gens[name] = naive_word_requests(
            engine, audios[name], result, whisper_segments,
            language=stream_language,
            use_space=should_use_space(stream_language),
            task=task,
            trust_whisper_timestamps=True,
            refine_whisper_precision_nframes=refine_nframes,
            remove_punctuation_from_words=remove_punctuation_from_words,
            compute_word_confidence=compute_word_confidence,
            include_punctuation_in_confidence=False,
            detect_disfluencies=detect_disfluencies,
            verbose=False,
            min_word_duration=min_word_duration,
        )

    with stage_timer("batch_naive_align"):
        words_map = drive_teacher_forced_batch(engine, gens, batch_size=batch_size)

    results = {}
    with stage_timer("batch_assemble"):
        for name, whisper_segments in seg_dicts_map.items():
            meta = bt.stream_meta.get(name, {})
            stream_language = meta.get("language") or language or "en"
            transcription = {
                "text": "".join(s["text"] for s in whisper_segments),
                "segments": whisper_segments,
                "language": stream_language,
            }
            if meta.get("language_probs") is not None:
                transcription["language_probs"] = meta["language_probs"]
            transcription = finalize_transcription(
                transcription, words_map.get(name, []),
                remove_empty_words=remove_empty_words,
                min_word_duration=min_word_duration,
                trust_whisper_timestamps=True,
                refine_whisper_precision=refine_whisper_precision,
                vad_convert=converts.get(name),
            )
            if name in speech_activity:
                transcription["speech_activity"] = speech_activity[name]
            results[name] = transcription
    return results


def transcribe_batch_stream(
    model,
    batches,  # iterable of {name: path/array} dicts
    tokenizer: Tokenizer,
    *,
    engine: Optional[DecodeEngine] = None,
    mesh=None,
    **options,
):
    """Serving loop: transcribe a stream of batches, pipelining each batch's
    audio upload behind the previous batch's decode.

    Yields one ``{name: result_dict}`` per input batch, in order. While batch
    k's windows decode on the device, a worker thread loads batch k+1's audio,
    ships it host→device (the pipeline's single largest copy) and dispatches
    its mel — so at steady state the upload cost disappears from the critical
    path. Results are identical to calling :func:`transcribe_batch` per batch
    (the prepared mel is bit-identical; only the schedule changes).

    The reference has no serving story (strictly one file at a time,
    ``transcribe.py:3129``); this is the TPU-native replacement for running
    N processes against N GPUs.

    ``vad`` and beam decoding preprocess audio on the host per batch, so those
    modes run unpipelined (plain per-batch calls) — correct, just without the
    upload overlap.

    ``batches`` may block between items (e.g. a directory watcher): the
    prefetch runs on a daemon worker thread, so finished batches are yielded
    immediately and an idle source never wedges the consumer (or process
    exit).
    """
    import queue as queue_mod
    import threading

    if engine is None:
        engine = DecodeEngine(model, tokenizer, mesh=mesh)
    elif mesh is not None and engine.mesh is None:
        engine.attach_mesh(mesh)
    decode_opts = options.get("decode_options")
    pipelined = not options.get("vad") and not (
        decode_opts is not None and decode_opts.beam_size
    )

    it = iter(batches)
    if not pipelined:
        for audios in it:
            yield transcribe_batch(
                model, audios, tokenizer, engine=engine, **options
            )
        return

    n_mels = engine.dims.n_mels
    done = object()
    q: Any = queue_mod.Queue(maxsize=1)
    stop = threading.Event()

    def worker():
        try:
            for audios in it:
                prepared = prepare_audio_batch(audios, n_mels)
                # maxsize=1: at most one finished preparation queued (plus
                # one in flight) — bounds device-resident mel stacks to ~3
                q.put((audios, prepared))
                if stop.is_set():
                    return
            q.put(done)
        except BaseException as exc:  # re-raised on the consumer side
            q.put(exc)

    t = threading.Thread(target=worker, daemon=True, name="wtt-prefetch")
    t.start()
    # Assembly runs one batch behind on its own worker thread:
    # transcribe_batch returns a finish() closure as soon as the device
    # decode completes; the closure (align-jump fetches + pure host assembly)
    # executes while the NEXT batch's decode occupies the device, and results
    # still yield in order. Combined with the prefetch thread, the steady
    # state is upload(k+1) | decode(k) | assemble(k-1) in flight at once.
    from concurrent.futures import ThreadPoolExecutor

    finisher = ThreadPoolExecutor(max_workers=1, thread_name_prefix="wtt-assemble")
    prev_fut = None
    try:
        pending_item = None
        while True:
            item = pending_item if pending_item is not None else q.get()
            pending_item = None
            if item is done or isinstance(item, BaseException):
                # flush the deferred batch BEFORE ending/raising: its decode
                # finished; a source failure must not discard its results
                if prev_fut is not None:
                    yield prev_fut.result()
                    prev_fut = None
                if item is done:
                    return
                raise item
            audios, prepared = item
            finish = transcribe_batch(
                model, audios, tokenizer, engine=engine,
                _prepared=prepared, _deferred_assembly=True, **options,
            )
            # Defer assembly only when the next batch is already (about to
            # be) queued — with an idle/blocking source, finish NOW so a
            # completed batch is never held hostage to the source's pace.
            try:
                pending_item = q.get(timeout=0.2)
            except queue_mod.Empty:
                pending_item = None
            if pending_item is None:
                if prev_fut is not None:
                    yield prev_fut.result()
                    prev_fut = None
                yield finish()
            else:
                fut = finisher.submit(finish)
                if prev_fut is not None:
                    yield prev_fut.result()
                prev_fut = fut
    finally:
        stop.set()
        finisher.shutdown(wait=False, cancel_futures=True)
        try:  # unblock a worker waiting on a full queue; daemon=True
            q.get_nowait()  # guarantees it never pins process exit anyway
        except queue_mod.Empty:
            pass
