"""Two-pass ("naive") engine: full decode, then teacher-forced re-alignment.

Behavioral port of ``_transcribe_timestamped_naive`` (reference
``transcribe.py:1004-1338``): pass 1 is a normal long-form decode (greedy,
beam search, or best_of sampling — whisper's strategies), pass 2 re-runs each
segment's audio window through a teacher-forced forward to collect full
cross-attention matrices and log-probabilities for word alignment and
confidence. Used for ``beam_size``/``best_of>1``/
``trust_whisper_timestamps=False``/``naive_approach=True``.

Faithfully-kept reference quirks (goldens pin them):
  * attention rows are taken from position ``i_start-1`` on — the row that
    *predicts* each token (reference ``transcribe.py:1252``; the reference
    uses this predicting-row convention in BOTH engines, and so do we);
  * the punctuation-stripping condition in word confidence is inverted
    relative to the efficient path (reference ``transcribe.py:1285-1292``).
"""

from __future__ import annotations

import functools
import logging
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from .alignment import (
    _punctuation,
    perform_word_alignment,
    round_confidence,
)
from .audio import (
    AUDIO_TIME_PER_TOKEN,
    HOP_LENGTH,
    N_FRAMES,
    N_SAMPLES_PER_TOKEN,
    SAMPLE_RATE,
    log_mel_spectrogram,
    pad_or_trim,
)
from .decoding import DecodingOptions
from .engine import DecodeEngine, transcribe_windows
from .languages import LANGUAGES_WITHOUT_SPACES, normalize_language
from .models.whisper_jax import decode_full, encode

logger = logging.getLogger("whisper_timestamped_tpu")

SEGMENT_DURATION = 30.0


def _teacher_forced(engine: DecodeEngine, mel: np.ndarray, tokens: List[int]):
    """One teacher-forced forward. Returns (logprobs (S, V) f32,
    cross-attention rows for the alignment heads (S, K, T))."""
    params = engine.model.params
    dims = engine.dims
    xa = encode(params, jnp.asarray(mel[None], jnp.float32), dims)
    logits, ws = decode_full(
        params, jnp.asarray([tokens], jnp.int32), xa, dims, return_cross_attn=True
    )
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # ws: (L, B, H, S, T) pre-softmax scores; select alignment heads ON DEVICE
    # (fetching the full stack first would move ~1 GB/segment at large-v3 when
    # only the K alignment-head rows are needed) -> (S, K, T)
    layer_idx = jnp.asarray([l for l, _ in engine.align_heads])
    head_idx = jnp.asarray([h for _, h in engine.align_heads])
    rows = np.asarray(ws[layer_idx, 0, head_idx])  # (K, S, T)
    return np.asarray(logprobs)[0], np.transpose(rows, (1, 0, 2))


def transcribe_naive(
    engine: DecodeEngine,
    audio: np.ndarray,
    *,
    language: Optional[str],
    task: str,
    temperatures: Sequence[float],
    best_of: Optional[int],
    beam_size: Optional[int],
    patience: Optional[float],
    length_penalty: Optional[float],
    compression_ratio_threshold: Optional[float],
    logprob_threshold: Optional[float],
    no_speech_threshold: Optional[float],
    condition_on_previous_text: bool,
    initial_prompt: Optional[str],
    suppress_tokens,
    sample_len: Optional[int],
    seed: Optional[int],
    trust_whisper_timestamps: bool,
    use_backend_timestamps: bool,
    refine_whisper_precision_nframes: int,
    remove_punctuation_from_words: bool,
    compute_word_confidence: bool,
    include_punctuation_in_confidence: bool,
    detect_disfluencies: bool,
    verbose,
    min_word_duration: float = 0.0,
    plot_word_alignment=False,
):
    tok = engine.tokenizer
    refine_sec = refine_whisper_precision_nframes * AUDIO_TIME_PER_TOKEN
    audio = np.asarray(audio, np.float32)
    audio_duration = audio.shape[-1] / SAMPLE_RATE

    opts = DecodingOptions(
        beam_size=beam_size,
        best_of=best_of,
        patience=patience,
        length_penalty=length_penalty,
        suppress_tokens=suppress_tokens,
        sample_len=sample_len,
    )
    if verbose and language is None and tok.is_multilingual:
        # whisper's pre-detection message (reference transcribe.py:1030-1032)
        print(
            "Detecting language using up to the first 30 seconds. "
            "Use `--language` to specify the language"
        )
    result = transcribe_windows(
        engine,
        audio,
        language=language,
        task=task,
        temperature=list(temperatures),
        compression_ratio_threshold=compression_ratio_threshold,
        logprob_threshold=logprob_threshold,
        no_speech_threshold=no_speech_threshold,
        condition_on_previous_text=condition_on_previous_text,
        initial_prompt=initial_prompt,
        decode_options=opts,
        return_language_probs=language is None,
        rng_seed=seed or 0,
        # pass 1 only needs attention when it serves as the "backend" word
        # timestamps; otherwise the teacher-forced pass 2 supplies alignment
        # and capturing/fetching the (B, max_new, K, 1500) buffer per window
        # would be pure waste
        fetch_alignment=use_backend_timestamps,
        capture_attention=use_backend_timestamps,
    )
    if verbose and language is None and result.language is not None:
        # whisper's detection message (reference transcribe.py:1073-1076)
        from .api import LANGUAGE_NAMES

        print(f"Detected language: {LANGUAGE_NAMES.get(result.language, result.language)}")
    language = normalize_language(result.language) if result.language else language
    from .api import should_use_space

    use_space = should_use_space(language)

    whisper_segments = [seg.to_dict() for seg in result.segments]
    for i, s in enumerate(whisper_segments):
        s["id"] = i

    have_attention = all(
        seg.window is not None
        and seg.window.attn is not None
        and seg.window.attn.size
        for seg in result.segments
    )
    if use_backend_timestamps and not have_attention:
        logger.warning(
            "use_backend_timestamps unavailable for beam-decoded windows "
            "(no on-the-fly attention); using teacher-forced alignment"
        )
    if use_backend_timestamps and have_attention:
        # BACKEND-computed timestamps: the HF generate(return_token_timestamps)
        # algorithm the reference delegates to (transcribe.py:2667-2806) —
        # z-score + median(7) + DTW over the decode pass's own attention, a
        # DIFFERENT algorithm than whisper-timestamped's aligner — then the
        # naive engine's early return (transcribe.py:1079-1091).
        from .backend_timestamps import backend_words_for_window, hf_token_timestamps

        words: List[dict] = []
        groups: List[List[int]] = []
        for i, seg in enumerate(result.segments):
            if groups and result.segments[groups[-1][-1]].window is seg.window:
                groups[-1].append(i)
            else:
                groups.append([i])
        for group in groups:
            window = result.segments[group[0]].window
            if not len(window.tokens):
                continue
            token_times = hf_token_timestamps(window.attn)
            words.extend(
                backend_words_for_window(
                    window.tokens,
                    token_times,
                    [(i, result.segments[i].token_span) for i in group],
                    tok,
                    use_space=use_space,
                    remove_punctuation_from_words=remove_punctuation_from_words,
                    time_offset=result.segments[group[0]].seek
                    * HOP_LENGTH
                    / SAMPLE_RATE,
                )
            )
        transcription = _make_transcription(whisper_segments, result)
        return transcription, words

    gen = naive_word_requests(
        engine, audio, result, whisper_segments,
        language=language, use_space=use_space, task=task,
        trust_whisper_timestamps=trust_whisper_timestamps,
        refine_whisper_precision_nframes=refine_whisper_precision_nframes,
        remove_punctuation_from_words=remove_punctuation_from_words,
        compute_word_confidence=compute_word_confidence,
        include_punctuation_in_confidence=include_punctuation_in_confidence,
        detect_disfluencies=detect_disfluencies,
        verbose=verbose,
        min_word_duration=min_word_duration,
        plot_word_alignment=plot_word_alignment,
    )
    words = drive_teacher_forced_serial(gen, engine)

    transcription = _make_transcription(whisper_segments, result)
    return transcription, words


def drive_teacher_forced_serial(gen, engine: DecodeEngine) -> List[dict]:
    """Serial driver for ``naive_word_requests``: one teacher-forced forward
    per request. The batched pipeline drives many streams' generators in
    lock-step instead (``drive_teacher_forced_batch``)."""
    try:
        req = next(gen)
        while True:
            req = gen.send(_teacher_forced(engine, *req))
    except StopIteration as e:
        return e.value if e.value is not None else []


def drive_teacher_forced_batch(
    engine: DecodeEngine, gens: dict, batch_size: int = 8
) -> dict:
    """Drive many streams' ``naive_word_requests`` generators in lock-step.

    Each stream's request sequence is serial (segment windows depend on the
    previous segment's aligned end), but STREAMS are independent: every round
    batches the current request of up to ``batch_size`` live streams into one
    teacher-forced program (token lengths bucketed so a handful of compiled
    shapes covers the run). Returns name -> words. New capability of the
    batched pipeline — the reference is strictly serial (its engine loops
    file-by-file, segment-by-segment, reference ``transcribe.py:1131``)."""
    live = {}
    words: dict = {}
    for name, gen in gens.items():
        try:
            live[name] = (gen, gen.send(None))
        except StopIteration as e:
            words[name] = e.value if e.value is not None else []
    while live:
        names = list(live)[:batch_size]
        reqs = [live[n][1] for n in names]
        outs = _teacher_forced_batch(engine, reqs)
        for n, out in zip(names, outs):
            gen = live[n][0]
            try:
                live[n] = (gen, gen.send(out))
            except StopIteration as e:
                del live[n]
                words[n] = e.value if e.value is not None else []
    return words


def _bucket_len(n: int) -> int:
    """Pad token counts to a small set of static shapes (one compile each)."""
    for b in (32, 64, 128, 256):
        if n <= b:
            return b
    return 448 + 2  # sot_seq(<=4) + ts + tokens never exceeds n_text_ctx


def _teacher_forced_batch(engine: DecodeEngine, reqs):
    """Batched counterpart of ``_teacher_forced``: one encoder+decoder
    program over S segments (right-padded tokens; causal self-attention makes
    the pad tail invisible to valid prefix rows). Returns per-request
    (logprobs (S_i, V) f32, attention rows (S_i, K, T))."""
    params = engine.model.params
    dims = engine.dims
    S = len(reqs)
    lens = [len(t) for _, t in reqs]
    L = _bucket_len(max(lens))
    mels = np.stack([np.asarray(m, np.float32) for m, _ in reqs])
    toks = np.full((S, L), engine.tokenizer.eot, np.int32)
    for i, (_, t) in enumerate(reqs):
        toks[i, : len(t)] = t
    layer_idx = jnp.asarray([l for l, _ in engine.align_heads])
    head_idx = jnp.asarray([h for _, h in engine.align_heads])
    logprobs, rows = _teacher_forced_batch_jit(
        params, jnp.asarray(mels), jnp.asarray(toks), layer_idx, head_idx,
        dims=dims,
    )
    logprobs = np.asarray(logprobs)
    rows = np.asarray(rows)
    return [
        (logprobs[i, : lens[i]], rows[i, : lens[i]])
        for i in range(S)
    ]


@functools.partial(jax.jit, static_argnames=("dims",))
def _teacher_forced_batch_jit(params, mels, tokens, layer_idx, head_idx, *, dims):
    xa = encode(params, mels, dims)
    logits, ws = decode_full(params, tokens, xa, dims, return_cross_attn=True)
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # ws: (L, S, H, T_tok, T_aud) pre-softmax scores; alignment-head rows
    # selected ON DEVICE (the full stack would be GBs at large-v3)
    rows = ws[layer_idx, :, head_idx]  # (K, S, T_tok, T_aud)
    return logprobs, jnp.transpose(rows, (1, 2, 0, 3))


def naive_word_requests(
    engine: DecodeEngine,
    audio: np.ndarray,
    result,
    whisper_segments: List[dict],
    *,
    language: Optional[str],
    use_space: bool,
    trust_whisper_timestamps: bool,
    refine_whisper_precision_nframes: int,
    remove_punctuation_from_words: bool,
    compute_word_confidence: bool,
    include_punctuation_in_confidence: bool,
    detect_disfluencies: bool,
    verbose,
    min_word_duration: float = 0.0,
    task: str = "transcribe",
    plot_word_alignment=False,
):
    """Per-stream word-extraction generator (pass 2 of the naive engine).

    Yields ``(mel, tokens_tf)`` teacher-forced requests and receives
    ``(logprobs, attn_all)`` via ``send``; returns the stream's word list.
    The request points are the ONLY device work in the loop, so a driver can
    batch requests across independent streams (the per-stream sequence is
    inherently serial: each segment's refined window depends on the previous
    segment's aligned end, reference ``transcribe.py:1137-1174``)."""
    tok = engine.tokenizer
    refine_sec = refine_whisper_precision_nframes * AUDIO_TIME_PER_TOKEN
    audio = np.asarray(audio, np.float32)
    audio_duration = audio.shape[-1] / SAMPLE_RATE

    words: List[dict] = []
    previous_end = 0.0
    current_tokens: List[int] = []
    token_to_idx_segment: List[int] = []

    for i_segment, seg in enumerate(result.segments):
        segment = whisper_segments[i_segment]
        start = end = tokens = None

        if trust_whisper_timestamps:
            start = segment["start"]
            end = segment["end"]
            if end < start:
                end = min(audio_duration, start + SEGMENT_DURATION)

            start_margin_min = start - refine_sec
            start_margin_max = start + refine_sec
            if start >= audio_duration - min_word_duration or (
                start_margin_min <= previous_end <= start_margin_max
            ):
                start = previous_end
            else:
                start = start_margin_min

            if start > audio_duration - min_word_duration:
                logger.warning("Skipping segment outside of audio duration")
                continue

            end_margin_min = end - refine_sec
            end_margin_max = end + refine_sec
            if i_segment < len(whisper_segments) - 1:
                end_margin_max2 = (
                    whisper_segments[i_segment + 1]["start"] + refine_sec - min_word_duration
                )
                if end_margin_max2 >= end_margin_min:
                    end_margin_max = min(end_margin_max2, end_margin_max)
            end = min(audio_duration, end_margin_max)

            if end < start + min_word_duration:
                end = min(audio_duration, start + min_word_duration)
                if end <= start:
                    logger.warning("Skipping short segment too close to the end")
                    continue
            tokens = list(segment["tokens"])
        else:
            seek = segment["seek"]
            new_tokens = list(segment["tokens"])
            if not new_tokens:
                continue
            if new_tokens[0] < tok.timestamp_begin:
                rel_start = segment["start"] - seek * HOP_LENGTH / SAMPLE_RATE
                new_tokens = [
                    round(rel_start * SAMPLE_RATE / N_SAMPLES_PER_TOKEN) + tok.timestamp_begin
                ] + new_tokens
            if new_tokens[-1] < tok.timestamp_begin:
                rel_end = segment["end"] - seek * HOP_LENGTH / SAMPLE_RATE
                new_tokens = new_tokens + [
                    round(rel_end * SAMPLE_RATE / N_SAMPLES_PER_TOKEN) + tok.timestamp_begin
                ]
            current_tokens.extend(new_tokens)
            token_to_idx_segment.extend([i_segment] * len(new_tokens))
            next_seek = (
                result.segments[i_segment + 1].seek
                if i_segment < len(result.segments) - 1
                else None
            )
            if seek != next_seek:
                start = float(seek * HOP_LENGTH / SAMPLE_RATE)
                end = min(start + SEGMENT_DURATION, audio_duration)
                tokens = current_tokens

        if tokens is None or not len(tokens):
            continue

        start_sample = min(round(start * SAMPLE_RATE), audio.shape[-1])
        end_sample = min(round(end * SAMPLE_RATE), audio.shape[-1])

        sub_audio = audio[start_sample:end_sample]
        if sub_audio.shape[-1] <= 200:  # minimum padding (reference :1353)
            sub_audio = pad_or_trim(sub_audio, 201)
        mel = np.asarray(log_mel_spectrogram(sub_audio, n_mels=engine.dims.n_mels))
        n_content_frames = mel.shape[-1]
        mel = pad_or_trim(mel, N_FRAMES, axis=-1)

        segment_tokens_check: List[int] = []
        if tokens[0] >= tok.timestamp_begin:
            segment_tokens_check.append(tokens[0])
        while tokens[0] >= tok.timestamp_begin:
            tokens = tokens[1:]
            assert len(tokens), "Got transcription with only timestamps!"
        last_token_check = None
        while tokens[-1] >= tok.timestamp_begin:
            last_token_check = tokens[-1]
            tokens = tokens[:-1]

        sot_sequence = [tok.sot]
        if tok.is_multilingual:
            sot_sequence += [
                tok.to_language_token(language or "en"),
                tok.translate if task == "translate" else tok.transcribe,
            ]
        tokens_tf = [*sot_sequence, tok.timestamp_begin] + tokens
        i_start = len(sot_sequence)

        logprobs, attn_all = yield (mel, tokens_tf)

        end_token = tok.timestamp_begin + round(
            min(N_FRAMES * HOP_LENGTH, end_sample - start_sample) // N_SAMPLES_PER_TOKEN
        )
        tokens_align = tokens_tf[i_start:] + [end_token]
        # rows from i_start-1: the row PREDICTING each aligned token (:1252)
        attn_rows = attn_all[i_start - 1 :]

        max_duration = n_content_frames // 2 if n_content_frames < N_FRAMES else None
        ws = perform_word_alignment(
            tokens_align,
            attn_rows,
            tok,
            use_space=use_space,
            max_duration=max_duration,
            refine_whisper_precision_nframes=refine_whisper_precision_nframes,
            remove_punctuation_from_words=remove_punctuation_from_words,
            detect_disfluencies=detect_disfluencies,
            # teacher-forced pass plots too (reference transcribe.py:1251)
            plot=plot_word_alignment,
            plot_mfcc=np.asarray(mel) if plot_word_alignment else None,
        )

        segment_logprobs: List[np.ndarray] = []
        i_token = 1
        i_start_conf = i_start
        for word in ws:
            word["start"] = round(word["start"] + start, 2)
            word["end"] = round(word["end"] + start, 2)

            if trust_whisper_timestamps:
                word["idx_segment"] = i_segment
            else:
                assert i_token < len(tokens_align)
                word["idx_segment"] = token_to_idx_segment[i_token]
                i_token += len(word["tokens"])
                while i_token < len(tokens_align) and tokens_align[i_token] >= tok.timestamp_begin:
                    i_token += 1

            tok_indices = word["tokens_indices"]
            segment_tokens_check.extend(tok_indices)

            if compute_word_confidence:
                toks_w = word["tokens"]
                i_end_conf = i_start_conf + len(toks_w)
                if include_punctuation_in_confidence:  # reference quirk (:1285)
                    while (
                        len(toks_w) > 1 and len(toks_w[-1]) and toks_w[-1][-1] in _punctuation
                    ):
                        toks_w = toks_w[:-1]
                        tok_indices = tok_indices[:-1]
                word_logprobs = np.array(
                    [
                        logprobs[step, t]
                        for step, t in zip(
                            range(i_start_conf, i_start_conf + len(tok_indices)), tok_indices
                        )
                    ]
                )
                i_start_conf = i_end_conf
                if len(word_logprobs):
                    segment_logprobs.append(word_logprobs)
                    word_confidence = float(np.exp(word_logprobs.mean()))
                else:
                    word_confidence = 0.0
                word["confidence"] = round_confidence(word_confidence)

            words.append(word)
            if verbose:
                from .api import print_timestamped

                print_timestamped(word)

        if last_token_check is not None:
            segment_tokens_check.append(last_token_check)
        if trust_whisper_timestamps and segment_tokens_check != segment["tokens"]:
            if len(segment_tokens_check) < len(segment["tokens"]) and (
                segment_tokens_check[:-1]
                == segment["tokens"][: len(segment_tokens_check) - 1]
            ):
                segment["tokens"] = segment_tokens_check
                segment["text"] = tok.decode(segment["tokens"])
            else:
                logger.warning("Inconsistent tokens after teacher-forced alignment")

        if len(segment_logprobs):
            segment["confidence"] = round_confidence(
                float(np.exp(np.concatenate(segment_logprobs).mean()))
            )

        if len(ws):
            previous_end = ws[-1]["end"]

        if not trust_whisper_timestamps:
            current_tokens = []
            token_to_idx_segment = []

    return words


def _make_transcription(whisper_segments, result):
    transcription = {
        "text": "".join(s["text"] for s in whisper_segments),
        "segments": whisper_segments,
        "language": result.language,
    }
    if result.language_probs:
        transcription["language_probs"] = result.language_probs
    return transcription
