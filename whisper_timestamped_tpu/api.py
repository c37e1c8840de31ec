"""Public API: ``transcribe_timestamped`` — the orchestrator.

Port of the reference orchestrator (``transcribe_timestamped``,
``transcribe.py:79-357``) plus the per-segment work its *efficient engine*
does at flush time (``align_last_segment`` ``transcribe.py:482-579``, result
compilation + confidence ``transcribe.py:915-1002``). Because this framework
owns the decode loop, there is no efficient/naive split for attention capture:
every decode already emits alignment attention and token log-probabilities.
A true two-pass (teacher-forced) path exists for beam search / best_of
(``naive_approach``) — see engine_naive.py.
"""

from __future__ import annotations

import logging
import sys
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

from .alignment import (
    _punctuation,
    perform_word_alignment,
    round_confidence,
    round_timestamp,
)
from .audio import (
    AUDIO_TIME_PER_TOKEN,
    HOP_LENGTH,
    N_FRAMES,
    SAMPLE_RATE,
    load_audio,
    log_mel_spectrogram,
)
from .decoding import DecodingOptions
from .engine import DecodeEngine, Segment, transcribe_windows
from .languages import LANGUAGES_WITHOUT_SPACES, normalize_language
from .models.load import WhisperModel, load_model
from .postprocess import ensure_increasing_positions, remove_last_null_duration_words
from .tokenizer import Tokenizer, get_tokenizer
from .utils.profiling import stage_timer
from .vad import check_vad_method, remove_non_speech

logger = logging.getLogger("whisper_timestamped_tpu")


def should_use_space(language: Optional[str]) -> bool:
    return normalize_language(language or "en") not in LANGUAGES_WITHOUT_SPACES


from .writers import format_timestamp  # noqa: E402 (shared timestamp format)


def print_timestamped(w: dict) -> None:
    line = f"[{format_timestamp(w['start'])} --> {format_timestamp(w['end'])}] {w['text']}\n"
    sys.stdout.write(line.encode(sys.getdefaultencoding(), errors="replace").decode())
    sys.stdout.flush()


def _resolve_tokenizer(model: WhisperModel, tokenizer, language, task) -> Tokenizer:
    if isinstance(tokenizer, Tokenizer):
        tokenizer.language = normalize_language(language) if language else tokenizer.language
        tokenizer.task = task
        return tokenizer
    if isinstance(tokenizer, str):
        return get_tokenizer(
            multilingual=model.is_multilingual,
            num_languages=model.num_languages,
            language=language,
            task=task,
            vocab_path=tokenizer,
        )
    if model.tokenizer_ranks is not None:
        # derive the special-token layout from the actual vocabulary size:
        # n_vocab = n_base + 2 + n_langs + 6 + 1501
        n_base = max(model.tokenizer_ranks.values()) + 1
        n_langs = model.dims.n_vocab - n_base - 1509
        if not (0 < n_langs <= 100):
            n_langs = model.num_languages
        multilingual = (
            model.tokenizer_multilingual
            if model.tokenizer_multilingual is not None
            else model.is_multilingual
        )
        return get_tokenizer(
            multilingual=multilingual,
            num_languages=n_langs,
            language=language,
            task=task,
            ranks=model.tokenizer_ranks,
        )
    raise ValueError(
        "No tokenizer vocabulary available: pass tokenizer=<Tokenizer or "
        "path to .tiktoken/vocab.json>, or place the vocabulary next to the "
        "model checkpoint."
    )


def transcribe_timestamped(
    # Main options
    model: Union[WhisperModel, str],
    audio,
    language: Optional[str] = None,
    task: str = "transcribe",
    # Word-alignment options
    remove_punctuation_from_words: bool = False,
    compute_word_confidence: bool = True,
    include_punctuation_in_confidence: bool = False,
    refine_whisper_precision: float = 0.5,
    min_word_duration: float = 0.02,
    plot_word_alignment: Union[bool, str] = False,
    word_alignment_most_top_layers: Optional[int] = None,
    remove_empty_words: bool = False,
    use_backend_timestamps: bool = False,
    # Reproducibility
    seed: Optional[int] = 1234,
    vad=False,
    detect_disfluencies: bool = False,
    trust_whisper_timestamps: bool = True,
    naive_approach: bool = False,
    # Whisper decode options
    temperature=0.0,
    best_of: Optional[int] = None,
    beam_size: Optional[int] = None,
    patience: Optional[float] = None,
    length_penalty: Optional[float] = None,
    compression_ratio_threshold: Optional[float] = 2.4,
    logprob_threshold: Optional[float] = -1.0,
    no_speech_threshold: Optional[float] = 0.6,
    fp16=None,
    condition_on_previous_text: bool = True,
    initial_prompt: Optional[str] = None,
    suppress_tokens: Optional[str] = "-1",
    sample_len: Optional[int] = None,
    verbose: Optional[bool] = False,
    # TPU-framework extras
    tokenizer: Union[Tokenizer, str, None] = None,
    device_alignment: Optional[bool] = None,
) -> dict:
    """Transcribe audio with word-level timestamps and confidences.

    Option surface and result schema match the reference
    (``transcribe.py:79-120``; ``tests/json_schema.json``): a dict with
    ``text``, ``segments`` (each with ``words`` carrying text/start/end/
    confidence), ``language``, plus ``language_probs`` on auto-detection and
    ``speech_activity`` when VAD runs.

    ``device_alignment`` routes the alignment cost matrix + DTW through the
    Pallas kernels. Default (None): ON when the JAX backend is an accelerator
    (host fallback is automatic when gating conditions fail), OFF on CPU;
    the WTT_DEVICE_ALIGN env var ("1"/"0") overrides.
    """
    device_alignment_explicit = device_alignment is not None
    if device_alignment is None:
        from .device_align import default_device_alignment

        device_alignment = default_device_alignment()
    # --- validation (reference transcribe.py:227-245) ---
    assert (
        refine_whisper_precision >= 0
        and round(refine_whisper_precision / AUDIO_TIME_PER_TOKEN)
        == refine_whisper_precision / AUDIO_TIME_PER_TOKEN
    ), f"refine_whisper_precision must be a positive multiple of {AUDIO_TIME_PER_TOKEN}"
    refine_whisper_precision_nframes = round(refine_whisper_precision / AUDIO_TIME_PER_TOKEN)
    assert min_word_duration >= 0, "min_word_duration must be a positive number"
    assert (
        word_alignment_most_top_layers is None or word_alignment_most_top_layers > 0
    ), "word_alignment_most_top_layers must be a strictly positive number"

    if isinstance(temperature, (list, tuple)) and len(temperature) == 1:
        temperature = temperature[0]
    if beam_size is not None or (best_of or 0) > 1:
        naive_approach = True
    if use_backend_timestamps:
        naive_approach = True  # reference transcribe.py:245
    # trust_whisper_timestamps=False is supported by BOTH engines, as in the
    # reference: single-pass whole-window alignment
    # (_align_words_whole_windows, ref transcribe.py:585-707) or the naive
    # engine's per-chunk reconstruction (transcribe.py:1178-1202)

    if plot_word_alignment:
        from .plotting import reset_plot_counter

        reset_plot_counter()  # figure numbering restarts per call (ref :300-301)

    vad = check_vad_method(vad)
    if isinstance(model, str):
        model = load_model(model)
    if language is not None:
        language = normalize_language(language)

    tok = _resolve_tokenizer(model, tokenizer, language, task)

    # alignment heads (reference transcribe.py:259-261)
    alignment_heads = model.alignment_heads if word_alignment_most_top_layers is None else None
    if alignment_heads is None:
        top = word_alignment_most_top_layers or 6
        L, H = model.dims.n_text_layer, model.dims.n_text_head
        alignment_heads = [
            (l, h) for l in range(max(0, L - top), L) for h in range(H)
        ]
    engine = DecodeEngine(
        WhisperModel(
            params=model.params,
            dims=model.dims,
            alignment_heads=alignment_heads,
            model_name=model.model_name,
            tokenizer_ranks=model.tokenizer_ranks,
        ),
        tok,
    )

    audio = load_audio(audio)
    speech_convert = None
    vad_segments = None
    if vad is not None:
        audio, vad_segments, speech_convert = remove_non_speech(
            audio, method=vad, sample_rate=SAMPLE_RATE, avoid_empty_speech=True,
            plot=plot_word_alignment,
        )

    temperatures = (
        list(temperature) if isinstance(temperature, (list, tuple)) else [float(temperature)]
    )

    # with VAD, on-the-fly printing would show speech-time (pre-back-
    # conversion) timestamps, so live verbose is disabled and word lines are
    # printed after VAD back-conversion instead (the reference applies the
    # same rule, transcribe.py:286)
    live_verbose = verbose if (vad is None or verbose is not True) else False

    if naive_approach:
        from .engine_naive import transcribe_naive

        transcription, words = transcribe_naive(
            engine,
            audio,
            language=language,
            task=task,
            temperatures=temperatures,
            best_of=best_of,
            beam_size=beam_size,
            patience=patience,
            length_penalty=length_penalty,
            compression_ratio_threshold=compression_ratio_threshold,
            logprob_threshold=logprob_threshold,
            no_speech_threshold=no_speech_threshold,
            condition_on_previous_text=condition_on_previous_text,
            initial_prompt=initial_prompt,
            suppress_tokens=suppress_tokens,
            sample_len=sample_len,
            seed=seed,
            trust_whisper_timestamps=trust_whisper_timestamps,
            use_backend_timestamps=use_backend_timestamps,
            refine_whisper_precision_nframes=refine_whisper_precision_nframes,
            remove_punctuation_from_words=remove_punctuation_from_words,
            compute_word_confidence=compute_word_confidence,
            include_punctuation_in_confidence=include_punctuation_in_confidence,
            detect_disfluencies=detect_disfluencies,
            verbose=live_verbose,
            plot_word_alignment=plot_word_alignment,
        )
    else:
        transcription, words = _transcribe_efficient(
            engine,
            audio,
            language=language,
            task=task,
            temperatures=temperatures,
            compression_ratio_threshold=compression_ratio_threshold,
            logprob_threshold=logprob_threshold,
            no_speech_threshold=no_speech_threshold,
            condition_on_previous_text=condition_on_previous_text,
            initial_prompt=initial_prompt,
            suppress_tokens=suppress_tokens,
            sample_len=sample_len,
            seed=seed,
            refine_whisper_precision_nframes=refine_whisper_precision_nframes,
            remove_punctuation_from_words=remove_punctuation_from_words,
            compute_word_confidence=compute_word_confidence,
            include_punctuation_in_confidence=include_punctuation_in_confidence,
            detect_disfluencies=detect_disfluencies,
            verbose=live_verbose,
            plot_word_alignment=plot_word_alignment,
            device_alignment=device_alignment,
            device_alignment_explicit=device_alignment_explicit,
            trust_whisper_timestamps=trust_whisper_timestamps,
        )

    transcription = finalize_transcription(
        transcription,
        words,
        remove_empty_words=remove_empty_words,
        min_word_duration=min_word_duration,
        trust_whisper_timestamps=trust_whisper_timestamps,
        refine_whisper_precision=refine_whisper_precision,
        vad_convert=speech_convert if vad else None,
        print_words_premerge=bool(verbose and not naive_approach and not vad),
        print_words_postvad=bool(verbose and vad),
    )

    if vad_segments is not None:
        transcription["speech_activity"] = [
            {"start": s, "end": e} for (s, e) in vad_segments
        ]

    return transcription


def finalize_transcription(
    transcription: dict,
    words: List[dict],
    *,
    remove_empty_words: bool,
    min_word_duration: float,
    trust_whisper_timestamps: bool,
    refine_whisper_precision: float,
    vad_convert=None,
    print_words_premerge: bool = False,
    print_words_postvad: bool = False,
) -> dict:
    """Shared result finalization for the serial and batched pipelines:
    hallucination pruning, monotonicity repair, word->segment merge
    (reference ``transcribe.py:313-339``), and VAD timestamp back-conversion
    (``transcribe.py:341-352``)."""
    if remove_empty_words:
        transcription, words = remove_last_null_duration_words(
            transcription, words, recompute_text=True
        )

    ensure_increasing_positions(
        words, min_duration=min_word_duration if trust_whisper_timestamps else 0
    )

    whisper_segments = transcription["segments"]
    for word in words:
        if print_words_premerge:
            print_timestamped(word)
        word.pop("tokens", None)
        word.pop("tokens_indices", None)
        word.pop("avg_logprob_reliable", None)
        idx_segment = word.pop("idx_segment")
        assert idx_segment < len(whisper_segments)
        segment = whisper_segments[idx_segment]
        if "words" in segment:
            segment["words"].append(word)
        else:
            segment["words"] = [word]
            if refine_whisper_precision:
                segment["start"] = word["start"]
        if refine_whisper_precision:
            segment["end"] = word["end"]

    if vad_convert is not None:
        for segment in whisper_segments:
            for word in segment.get("words", []):
                word["start"], word["end"] = vad_convert(word["start"], word["end"])
                if print_words_postvad:
                    print_timestamped(word)
            if refine_whisper_precision and len(segment.get("words", [])):
                segment["start"] = segment["words"][0]["start"]
                segment["end"] = segment["words"][-1]["end"]
            else:
                segment["start"], segment["end"] = vad_convert(
                    segment["start"], segment["end"]
                )

    return transcription


# ---------------------------------------------------------------------------
# The unified single-pass engine path
# ---------------------------------------------------------------------------


def _transcribe_efficient(
    engine: DecodeEngine,
    audio: np.ndarray,
    *,
    language,
    task,
    temperatures,
    compression_ratio_threshold,
    logprob_threshold,
    no_speech_threshold,
    condition_on_previous_text,
    initial_prompt,
    suppress_tokens,
    sample_len,
    seed,
    refine_whisper_precision_nframes,
    remove_punctuation_from_words,
    compute_word_confidence,
    include_punctuation_in_confidence,
    detect_disfluencies,
    verbose,
    plot_word_alignment=False,
    device_alignment=False,
    device_alignment_explicit=True,
    trust_whisper_timestamps=True,
):
    tok = engine.tokenizer

    def verbose_cb(seg: Segment):
        line = f"[{format_timestamp(seg.start)} --> {format_timestamp(seg.end)}] {seg.text}"
        print(line.encode(sys.getdefaultencoding(), errors="replace").decode())

    from .device_align import MAX_K

    # full on-device alignment: the attention buffers never cross the host
    # boundary (the dominant cost on remote-tunnel TPUs). Requires the
    # reference-default alignment options; anything else uses the host path.
    full_device = (
        device_alignment
        and not plot_word_alignment
        and trust_whisper_timestamps
        and len(engine.align_heads) <= MAX_K
    )
    if device_alignment and not full_device:
        # never downgrade silently when explicitly requested (reference
        # pattern: every repair/fallback warns, e.g. transcribe.py:496-538);
        # the auto-resolved default degrades with an info line only
        reasons = [
            r for cond, r in (
                (plot_word_alignment, "plot_word_alignment needs the host cost matrix"),
                (not trust_whisper_timestamps,
                 "trust_whisper_timestamps=False aligns whole windows on the host"),
                (len(engine.align_heads) > MAX_K,
                 f"{len(engine.align_heads)} alignment heads exceed the device aligner's capacity ({MAX_K})"),
            ) if cond
        ]
        (logger.warning if device_alignment_explicit else logger.info)(
            "device_alignment %s but falling back to host alignment: %s",
            "requested" if device_alignment_explicit else "auto-enabled",
            "; ".join(reasons),
        )

    opts = DecodingOptions(suppress_tokens=suppress_tokens, sample_len=sample_len)
    result = transcribe_windows(
        engine,
        audio,
        language=language,
        task=task,
        temperature=temperatures,
        compression_ratio_threshold=compression_ratio_threshold,
        logprob_threshold=logprob_threshold,
        no_speech_threshold=no_speech_threshold,
        condition_on_previous_text=condition_on_previous_text,
        initial_prompt=initial_prompt,
        decode_options=opts,
        return_language_probs=language is None,
        # live printing only for verbose=True: verbose=False must keep stdout
        # clean (the CLI dumps JSON there)
        verbose_callback=verbose_cb if verbose else None,
        rng_seed=seed or 0,
        fetch_alignment=not full_device,
    )
    if verbose and language is None and result.language is not None:
        print(f"Detected language: {LANGUAGE_NAMES.get(result.language, result.language)}")

    use_space = should_use_space(result.language)

    if not trust_whisper_timestamps:
        plot_mel = (
            np.asarray(log_mel_spectrogram(audio, n_mels=engine.dims.n_mels))
            if plot_word_alignment
            else None
        )
        words, segment_dicts = _align_words_whole_windows(
            result,
            tok,
            use_space=use_space,
            refine_whisper_precision_nframes=refine_whisper_precision_nframes,
            remove_punctuation_from_words=remove_punctuation_from_words,
            compute_word_confidence=compute_word_confidence,
            include_punctuation_in_confidence=include_punctuation_in_confidence,
            detect_disfluencies=detect_disfluencies,
            plot_word_alignment=plot_word_alignment,
            plot_mel=plot_mel,
        )
        transcription = {
            "text": "".join(s["text"] for s in segment_dicts),
            "segments": segment_dicts,
            "language": result.language,
        }
        if result.language_probs:
            transcription["language_probs"] = result.language_probs
        return transcription, words

    if full_device:
        entries = [(seg, prepare_segment_tokens(seg, tok)) for seg in result.segments]
        with stage_timer("align"):
            all_jumps = device_align_segments(
                entries, tok, refine_whisper_precision_nframes,
                fetch_cost=detect_disfluencies,
            )
    else:
        entries = [(seg, None) for seg in result.segments]
        all_jumps = [None] * len(entries)

    # MFCC pane of the alignment figure (reference draws the window's mel
    # under the heatmap, transcribe.py:1638-1645): diagnostic-only host
    # recompute of the mel — the decode's own mel lives on device
    plot_mel = (
        np.asarray(log_mel_spectrogram(audio, n_mels=engine.dims.n_mels))
        if plot_word_alignment
        else None
    )

    words: List[dict] = []
    segment_dicts: List[dict] = []
    for (seg, prep), jumps in zip(entries, all_jumps):
        if full_device and prep is None:
            continue
        cost = None
        if jumps is not None and detect_disfluencies:
            jumps, cost = jumps
        with stage_timer("align"):
            ws, seg_dict = align_and_score_segment(
                seg,
                tok,
                use_space=use_space,
                refine_whisper_precision_nframes=refine_whisper_precision_nframes,
                remove_punctuation_from_words=remove_punctuation_from_words,
                compute_word_confidence=compute_word_confidence,
                include_punctuation_in_confidence=include_punctuation_in_confidence,
                detect_disfluencies=detect_disfluencies,
                plot=plot_word_alignment,
                plot_mfcc=(
                    plot_mel[
                        :, seg.mel_frame_offset : seg.mel_frame_offset + N_FRAMES
                    ]
                    if plot_mel is not None
                    else None
                ),
                device_alignment=device_alignment,
                precomputed_jumps=jumps,
                precomputed_cost=cost,
                prepared=prep,
            )
        if ws is None:
            continue  # segment dropped (no aligned words)
        idx = len(segment_dicts)
        for w in ws:
            w["idx_segment"] = idx
        seg_dict["id"] = idx
        segment_dicts.append(seg_dict)
        words.extend(ws)

    transcription = {
        "text": "".join(s["text"] for s in segment_dicts),
        "segments": segment_dicts,
        "language": result.language,
    }
    if result.language_probs:
        transcription["language_probs"] = result.language_probs
    return transcription, words


LANGUAGE_NAMES = {}
try:  # populate "Detected language: French"-style names
    from .languages import LANGUAGES as _L

    LANGUAGE_NAMES = {c: n.title() for c, n in _L.items()}
except Exception:  # pragma: no cover
    pass


def _align_words_whole_windows(
    result,
    tok: Tokenizer,
    *,
    use_space: bool,
    refine_whisper_precision_nframes: int,
    remove_punctuation_from_words: bool,
    compute_word_confidence: bool,
    include_punctuation_in_confidence: bool,
    detect_disfluencies: bool,
    plot_word_alignment=False,
    plot_mel=None,
):
    """``trust_whisper_timestamps=False`` in the single-pass engine.

    Aligns each 30-s window's FULL token sequence in one DTW against the
    attention captured during decode — the reference implements this
    efficient-side at ``transcribe.py:585-707``: the window's first timestamp
    is pinned to <|0.00|>, its final timestamp to <|30.00|>, intermediate
    timestamps stay in the sequence as anchors — then redistributes the
    aligned words to whisper's segments by walking token counts (the
    re-split at ``transcribe.py:640-700``). One alignment per window and NO
    second forward pass, so the option no longer needs the two-pass engine
    (2x inference) here.

    Returns ``(words, segment_dicts)``. Unlike the per-segment path, every
    segment of the stream is emitted (a segment whose words all landed
    elsewhere simply has no ``words`` key after the merge, matching the
    reference's behavior for this option).
    """
    ts_begin = tok.timestamp_begin
    words: List[dict] = []
    segment_dicts: List[dict] = []

    # group consecutive segments that came out of the same window decode
    groups: List[List[int]] = []
    for i, seg in enumerate(result.segments):
        if groups and result.segments[groups[-1][-1]].window is seg.window:
            groups[-1].append(i)
        else:
            groups.append([i])

    for group in groups:
        segs = [result.segments[i] for i in group]
        window = segs[0].window
        base_idx = len(segment_dicts)
        for seg in segs:
            d = seg.to_dict()
            d["id"] = len(segment_dicts)
            segment_dicts.append(d)

        tokens_w: List[int] = []
        rows_w: List[int] = []
        seg_of: List[int] = []  # output segment index per aligned token
        for gi, seg in enumerate(segs):
            a, b = seg.token_span
            tokens_w.extend(seg.tokens)
            rows_w.extend(range(a, b))
            seg_of.extend([base_idx + gi] * (b - a))
        if not tokens_w:
            continue

        unfinished = False
        if tokens_w[0] >= ts_begin:
            tokens_w[0] = ts_begin  # window starts at <|0.00|>
        else:  # defensive: a window that somehow starts mid-text
            tokens_w.insert(0, ts_begin)
            rows_w.insert(0, rows_w[0])
            seg_of.insert(0, seg_of[0])
        if tokens_w[-1] >= ts_begin:
            # pin the window end to <|30.00|> (ref :632-634)
            tokens_w[-1] = ts_begin + N_FRAMES // 2
        elif window.hit_limit:
            unfinished = True  # stuck LM: no final timestamp (ref :611-613)
        else:
            # early EOT: align <|endoftext|> with the row that predicted it
            tokens_w.append(tok.eot)
            rows_w.append(len(window.tokens))
            seg_of.append(seg_of[-1])

        if len(tokens_w) <= 1:
            continue

        full_attn = window.attn
        if rows_w[-1] >= len(full_attn):
            full_attn = np.concatenate([full_attn, window.eot_attn[None]], axis=0)
        attn = full_attn[rows_w]

        segment_frames = segs[0].segment_frames
        max_duration = segment_frames // 2 if segment_frames < N_FRAMES else None
        ws = perform_word_alignment(
            tokens_w,
            attn,
            tok,
            use_space=use_space,
            max_duration=max_duration,
            refine_whisper_precision_nframes=refine_whisper_precision_nframes,
            remove_punctuation_from_words=remove_punctuation_from_words,
            detect_disfluencies=detect_disfluencies,
            unfinished_decoding=unfinished,
            plot=plot_word_alignment,
            plot_mfcc=(
                plot_mel[
                    :,
                    segs[0].mel_frame_offset : segs[0].mel_frame_offset + N_FRAMES,
                ]
                if plot_mel is not None
                else None
            ),
        )
        if not ws:
            continue

        offset = segs[0].seek * HOP_LENGTH / SAMPLE_RATE
        # walk the aligned token sequence to hand each word back to the
        # whisper segment its tokens came from (ref re-split :640-700)
        i_token = 1  # skip the leading window-start timestamp
        per_seg_words: Dict[int, List[dict]] = {}
        for w in ws:
            w["start"] = round_timestamp(w["start"] + offset)
            w["end"] = round_timestamp(w["end"] + offset)
            idx = seg_of[i_token] if i_token < len(seg_of) else seg_of[-1]
            w["idx_segment"] = idx
            per_seg_words.setdefault(idx, []).append(w)
            i_token += len(w["tokens"])
            while i_token < len(tokens_w) and tokens_w[i_token] >= ts_begin:
                i_token += 1
            words.append(w)

        if compute_word_confidence:
            for gi, seg in enumerate(segs):
                a, b = seg.token_span
                lps = [
                    window.token_logprobs[a + i]
                    for i, t in enumerate(seg.tokens)
                    if t < tok.eot
                ]
                _attach_confidences(
                    per_seg_words.get(base_idx + gi, []),
                    segment_dicts[base_idx + gi],
                    lps,
                    include_punctuation_in_confidence,
                )

    return words, segment_dicts


def device_align_segments(
    entries,  # [(Segment, prepare_segment_tokens output or None)]
    tok: Tokenizer,
    refine_whisper_precision_nframes: int,
    max_windows_per_chunk: int = 16,
    fetch: bool = True,
    fetch_cost: bool = False,
):
    """Batched on-device alignment for segments decoded with
    ``fetch_alignment=False``. Returns per-entry jumps arrays (None where the
    entry was not alignable) — (jumps, cost) pairs with ``fetch_cost=True``
    (disfluency detection needs the cost rows on host). Chunked so the
    flattened attention buffer stays bounded for long audio.

    ``fetch=False`` dispatches the align programs and async-starts the
    device→host copies, returning a zero-arg resolver for the jumps list —
    the batched pipeline resolves at assembly time so no per-window round
    trip blocks the decode loop."""
    import jax.numpy as jnp

    from .device_align import compute_jumps_batch, make_task

    jumps_out: List[Optional[np.ndarray]] = [None] * len(entries)
    deferred = []

    def flush(chunk):
        if not chunk:
            return
        bufs, offsets, total = [], {}, 0
        for _, seg, _ in chunk:
            w = seg.window
            key = id(w.attn_dev)
            if key not in offsets:
                offsets[key] = total
                bufs.append(w.attn_dev)
                total += w.attn_dev.shape[0] * w.attn_dev.shape[1]
        flat = [b.reshape(-1, *b.shape[2:]) for b in bufs]
        flat = flat[0] if len(flat) == 1 else jnp.concatenate(flat, axis=0)
        tasks, idxs = [], []
        for ei, seg, prep in chunk:
            tokens, local_rows, unfinished, max_duration = prep
            w = seg.window
            off = offsets[id(w.attn_dev)] + w.batch_index * w.attn_dev.shape[1]
            task = make_task(
                tokens,
                off,
                local_rows,
                tok,
                refine_whisper_precision_nframes=refine_whisper_precision_nframes,
                unfinished_decoding=unfinished,
                max_duration=max_duration,
            )
            if task is None:
                # empty plan: route through the precomputed branch anyway —
                # perform_word_alignment returns [] before touching jumps
                empty = np.zeros((0,), np.int64)
                jumps_out[ei] = (empty, None) if fetch_cost else empty
                continue
            tasks.append(task)
            idxs.append(ei)
        if fetch:
            for ei, j in zip(
                idxs, compute_jumps_batch(flat, tasks, fetch_cost=fetch_cost)
            ):
                jumps_out[ei] = j
        else:
            deferred.append(
                (idxs,
                 compute_jumps_batch(flat, tasks, fetch=False, fetch_cost=fetch_cost))
            )

    chunk, windows_seen = [], set()
    for ei, (seg, prep) in enumerate(entries):
        if prep is None or len(prep[0]) <= 1:
            continue
        wkey = (id(seg.window.attn_dev), seg.window.batch_index)
        windows_seen.add(wkey)
        chunk.append((ei, seg, prep))
        if len(windows_seen) >= max_windows_per_chunk:
            flush(chunk)
            chunk, windows_seen = [], set()
    flush(chunk)
    if fetch:
        return jumps_out

    def resolve():
        for idxs, sub in deferred:
            for ei, j in zip(idxs, sub()):
                jumps_out[ei] = j
        return jumps_out

    return resolve


def _needs_end_repair(tokens: List[int], tok: Tokenizer) -> bool:
    """True when the end<=start timestamp re-estimation heuristic fires
    (reference ``transcribe.py:528-538``) — the only consumer of the
    timestamp-logprob rows."""
    return (
        len(tokens) >= 2
        and tokens[-1] >= tok.timestamp_begin
        and tokens[0] >= tok.timestamp_begin
        and tokens[-1] <= tokens[0]
    )


def prefetch_ts_repair_rows(segments: Sequence[Segment], tok: Tokenizer):
    """One batched fetch of every timestamp-logprob row the end<=start repair
    will need, keyed by ``id(seg)``.

    In device-alignment mode each ``ts_logprob_row`` call is a device slice +
    host read; issued lazily from inside the window hook it lands while the
    NEXT window's decode is in flight, and remote-tunnel reads behind an
    in-flight execution block until that execution completes (seconds per
    window). Batching the rows into one gather — called from the idle gap
    between a window's outputs landing and the next dispatch — makes the
    repair cost one cheap round trip, and only on windows that need it.
    """
    import jax.numpy as jnp

    need = [s for s in segments
            if s.window is not None
            and s.window.ts_logprobs is None
            and s.window.ts_logprobs_dev is not None
            and _needs_end_repair(s.tokens, tok)
            # Mirror the lazy ts_logprob_row bound guard: JAX clamps OOB
            # gather indices silently, which would apply the repair with a
            # wrong row; out-of-range spans fall through to the guarded
            # lazy fetch instead.
            and s.token_span[1] - 1 < s.window.ts_logprobs_dev.shape[1]]
    if not need:
        return {}
    out = {}
    by_buf: Dict[int, list] = {}
    for s in need:
        by_buf.setdefault(id(s.window.ts_logprobs_dev), []).append(s)
    for group in by_buf.values():
        buf = group[0].window.ts_logprobs_dev
        idx = [(s.window.batch_index, s.token_span[1] - 1) for s in group]
        # pow2-padded gather: a handful of compiled shapes, ever
        n_pad = 1
        while n_pad < len(idx):
            n_pad *= 2
        idx = idx + [idx[0]] * (n_pad - len(idx))
        bi = jnp.asarray(np.asarray([i for i, _ in idx], np.int32))
        ri = jnp.asarray(np.asarray([r for _, r in idx], np.int32))
        rows = np.asarray(buf[bi, ri])  # (n_pad, 1501): one read
        for s, row in zip(group, rows):
            out[id(s)] = row
    return out


def prepare_segment_tokens(seg: Segment, tok: Tokenizer, ts_row=None):
    """Pre-alignment token decisions for one segment: early-EOT append,
    stuck-LM flagging, end-token re-estimation (reference
    ``transcribe.py:490-538``). Works in both host mode (window.attn fetched)
    and device mode (attention still on device) — attention rows are addressed
    by index, never by value.

    ``ts_row`` optionally injects the segment's end-repair timestamp-logprob
    row (from ``prefetch_ts_repair_rows``); otherwise it is fetched lazily.

    Returns (tokens, local_rows, unfinished, max_duration) or None when the
    segment has no tokens. ``local_rows[k]`` is the attention row (within the
    window's buffer) feeding token k.
    """
    window = seg.window
    a, b = seg.token_span
    tokens = list(seg.tokens)
    local_rows = list(range(a, b))
    is_last_of_window = b == len(window.tokens)
    unfinished = False

    if len(tokens) == 0:
        return None

    if tokens[-1] < tok.timestamp_begin:
        # segment without a final timestamp
        if is_last_of_window and window.hit_limit:
            # stuck LM: decoding hit the token limit (reference :490-517)
            unfinished = True
        elif not window.hit_limit and is_last_of_window:
            # early EOT: append <|endoftext|> + its attention row (:518-523);
            # the row predicting the final EOT sits right after the text rows
            tokens = tokens + [tok.eot]
            local_rows = local_rows + [len(window.tokens)]
        else:
            unfinished = True

    # end<=start repair: re-estimate the end timestamp from the step's
    # timestamp distribution (:528-538)
    if _needs_end_repair(tokens, tok):
        start_off = tokens[0] - tok.timestamp_begin
        row = ts_row if ts_row is not None else window.ts_logprob_row(b - 1)
        if row is not None and start_off + 1 < len(row):
            new_end = int(np.argmax(row[start_off + 1 :])) + start_off + 1
            tokens[-1] = tok.timestamp_begin + new_end

    max_duration = seg.segment_frames // 2 if seg.segment_frames < N_FRAMES else None
    return tokens, local_rows, unfinished, max_duration


def align_and_score_segment(
    seg: Segment,
    tok: Tokenizer,
    *,
    use_space: bool,
    refine_whisper_precision_nframes: int,
    remove_punctuation_from_words: bool,
    compute_word_confidence: bool,
    include_punctuation_in_confidence: bool,
    detect_disfluencies: bool,
    plot=False,
    plot_mfcc: Optional[np.ndarray] = None,
    device_alignment: bool = False,
    precomputed_jumps: Optional[np.ndarray] = None,
    precomputed_cost: Optional[np.ndarray] = None,
    prepared=None,
):
    """Align one segment's tokens and compute confidences.

    Reproduces the reference's per-segment flush work: end-token repair
    (``transcribe.py:528-538``), early-EOT handling (``transcribe.py:518-523``),
    stuck-LM flagging (``transcribe.py:490-517``), word confidence
    (``transcribe.py:965-995``).

    ``precomputed_jumps`` (with ``prepared`` from ``prepare_segment_tokens``)
    short-circuits the cost/DTW work with the on-device batched aligner's
    output (device_align.py).
    """
    window = seg.window
    a, b = seg.token_span
    prep = prepared if prepared is not None else prepare_segment_tokens(seg, tok)
    if prep is None:
        return None, None
    tokens, local_rows, unfinished, max_duration = prep

    if len(tokens) <= 1:
        ws = []
    elif precomputed_jumps is not None:
        ws = perform_word_alignment(
            tokens,
            None,
            tok,
            use_space=use_space,
            max_duration=max_duration,
            refine_whisper_precision_nframes=refine_whisper_precision_nframes,
            remove_punctuation_from_words=remove_punctuation_from_words,
            detect_disfluencies=detect_disfluencies,
            unfinished_decoding=unfinished,
            precomputed_jumps=precomputed_jumps,
            precomputed_cost=precomputed_cost,
        )
    else:
        full_attn = window.attn
        if local_rows and local_rows[-1] >= len(full_attn):
            # the early-EOT row lives past the text rows (host mode keeps it
            # in the separate eot_attn field)
            full_attn = np.concatenate([full_attn, window.eot_attn[None]], axis=0)
        attn = full_attn[local_rows]
        ws = perform_word_alignment(
            tokens,
            attn,
            tok,
            use_space=use_space,
            max_duration=max_duration,
            refine_whisper_precision_nframes=refine_whisper_precision_nframes,
            remove_punctuation_from_words=remove_punctuation_from_words,
            detect_disfluencies=detect_disfluencies,
            unfinished_decoding=unfinished,
            plot=plot,
            plot_mfcc=plot_mfcc,
            use_device_kernels=device_alignment,
        )
    if len(ws) == 0:
        return None, None

    offset = seg.seek * HOP_LENGTH / SAMPLE_RATE
    for w in ws:
        w["start"] = round_timestamp(w["start"] + offset)
        w["end"] = round_timestamp(w["end"] + offset)

    seg_dict = seg.to_dict()

    if compute_word_confidence:
        # per-text-token logprobs for this segment (timestamps excluded)
        lps = [
            window.token_logprobs[a + i]
            for i, t in enumerate(seg.tokens)
            if t < tok.eot
        ]
        _attach_confidences(ws, seg_dict, lps, include_punctuation_in_confidence)

    return ws, seg_dict


def _attach_confidences(ws, seg_dict, lps, include_punctuation_in_confidence):
    """Word + segment confidence from the segment's text-token logprobs
    (efficient-path semantics, reference ``transcribe.py:965-995``): word
    confidence = exp(mean) over its tokens' logprobs (trailing punctuation
    optionally excluded), segment confidence over the concatenation."""
    logprobs = np.array(lps, np.float64)
    if include_punctuation_in_confidence:
        seg_dict["confidence"] = round_confidence(
            float(np.exp(logprobs.mean())) if len(logprobs) else 0.0
        )
        logprobs_nopunc = None
    else:
        logprobs_nopunc = []
    i_end = 0
    for w in ws:
        i_start = i_end
        tokens_w = w["tokens"]
        i_end = min(i_end + len(tokens_w), len(logprobs))
        if include_punctuation_in_confidence:
            word_logprobs = logprobs[i_start:i_end]
        else:
            while (
                len(tokens_w) > 1
                and len(tokens_w[-1])
                and tokens_w[-1][-1] in _punctuation
            ):
                tokens_w = tokens_w[:-1]
            word_logprobs = logprobs[i_start : i_start + len(tokens_w)]
            logprobs_nopunc.append(word_logprobs)
        w["confidence"] = round_confidence(
            float(np.exp(word_logprobs.mean())) if len(word_logprobs) else 0.0
        )
    if i_end not in (len(logprobs), len(logprobs) - 1):
        # mirrors reference transcribe.py:990-991 (special tokens inside a
        # segment break the word↔logprob tiling)
        logger.warning(
            "Got inconsistent length for segment (%d != %d). Some words have been ignored.",
            len(logprobs), i_end,
        )
    if not include_punctuation_in_confidence:
        cat = np.concatenate(logprobs_nopunc) if logprobs_nopunc else np.array([])
        seg_dict["confidence"] = round_confidence(
            float(np.exp(cat.mean())) if len(cat) else 0.0
        )
