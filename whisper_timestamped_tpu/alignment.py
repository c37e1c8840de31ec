"""Word alignment: DTW over cross-attention → word-level timestamps.

Behavioral port of the reference's alignment core
(``perform_word_alignment`` at reference ``transcribe.py:1428-1793``, token
splitting at ``transcribe.py:1815-1868``), rebuilt on our own ops. This module
is the *exact* host path (vectorized-numpy wavefront DTW, sliding-window
median, pure-numpy find_peaks): segment shapes are dynamic, so it avoids
per-shape XLA recompiles; the fixed-shape on-device fast path (Pallas) plugs
in at the ``ops`` layer.

Input layout difference: the engine hands attention as pre-softmax qk scores
shaped (n_tokens, K, n_audio_ctx); the reference concatenates hook outputs to
(K, n_tokens, frames). Semantics are otherwise kept 1:1, including the quirks
goldens pin down (absolute-vs-sliced max_duration column masking, edge-time
rules, recursive truncation on token overflow).
"""

from __future__ import annotations

import string
from typing import List, NamedTuple, Optional, Sequence

import numpy as np

from .audio import AUDIO_TIME_PER_TOKEN, N_FRAMES
from .ops.dtw import dtw_path_numpy_wavefront
from .ops.peaks import find_peaks
from .ops.median import median_filter_numpy


def dtw_path(x, allow_vertical: bool = True):
    """Host DTW: C++ core when built (native.py), numpy wavefront otherwise.

    Only the import/availability probe is guarded — an error raised by the
    native kernel itself on a valid input is a real bug and must propagate,
    not silently degrade to the slow path."""
    use_native = False
    try:  # pragma: no cover - depends on the lazily-built extension
        from .native import available, dtw_path_native

        use_native = available()
    except Exception:
        pass
    if use_native:
        return dtw_path_native(x, allow_vertical)
    return dtw_path_numpy_wavefront(x, allow_vertical)

DISFLUENCY_MARK = "[*]"

# punctuation set (reference ``transcribe.py:1813``)
_punctuation = (
    "".join(c for c in string.punctuation if c not in ["-", "'"]) + "。，！？：”、…"
)


def round_confidence(x: float) -> float:
    return round(float(x), 3)


def round_timestamp(x: float) -> float:
    return round(float(x), 2)


# ---------------------------------------------------------------------------
# Token → word splitting (reference ``transcribe.py:1815-1868``)
# ---------------------------------------------------------------------------


class _WordGroup:
    """One word under construction: visible text plus the flat per-token
    decoded-string / token-id sequences that the alignment code indexes by
    token position."""

    __slots__ = ("text", "token_strs", "token_ids")

    def __init__(self):
        self.text = ""
        self.token_strs: List[str] = []
        self.token_ids: List[int] = []

    def take(self, piece_text: str, piece_ids: List[int], shown: Optional[str] = None):
        """Absorb one unicode-complete piece. ``shown`` overrides what is added
        to the visible text (e.g. '' to hide glued punctuation, or a stripped
        form in space-grouping mode)."""
        self.text += piece_text if shown is None else shown
        # only the final token of a multi-token piece carries the decoded text
        self.token_strs += [""] * (len(piece_ids) - 1) + [piece_text]
        self.token_ids += piece_ids


def _as_triple(groups: List[_WordGroup]):
    return (
        [g.text for g in groups],
        [g.token_strs for g in groups],
        [g.token_ids for g in groups],
    )


def _iter_unicode_pieces(tokens: Sequence[int], tokenizer):
    """Yield ``(text, token_ids)`` pieces: each is the shortest run of tokens
    whose decode (text + timestamp tokens only) is free of U+FFFD, i.e. a
    complete UTF-8 sequence. A trailing incomplete run is dropped, matching
    the reference (``transcribe.py:1815-1842`` never flushes it)."""
    pending: List[int] = []
    for tok in tokens:
        pending.append(int(tok))
        printable = [
            t for t in pending if t < tokenizer.eot or t >= tokenizer.timestamp_begin
        ]
        text = tokenizer.decode_with_timestamps(printable)
        if "�" in text:
            continue
        yield text, pending
        pending = []


def split_tokens_on_unicode(
    tokens: Sequence[int],
    tokenizer,
    remove_punctuation_from_words: bool = False,
    isolate_punctuations: bool = False,
):
    """Group tokens into unicode-complete chunks; glue punctuation backwards.

    Behavior matches reference ``transcribe.py:1815-1842`` (pinned by the
    CJK / punctuation goldens): a pure-punctuation piece joins the preceding
    word unless that word ends in a timestamp token.
    """
    groups: List[_WordGroup] = []
    for text, ids in _iter_unicode_pieces(tokens, tokenizer):
        bare = text.strip()
        glue = (
            not isolate_punctuations
            and bare != ""
            and bare in _punctuation
            and not (groups and groups[-1].token_ids
                     and groups[-1].token_ids[-1] >= tokenizer.timestamp_begin)
        )
        if glue:
            if not groups:
                groups.append(_WordGroup())
            groups[-1].take(text, ids, shown="" if remove_punctuation_from_words else None)
        else:
            groups.append(_WordGroup())
            groups[-1].take(text, ids)
    return _as_triple(groups)


def split_tokens_on_spaces(
    tokens: Sequence[int], tokenizer, remove_punctuation_from_words: bool = False
):
    """Group unicode chunks into space-delimited words (space languages).

    Behavior matches reference ``transcribe.py:1845-1868`` (pinned by the
    Arabic / double-space / issue-61 ``<|te|>`` tests). Each chunk either
    opens a new word or merges into the previous one, per ``_opens_word``.
    """
    texts, _strs, ids = split_tokens_on_unicode(
        tokens, tokenizer, remove_punctuation_from_words=remove_punctuation_from_words
    )
    n = len(texts)
    ts_begin = tokenizer.timestamp_begin
    is_timestamp = [seq[0] >= ts_begin for seq in ids]
    is_blank = [t.strip() == "" for t in texts]

    def _opens_word(i: int) -> bool:
        if is_timestamp[i]:
            return True
        if i > 0 and is_blank[i - 1]:
            return False  # whatever follows a bare-space chunk merges into it
        if i > 0 and is_timestamp[i - 1]:
            return True  # first text after a timestamp token
        if is_blank[i]:
            # a space chunk opens a word, unless it pads a following timestamp
            return i + 1 >= n or not is_timestamp[i + 1]
        # leading space opens a word — except for punctuation, which glues back
        return texts[i].startswith(" ") and texts[i].strip() not in _punctuation

    groups: List[_WordGroup] = []
    for i in range(n):
        if i == 0 or _opens_word(i):
            groups.append(_WordGroup())
        # re-absorb the chunk's pieces so token_strs layout is preserved,
        # but contribute only the stripped text to the visible word
        g = groups[-1]
        g.text += texts[i].strip()
        g.token_strs += _strs[i]
        g.token_ids += ids[i]
    return _as_triple(groups)


# ---------------------------------------------------------------------------
# Attention → cost matrix (device side)
# ---------------------------------------------------------------------------


def _attention_to_cost(
    scores: np.ndarray,  # (K, n_tokens, span) pre-softmax qk, already sliced
    medfilt_width: int,
    qk_scale: float,
) -> np.ndarray:
    """median filter → softmax → head-mean → per-frame L2 norm → negate.

    Mirrors reference ``transcribe.py:1546-1550``. Host numpy: segment shapes
    are dynamic, so a jitted version would recompile per segment; the arrays
    are tiny (≤ K×224×1500) and this costs ~ms. The fixed-shape on-device fast
    path lives with the Pallas kernels.
    """
    w = median_filter_numpy(np.asarray(scores, np.float32), medfilt_width)
    w = w * qk_scale
    w = np.exp(w - w.max(axis=-1, keepdims=True))
    w /= w.sum(axis=-1, keepdims=True)
    w = w.mean(axis=0)  # (tokens, span)
    w = w / np.linalg.norm(w, axis=-2, keepdims=True)
    return -w.astype(np.float64)


def _attention_to_cost_device(scores: np.ndarray) -> np.ndarray:
    """On-device fused cost preparation (Pallas kernel). Tokens bucket to
    multiples of 16 and frames to 128 so segment-shape variety reuses a small
    set of compiled kernels. Same contract as ``_attention_to_cost`` with the
    default medfilt_width=9 / qk_scale=1."""
    import jax.numpy as jnp

    from .ops.pallas_kernels import attention_to_cost_pallas

    K, N, span = scores.shape
    Np = int(np.ceil(max(N, 1) / 16) * 16)
    M = int(np.ceil(max(span, 1) / 128) * 128)
    padded = np.zeros((K, Np, M), np.float32)
    padded[:, :N, :span] = scores
    cost = np.asarray(attention_to_cost_pallas(jnp.asarray(padded), span, n_tokens=N))
    return cost[:N, :span].astype(np.float64)


# ---------------------------------------------------------------------------
# Alignment planning: the pre-DTW extent/truncation rules, factored out so the
# host path and the batched on-device path resolve tokens identically
# ---------------------------------------------------------------------------


class AlignmentPlan(NamedTuple):
    """Resolved alignment extent for one segment (reference
    ``transcribe.py:1466-1535``: timestamp validation, minimal-duration rule,
    refine margins, recursive tail truncation when tokens > frames)."""

    tokens: List[int]  # final tokens (tail-truncated if needed)
    row_indices: np.ndarray  # rows of the caller's attention feeding each token
    start_token: int
    end_token: int
    unfinished: bool
    empty: bool  # alignment degenerates to [] (zero-duration segment)


def plan_alignment(
    tokens: Sequence[int],
    tokenizer,
    refine_whisper_precision_nframes: int = 0,
    unfinished_decoding: bool = False,
) -> AlignmentPlan:
    tokens = [int(t) for t in tokens]
    assert len(tokens) > 1, f"Got unexpected sequence of tokens of length {len(tokens)}"
    rows = np.arange(len(tokens))
    unfinished = unfinished_decoding
    while True:
        start_token = tokens[0] - tokenizer.timestamp_begin
        end_token = tokens[-1] - tokenizer.timestamp_begin

        if start_token < 0:
            raise RuntimeError(
                f"Missing start token in: {tokenizer.decode_with_timestamps(tokens)}"
            )
        if len(tokens) == 1 or end_token < 0:
            # stuck as a language model: no end timestamp
            end_token = N_FRAMES // 2
        if end_token == start_token and refine_whisper_precision_nframes == 0:
            return AlignmentPlan(tokens, rows, start_token, end_token, unfinished, True)

        # minimal duration given the token count (reference issue #67 rule)
        end_token = min(N_FRAMES // 2, max(end_token, start_token + len(tokens)))

        if refine_whisper_precision_nframes > 0:
            start_token = max(start_token - refine_whisper_precision_nframes, 0)
            end_token = min(end_token + refine_whisper_precision_nframes, N_FRAMES // 2)

        if end_token <= start_token:
            raise RuntimeError(
                f"Got segment with null or negative duration: {start_token} {end_token}"
            )

        num_frames = end_token - start_token
        if len(tokens) <= num_frames:
            return AlignmentPlan(tokens, rows, start_token, end_token, unfinished, False)
        # too much text for the audio span: drop the tail and retry, flagged
        # unfinished (reference ``transcribe.py:1516-1535``)
        tokens = tokens[: num_frames - 1] + [tokens[-1]]
        rows = np.concatenate([rows[: num_frames - 1], rows[-1:]])
        unfinished = True


# ---------------------------------------------------------------------------
# perform_word_alignment (reference ``transcribe.py:1428-1793``)
# ---------------------------------------------------------------------------


def perform_word_alignment(
    tokens: Sequence[int],
    attention_scores: np.ndarray,  # (n_tokens, K, n_audio_ctx) pre-softmax
    tokenizer,
    use_space: bool = True,
    max_duration: Optional[int] = None,  # token positions before padding (frames//2)
    refine_whisper_precision_nframes: int = 0,
    remove_punctuation_from_words: bool = False,
    include_punctuation_in_timing: bool = False,
    unfinished_decoding: bool = False,
    medfilt_width: int = 9,
    qk_scale: float = 1.0,
    detect_disfluencies: bool = True,
    subwords_can_be_empty: bool = True,
    plot=False,
    plot_mfcc: Optional[np.ndarray] = None,  # (n_mels, n_frames) window mel
    use_device_kernels: bool = False,
    precomputed_jumps: Optional[np.ndarray] = None,
    precomputed_cost: Optional[np.ndarray] = None,
) -> List[dict]:
    """``precomputed_jumps``: per-token start frames in sliced coordinates,
    length len(plan.tokens)+1, from the batched on-device aligner
    (device_align.py) — skips the cost/DTW computation here. Callers supply
    jumps for the PLANNED token sequence (plan_alignment output).
    ``precomputed_cost``: the aligner's (n_tokens, span) cost matrix (weight
    edits applied), required alongside jumps when ``detect_disfluencies`` —
    peak detection reads per-token cost rows."""
    plan = plan_alignment(
        tokens, tokenizer, refine_whisper_precision_nframes, unfinished_decoding
    )
    if plan.empty:
        return []
    tokens = plan.tokens
    start_token, end_token = plan.start_token, plan.end_token
    unfinished_decoding = plan.unfinished

    start_time = start_token * AUDIO_TIME_PER_TOKEN

    split_tokens = split_tokens_on_spaces if use_space else split_tokens_on_unicode
    words, word_tokens, word_tokens_indices = split_tokens(
        tokens, tokenizer, remove_punctuation_from_words=remove_punctuation_from_words
    )

    # final punctuation grouped with the final timestamp rather than trailing
    # silence/noise
    num_punctuations_per_tokens = [
        0 if len(w) == 1 or w[-1] not in _punctuation else 1 for w in word_tokens
    ]
    if include_punctuation_in_timing:
        num_punctuations_per_tokens[:-2] = [0] * (len(num_punctuations_per_tokens) - 2)

    if precomputed_jumps is not None:
        # the batched on-device aligner already ran cost+DTW for the planned
        # token sequence; disfluency peak detection needs its cost rows too
        assert not plot
        assert not detect_disfluencies or precomputed_cost is not None
        jumps = np.asarray(precomputed_jumps, np.int64)
        assert len(jumps) == len(tokens) + 1, (
            f"Jumps have wrong length: {len(jumps)} != {len(tokens) + 1}"
        )
        weights = None if precomputed_cost is None else np.asarray(precomputed_cost)
        if weights is not None:
            assert weights.shape[0] == len(tokens), (
                f"Cost has wrong row count: {weights.shape[0]} != {len(tokens)}"
            )
    else:
        attention_scores = np.asarray(attention_scores)
        assert attention_scores.shape[0] > int(plan.row_indices.max()), (
            f"Attention has wrong length: {attention_scores.shape[0]} rows, "
            f"need row {int(plan.row_indices.max())}"
        )
        attention_scores = attention_scores[plan.row_indices]

        # (n_tokens, K, ctx) -> (K, n_tokens, span)
        sliced = np.transpose(attention_scores, (1, 0, 2))[..., start_token:end_token]
        if use_device_kernels and medfilt_width == 9 and qk_scale == 1.0:
            weights = _attention_to_cost_device(sliced)
        else:
            weights = _attention_to_cost(sliced, medfilt_width, qk_scale)
        worse_weight = 0.0

        if max_duration:
            if start_token < max_duration:
                # NOTE: column index is absolute in the reference even though the
                # matrix is sliced (transcribe.py:1565) — kept for parity
                weights[:-1, max_duration:] = worse_weight

        # encourage the path to start early
        weights[0, 0] = weights.min()

        if use_device_kernels and subwords_can_be_empty:
            from .ops.pallas_kernels import dtw_path_pallas

            index1s, index2s = dtw_path_pallas(weights)
        else:
            index1s, index2s = dtw_path(weights, allow_vertical=subwords_can_be_empty)

        jumps = np.diff(index1s)
        jumps = np.pad(jumps, (1, 0), constant_values=1).astype(bool)
        jumps = index2s[jumps]
        jumps = np.pad(jumps, (0, 1), constant_values=index2s[-1])

    jumps_start = jumps
    disfluences = {}
    peak_traces = [] if (plot and detect_disfluencies) else None
    if detect_disfluencies:
        jumps_start = jumps.copy()
        for i_token, (tok_id, begin, end) in enumerate(zip(tokens, jumps[:-1], jumps[1:])):
            attention_row = -weights[i_token, begin:end]
            peaks, properties = find_peaks(attention_row, width=3, prominence=0.02)
            if peak_traces is not None:
                peak_traces.append(
                    (int(begin), int(end), attention_row, peaks, properties)
                )
            if len(peaks) > 1:
                if "left_ips" in properties:
                    left = [round(x) for x in properties["left_ips"]]
                else:
                    left = properties["left_bases"]
                new_begin = left[-1] + begin
                jumps_start[i_token] = new_begin
                if new_begin != begin:
                    is_punctuation = (
                        tokenizer.decode_with_timestamps([tok_id]) in _punctuation
                    )
                    if not is_punctuation:
                        disfluences[i_token] = (begin, jumps_start[i_token])
                    else:
                        disfluences[i_token + 1] = (begin, end)

    word_boundaries = np.cumsum([len(t) for t in word_tokens])
    word_boundaries = np.pad(word_boundaries, (1, 0))
    begin_times = jumps_start[word_boundaries[:-1]]
    end_times = jumps[word_boundaries[1:] - num_punctuations_per_tokens]

    begin_times = begin_times * AUDIO_TIME_PER_TOKEN
    end_times = end_times * AUDIO_TIME_PER_TOKEN

    if detect_disfluencies:
        to_be_added = []
        i_start = 0
        for i_word, toks in enumerate(word_tokens[:-1]):
            i_end = i_start + len(toks)
            if i_start in disfluences and i_word > 0:
                begin, end = disfluences[i_start]
                to_be_added.append(
                    (i_word, begin * AUDIO_TIME_PER_TOKEN, end * AUDIO_TIME_PER_TOKEN)
                )
            i_start = i_end
        for i_word, begin, end in to_be_added[::-1]:
            words.insert(i_word, DISFLUENCY_MARK)
            word_tokens.insert(i_word, [])
            word_tokens_indices.insert(i_word, [])
            begin_times = np.insert(begin_times, i_word, begin)
            end_times = np.insert(end_times, i_word, end)

    # edge rules: ignore the start/end timestamp pseudo-words.
    # (len guards are ours: a segment whose only text is an incomplete UTF-8
    # byte produces a single pseudo-word; the reference would crash here)
    if not refine_whisper_precision_nframes and len(begin_times) > 1:
        begin_times[1] = begin_times[0]
    if not refine_whisper_precision_nframes and len(end_times) > 1:
        end_times[-2] = end_times[-1]
    if unfinished_decoding:
        words = words[1:]
        word_tokens = word_tokens[1:]
        word_tokens_indices = word_tokens_indices[1:]
        begin_times = begin_times[1:]
        end_times = end_times[1:]
    else:
        words = words[1:-1]
        word_tokens = word_tokens[1:-1]
        word_tokens_indices = word_tokens_indices[1:-1]
        begin_times = begin_times[1:-1]
        end_times = end_times[1:-1]

    out = [
        dict(
            text=word,
            start=round_timestamp(begin + start_time),
            end=round_timestamp(end + start_time),
            tokens=toks,
            tokens_indices=toks_indices,
        )
        for word, begin, end, toks, toks_indices in zip(
            words, begin_times, end_times, word_tokens, word_tokens_indices
        )
        if not word.startswith("<|")
    ]
    if plot:
        from .plotting import plot_alignment

        plot_alignment(
            weights, index1s, index2s, out, start_time, plot,
            mfcc=plot_mfcc, mfcc_span=(start_token, end_token),
            peak_traces=peak_traces,
        )
    return out
