"""Alignment-core tests: token splitting, DTW word timing, disfluency insertion."""

import numpy as np
import pytest

from whisper_timestamped_tpu.alignment import (
    DISFLUENCY_MARK,
    perform_word_alignment,
    split_tokens_on_spaces,
    split_tokens_on_unicode,
)

from model_utils import make_tokenizer


@pytest.fixture(scope="module")
def tok():
    return make_tokenizer(language="en", task="transcribe")


def enc(tok, text):
    return tok.encode(text)


def test_split_on_spaces_basic(tok):
    tokens = enc(tok, " hello world, ok")
    words, word_tokens, word_idx = split_tokens_on_spaces(tokens, tok)
    assert words == ["hello", "world,", "ok"]
    # punctuation attaches to the previous word
    assert "".join(word_tokens[1]).strip() == "world,"
    # indices round-trip to the original tokens
    flat = [t for wi in word_idx for t in wi]
    assert flat == tokens


def test_split_with_timestamp_tokens(tok):
    ts = tok.timestamp_begin
    tokens = [ts] + enc(tok, " yes no") + [ts + 100]
    words, word_tokens, _ = split_tokens_on_spaces(tokens, tok)
    assert words[0] == "<|0.00|>"
    assert words[-1] == "<|2.00|>"
    assert words[1:-1] == ["yes", "no"]


def test_split_on_unicode_multibyte(tok):
    # CJK text: each char is 3 bytes -> tokens split mid-character produce
    # U+FFFD until the char completes
    text = "日本語"
    tokens = enc(tok, text)
    assert len(tokens) == 9  # byte-level fallback
    words, word_tokens, word_idx = split_tokens_on_unicode(tokens, tok)
    assert words == ["日", "本", "語"]
    assert all(len(wi) == 3 for wi in word_idx)
    # empty-string placeholders keep token counts aligned
    assert all(len(wt) == 3 for wt in word_tokens)


def test_split_double_spaces(tok):
    tokens = enc(tok, " a  b")
    words, _, word_idx = split_tokens_on_spaces(tokens, tok)
    assert [w for w in words] == ["a", "b"]
    assert [t for wi in word_idx for t in wi] == tokens


def test_punctuation_only_isolated(tok):
    words, _, _ = split_tokens_on_unicode(enc(tok, "..."), tok)
    # leading punctuation with no previous word creates an empty-word bucket
    assert len(words) == 1


def _synthetic_attention(n_tokens, frame_blocks, K=4, ctx=1500, noise=0.01, seed=0):
    """Attention scores with token i peaked over frame_blocks[i] = (lo, hi)."""
    rng = np.random.default_rng(seed)
    scores = rng.standard_normal((n_tokens, K, ctx)).astype(np.float32) * noise
    for i, (lo, hi) in enumerate(frame_blocks):
        scores[i, :, lo:hi] += 6.0
    return scores


def test_alignment_recovers_block_structure(tok):
    ts = tok.timestamp_begin
    words_text = " aa bb cc"
    tokens_text = enc(tok, words_text)
    assert len(tokens_text) == 6
    tokens = [ts] + tokens_text + [ts + 150]  # 0.0 .. 3.0 s
    # token i attends to its own 20-frame block: word k spans blocks 2k..2k+1
    blocks = [(0, 2)] + [(10 + 20 * i, 30 + 20 * i) for i in range(6)] + [(140, 150)]
    attn = _synthetic_attention(8, blocks)
    words = perform_word_alignment(tokens, attn, tok, detect_disfluencies=False)
    assert [w["text"] for w in words] == ["aa", "bb", "cc"]
    for w in words:
        assert 0.0 <= w["start"] <= w["end"] <= 3.0
    # word k starts near its first token's block: blocks at 10,50,90 -> 0.2,1.0,1.8s
    starts = [w["start"] for w in words]
    assert starts == sorted(starts)
    assert abs(starts[1] - 1.0) < 0.4 and abs(starts[2] - 1.8) < 0.4
    # structural contract of the output dicts
    assert all(set(w) == {"text", "start", "end", "tokens", "tokens_indices"} for w in words)


def test_alignment_empty_segment(tok):
    ts = tok.timestamp_begin
    out = perform_word_alignment([ts, ts], np.zeros((2, 2, 1500), np.float32), tok)
    assert out == []


def test_alignment_missing_end_token_unfinished(tok):
    ts = tok.timestamp_begin
    tokens = [ts] + enc(tok, " ok then")  # decoding stuck: no final timestamp
    attn = _synthetic_attention(len(tokens), [(0, 2)] + [(20 * i, 20 * i + 20) for i in range(len(tokens) - 1)])
    words = perform_word_alignment(
        tokens, attn, tok, detect_disfluencies=False, unfinished_decoding=True
    )
    assert [w["text"] for w in words] == ["ok", "then"]


def test_alignment_too_many_tokens_truncates(tok):
    ts = tok.timestamp_begin
    # 30 tokens into a 10-position window -> recursive truncation path
    body = enc(tok, " " + " ".join(["word"] * 14))
    tokens = [ts] + body + [ts + 10]
    n = len(tokens)
    attn = _synthetic_attention(n, [(0, 5)] * n, ctx=1500)
    words = perform_word_alignment(tokens, attn, tok, detect_disfluencies=False)
    assert len(words) >= 1  # truncated but aligned


def test_alignment_missing_start_raises(tok):
    with pytest.raises(RuntimeError):
        perform_word_alignment(
            enc(tok, " no start ts"), np.zeros((4, 2, 1500), np.float32), tok
        )


def test_disfluency_insertion(tok):
    ts = tok.timestamp_begin
    tokens_text = enc(tok, " aa bb")
    assert len(tokens_text) == 4
    tokens = [ts] + tokens_text + [ts + 100]
    blocks = [(0, 2), (5, 15), (18, 28), (60, 70), (73, 83), (95, 100)]
    attn = _synthetic_attention(6, blocks, noise=0.001)
    # token 3 (first token of word 'bb') gets TWO strong attention peaks:
    # an early (disfluent) one and the real one
    attn[3, :, 35:42] += 6.0
    words = perform_word_alignment(tokens, attn, tok, detect_disfluencies=True)
    texts = [w["text"] for w in words]
    assert "aa" in texts and "bb" in texts
    if DISFLUENCY_MARK in texts:  # inserted before 'bb'
        assert texts.index(DISFLUENCY_MARK) < texts.index("bb")
        star = words[texts.index(DISFLUENCY_MARK)]
        assert star["tokens"] == [] and star["start"] <= star["end"]


def test_alignment_max_duration_masking(tok):
    ts = tok.timestamp_begin
    tokens = [ts] + enc(tok, " aa bb") + [ts + 200]
    n = len(tokens)
    # all attention mass beyond the padding boundary
    attn = _synthetic_attention(n, [(180, 190)] * n, noise=0.001)
    with_mask = perform_word_alignment(
        tokens, attn, tok, max_duration=50, detect_disfluencies=False
    )
    # masked: words cannot *start* after 50 positions (1.0 s)
    assert all(w["start"] <= 1.02 for w in with_mask), with_mask


def test_split_language_token_mid_text(tok):
    """A language token mid-text (reference issue #61's '<|te|>' case) decodes
    to nothing and rides along inside the surrounding word's token list."""
    te = tok.to_language_token("te")
    tokens = enc(tok, " hello") + [te] + enc(tok, " world")
    words, word_tokens, word_idx = split_tokens_on_spaces(tokens, tok)
    assert [w for w in words if w] == ["hello", "world"]
    flat = [t for wi in word_idx for t in wi]
    assert flat == tokens  # nothing lost
