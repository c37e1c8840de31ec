"""Tokenizer tests: BPE correctness vs GPT-2 oracle, special layout, round-trips."""

import numpy as np
import pytest

from whisper_timestamped_tpu.tokenizer import (
    BytePairEncoder,
    Tokenizer,
    get_tokenizer,
    load_hf_vocab_ranks,
    synthetic_ranks,
    _bytes_to_unicode,
)
from whisper_timestamped_tpu.languages import LANGUAGES


def make_tok(**kw):
    return get_tokenizer(ranks=synthetic_ranks(), **kw)


def test_special_layout_multilingual_v2_geometry():
    # With n_base=50257 and 99 languages the official ids must come out.
    ranks = {bytes([0]): 0, b"\x00\x01": 50256}  # fake: max rank 50256 -> n_base 50257
    t = Tokenizer(bpe=BytePairEncoder(ranks), multilingual=True, num_languages=99)
    assert t.eot == 50257
    assert t.sot == 50258
    assert t.translate == 50358
    assert t.transcribe == 50359
    assert t.no_speech == 50362
    assert t.no_timestamps == 50363
    assert t.timestamp_begin == 50364
    assert t.n_vocab == 51865


def test_special_layout_english_geometry():
    ranks = {b"\x00\x01": 50255}
    t = Tokenizer(bpe=BytePairEncoder(ranks), multilingual=False, num_languages=99)
    assert t.eot == 50256
    assert t.sot == 50257
    assert t.no_timestamps == 50362
    assert t.timestamp_begin == 50363
    assert t.n_vocab == 51864


def test_special_layout_v3_geometry():
    ranks = {b"\x00\x01": 50256}
    t = Tokenizer(bpe=BytePairEncoder(ranks), multilingual=True, num_languages=100)
    assert t.timestamp_begin == 50365
    assert t.n_vocab == 51866
    assert t.to_language_token("yue") == t.sot + 1 + 99


def test_roundtrip_ascii_and_unicode():
    t = make_tok()
    for text in ["hello world", " bonjour, vous allez bien ?", "日本語のテスト", "مرحبا", "a  b   c"]:
        ids = t.encode(text)
        assert t.decode(ids) == text


def test_bpe_matches_gpt2_oracle():
    # transformers ships the GPT-2 BPE algorithm; build a tiny HF-style vocab and
    # check our merges agree with tokenizers' byte-level BPE on the same tables.
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer as HFTok
    from tokenizers.models import BPE
    from tokenizers.pre_tokenizers import ByteLevel

    b2u = _bytes_to_unicode()

    def to_u(bs):
        return "".join(b2u[b] for b in bs)

    ranks = synthetic_ranks()
    vocab = {to_u(k): v for k, v in ranks.items()}
    merge_tokens = sorted((v, k) for k, v in ranks.items() if len(k) > 1)
    merges = []
    known = {bytes([i]) for i in range(256)}
    for _, tok in merge_tokens:
        # rank-based BPE (tiktoken-style, what whisper uses) merges on any
        # decomposition whose concatenation is in the vocab — list them all so
        # the HF merges-list model behaves identically on this vocabulary.
        splits = [i for i in range(1, len(tok)) if tok[:i] in known and tok[i:] in known]
        if not splits:
            pytest.skip("synthetic vocab not decomposable (test setup issue)")
        for i in splits:
            merges.append((to_u(tok[:i]), to_u(tok[i:])))
        known.add(tok)
    hf = HFTok(BPE(vocab=vocab, merges=merges))
    hf.pre_tokenizer = ByteLevel(add_prefix_space=False, use_regex=True)
    ours = make_tok()
    for text in ["the theatre is on", " you and he said yes", "hello goodnight", "it is of and"]:
        assert ours.encode(text) == hf.encode(text).ids, text


def test_decode_skips_specials_and_timestamps():
    t = make_tok(language="en", task="transcribe")
    ids = list(t.sot_sequence) + t.encode(" hi") + [t.timestamp_begin + 25, t.eot]
    assert t.decode(ids) == " hi"
    s = t.decode_with_timestamps(ids)
    assert "<|0.50|>" in s and "<|startoftranscript|>" in s and "<|en|>" in s


def test_sot_sequences():
    t = make_tok(language="fr", task="transcribe")
    assert t.sot_sequence == (t.sot, t.to_language_token("fr"), t.transcribe)
    assert t.sot_sequence_including_notimestamps[-1] == t.no_timestamps
    t2 = make_tok(language="fr", task="translate")
    assert t2.sot_sequence[-1] == t2.translate
    t3 = get_tokenizer(ranks=synthetic_ranks(), multilingual=False)
    assert t3.sot_sequence == (t3.sot,)


def test_language_tokens_complete():
    t = make_tok()
    assert len(t.all_language_tokens) == 99
    assert t.to_language_token("french") == t.to_language_token("fr")
    with pytest.raises(ValueError):
        t.to_language_token("klingon")


def test_non_speech_tokens():
    t = make_tok()
    nst = t.non_speech_tokens
    assert len(nst) > 10
    assert all(i < t.eot for i in nst)
    # '#' must be suppressed (single byte token in synthetic vocab)
    assert t.encode("#")[0] in nst


def test_hf_vocab_loading(tmp_path):
    import json

    b2u = _bytes_to_unicode()
    ranks = synthetic_ranks(8)
    vocab = {"".join(b2u[b] for b in k): v for k, v in ranks.items()}
    vocab["<|endoftext|>"] = 320
    p = tmp_path / "vocab.json"
    p.write_text(json.dumps(vocab), encoding="utf-8")
    loaded = load_hf_vocab_ranks(str(p))
    assert loaded == ranks


def test_languages_table():
    assert len(LANGUAGES) == 100
    assert list(LANGUAGES)[0] == "en"
    assert list(LANGUAGES)[-1] == "yue"


def test_encode_allowed_special_maps_specials_and_timestamps():
    from model_utils import make_tokenizer

    t = make_tokenizer()
    # named specials map to their ids
    ids = t.encode("<|startoftranscript|>", allowed_special="all")
    assert ids == [t.sot]
    # timestamp literals are registered specials in tiktoken/whisper: they
    # must resolve to timestamp ids, not byte-BPE of the literal text
    assert t.encode("<|0.00|>", allowed_special="all") == [t.timestamp_begin]
    assert t.encode("<|1.50|>", allowed_special="all") == [t.timestamp_begin + 75]
    assert t.encode("<|30.00|>", allowed_special="all") == [t.timestamp_begin + 1500]
    # non-multiples of 20 ms are NOT registered: byte-BPE'd as text
    assert len(t.encode("<|0.01|>", allowed_special="all")) > 1
    # without allowed_special, the literal is byte-BPE'd
    assert len(t.encode("<|0.00|>")) > 1
    # a specific allow-set works for timestamps too
    assert t.encode("<|0.02|>", allowed_special={"<|0.02|>"}) == [t.timestamp_begin + 1]
