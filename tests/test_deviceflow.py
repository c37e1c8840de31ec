"""Device-flow state oracles: the jitted seek/prompt-history rules must match
the host path (``extract_window_segments`` / ``DecodeEngine.build_prompt``)
bit-for-bit — the fast path dispatches window N+1 from this state before the
host ever sees window N's tokens."""

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_timestamped_tpu.audio import N_FRAMES
from whisper_timestamped_tpu.decoding import PROMPT_REGION
from whisper_timestamped_tpu.engine import WindowDecodeResult, extract_window_segments
from whisper_timestamped_tpu.parallel.deviceflow import (
    WindowState,
    advance_window_state,
    build_prompt_batch,
    initial_state,
)

from model_utils import make_tokenizer

TOK = make_tokenizer(language="en", task="transcribe")
EOT = TOK.eot
TSB = TOK.timestamp_begin
M = 48  # decode budget for these tests


def _row(spec):
    """Token row from a compact spec: 't'=text token, int=timestamp position,
    'E'=eot terminator; eot-padded to M."""
    rng = np.random.default_rng(hash(str(spec)) % 2**32)
    out = []
    for s in spec:
        if s == "t":
            out.append(int(rng.integers(100, 2000)))
        elif s == "E":
            break
        else:
            out.append(TSB + int(s))
    out = out[:M]
    return np.asarray(out + [EOT] * (M - len(out)), np.int32)


def _host_result(tokens_row):
    toks = tokens_row.tolist()
    n = toks.index(EOT) if EOT in toks else len(toks)
    return WindowDecodeResult(
        tokens=toks[:n],
        text="",
        avg_logprob=-0.1,
        no_speech_prob=0.0,
        temperature=0.0,
        compression_ratio=1.0,
        token_logprobs=np.zeros(n),
        attn=None,
        sum_logprob=-0.1,
        ts_logprobs=None,
        eot_attn=None,
        hit_limit=n == len(toks),
        batch_index=0,
        n_text=n,
    )


CASES = [
    # plain text, single trailing timestamp -> full advance, all consumed
    ["t", "t", 0, "t", "t", 30, "E"],
    # consecutive pair mid-window, trailing incomplete segment -> partial
    [0, "t", "t", 40, 40, "t", "t", "E"],
    # consecutive pair AND single-timestamp ending -> full advance
    [0, "t", 40, 40, "t", "t", 99, "E"],
    # two consecutive pairs -> seek to the LAST pair's first timestamp
    [0, "t", 20, 20, "t", "t", 61, 61, "t", "E"],
    # empty window (immediate eot)
    ["E"],
    # no timestamps at all
    ["t", "t", "t", "E"],
    # hit the token limit (no eot)
    ["t"] * M,
    # timestamp-only pair at position 0 then pair later
    [0, 0, "t", 12, 12, "t", "E"],
]


def test_advance_matches_host_rule():
    B = len(CASES)
    tokens = np.stack([_row(c) for c in CASES])
    seeks = np.asarray([0, 100, 3000, 0, 0, 0, 500, 0], np.int32)
    content = np.asarray([9000, 2900, 3100, 9000, 1000, 2000, 3400, 9000], np.int32)
    H = 64
    state = WindowState(
        seek=jnp.asarray(seeks),
        done=jnp.asarray(np.zeros(B, bool)),
        hist=jnp.full((B, H), EOT, jnp.int32),
        count=jnp.zeros((B,), jnp.int32),
    )
    new = advance_window_state(
        jnp.asarray(tokens), state, jnp.asarray(content), eot=EOT, ts_begin=TSB
    )
    new_seek = np.asarray(new.seek)
    new_count = np.asarray(new.count)
    new_hist = np.asarray(new.hist)
    for b in range(B):
        segs, host_seek = extract_window_segments(
            _host_result(tokens[b]),
            int(seeks[b]),
            min(N_FRAMES, int(content[b] - seeks[b])),
            TOK,
            no_speech_threshold=None,
            logprob_threshold=None,
        )
        assert new_seek[b] == host_seek, (b, CASES[b])
        consumed = [t for s in segs for t in s.tokens]
        assert new_count[b] == min(len(consumed), H), (b, CASES[b])
        if consumed:
            assert new_hist[b, H - len(consumed):].tolist() == consumed, (b, CASES[b])
        assert bool(np.asarray(new.done)[b]) == (host_seek >= int(content[b]))


def test_advance_no_speech_skip_matches_host_rule():
    """With quality thresholds set, the device advance computes whisper's
    no-speech window skip (full advance, nothing enters the history) exactly
    like extract_window_segments' skip branch."""
    import dataclasses

    B = len(CASES)
    tokens = np.stack([_row(c) for c in CASES])
    rng = np.random.default_rng(5)
    nsp = rng.uniform(0.0, 1.0, B).astype(np.float32)
    sum_lp = rng.uniform(-40.0, 0.0, B).astype(np.float32)
    seeks = np.zeros(B, np.int32)
    content = np.full(B, 9000, np.int32)
    H = 64
    for thr, lp_thr in [(0.5, -1.0), (0.5, None), (0.0, -0.5)]:
        state = WindowState(
            seek=jnp.asarray(seeks),
            done=jnp.asarray(np.zeros(B, bool)),
            hist=jnp.full((B, H), EOT, jnp.int32),
            count=jnp.zeros((B,), jnp.int32),
        )
        new = advance_window_state(
            jnp.asarray(tokens), state, jnp.asarray(content), eot=EOT, ts_begin=TSB,
            no_speech_prob=jnp.asarray(nsp), sum_logprobs=jnp.asarray(sum_lp),
            no_speech_threshold=thr, logprob_threshold=lp_thr,
        )
        for b in range(B):
            base = _host_result(tokens[b])
            n = len(base.tokens)
            res = dataclasses.replace(
                base, no_speech_prob=float(nsp[b]),
                avg_logprob=float(sum_lp[b]) / (n + 1), sum_logprob=float(sum_lp[b]),
            )
            segs, host_seek = extract_window_segments(
                res, 0, min(N_FRAMES, int(content[b])), TOK,
                no_speech_threshold=thr, logprob_threshold=lp_thr,
            )
            assert int(new.seek[b]) == host_seek, (b, thr, lp_thr, CASES[b])
            consumed = [t for s in segs for t in s.tokens]
            assert int(new.count[b]) == min(len(consumed), H), (b, thr, lp_thr)


def test_advance_frozen_when_done():
    tokens = np.stack([_row(["t", 5, "E"])] * 2)
    state = WindowState(
        seek=jnp.asarray([50, 80], jnp.int32),
        done=jnp.asarray([True, False]),
        hist=jnp.full((2, 16), EOT, jnp.int32),
        count=jnp.asarray([3, 0], jnp.int32),
    )
    new = advance_window_state(
        jnp.asarray(tokens), state, jnp.asarray([40, 3080], jnp.int32),
        eot=EOT, ts_begin=TSB,
    )
    assert int(new.seek[0]) == 50 and bool(new.done[0])
    assert int(new.count[0]) == 3  # history untouched on done rows


@pytest.mark.parametrize("multilingual", [True, False])
def test_build_prompt_matches_host(multilingual):
    from whisper_timestamped_tpu.decoding import DecodingOptions
    from whisper_timestamped_tpu.engine import DecodeEngine

    tok = make_tokenizer(
        language="en" if multilingual else None,
        task="transcribe" if multilingual else None,
        multilingual=multilingual,
    )

    class _Eng:  # build_prompt only touches tokenizer + dims
        tokenizer = tok

        class dims:
            n_text_ctx = 448

    H = 448 // 2 - 1
    rng = np.random.default_rng(0)
    histories = [
        [],
        [5, 6, 7],
        rng.integers(100, 2000, size=H).tolist(),
        rng.integers(100, 2000, size=H + 90).tolist(),  # overflows the budget
    ]
    B = len(histories)
    hist = np.full((B, H), tok.eot, np.int32)
    count = np.zeros((B,), np.int32)
    for i, h in enumerate(histories):
        tail = h[-H:]
        if tail:
            hist[i, H - len(tail):] = tail
        count[i] = min(len(h), H)

    sot_seq = [tok.sot]
    if multilingual:
        sot_seq += [tok.to_language_token("en"), tok.transcribe]
    sot_arr = np.tile(np.asarray(sot_seq, np.int32)[None], (B, 1))

    buf, plen = build_prompt_batch(
        jnp.asarray(hist), jnp.asarray(count), jnp.asarray(sot_arr),
        region=PROMPT_REGION, eot=tok.eot, sot_prev=tok.sot_prev,
    )
    buf, plen = np.asarray(buf), np.asarray(plen)
    opts = DecodingOptions(language="en" if multilingual else None)
    for i, h in enumerate(histories):
        ref_buf, ref_len, ref_sfe = DecodeEngine.build_prompt(
            _Eng(), h, opts, region=PROMPT_REGION
        )
        assert plen[i] == ref_len, i
        # junk slots left of the valid region may differ; the decode program
        # masks them via prompt_len
        assert buf[i, PROMPT_REGION - ref_len:].tolist() == \
            ref_buf[PROMPT_REGION - ref_len:].tolist(), i
        assert ref_sfe == len(sot_seq)


@pytest.fixture(scope="module")
def model():
    pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from whisper_timestamped_tpu.models.load import WhisperModel
    from model_utils import make_hf_model, hf_model_to_jax

    m = make_hf_model(seed=0)
    params, dims = hf_model_to_jax(m)
    return WhisperModel(
        params=jax.tree.map(jnp.asarray, params),
        dims=dims,
        alignment_heads=[(0, 1), (1, 0), (1, 2)],
    )


def _audio(seed, seconds):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(int(16000 * seconds)) * 0.1).astype(np.float32)


def _run_batch(model, flow: bool, *, device_alignment: bool,
               no_speech_threshold=None, logprob_threshold=None, **kw):
    import os

    from whisper_timestamped_tpu.parallel.batch import transcribe_batch

    # staggered lengths: streams finish at different iterations, so the flow
    # keeps decoding done rows while others continue
    audios = {"a": _audio(0, 15), "b": _audio(1, 35), "c": _audio(2, 65)}
    os.environ["WTT_DEVICE_FLOW"] = "1" if flow else "0"
    try:
        return transcribe_batch(
            model, audios, TOK, language="en", batch_size=4,
            temperature=[0.0], no_speech_threshold=no_speech_threshold,
            logprob_threshold=logprob_threshold,
            device_alignment=device_alignment, **kw,
        )
    finally:
        os.environ.pop("WTT_DEVICE_FLOW", None)


@pytest.mark.parametrize("device_alignment", [False, True])
def test_flow_matches_host_loop(model, device_alignment):
    """The device-flow fast path must produce byte-identical results to the
    host window loop (same programs, same greedy tokens, same alignment)."""
    ref = _run_batch(model, False, device_alignment=device_alignment)
    got = _run_batch(model, True, device_alignment=device_alignment)
    assert got == ref


def test_flow_matches_host_loop_unconditioned(model):
    """condition_on_previous_text=False: the flow uses the small constant
    prompt region every window."""
    ref = _run_batch(
        model, False, device_alignment=True,
        condition_on_previous_text=False, initial_prompt="hello there",
    )
    got = _run_batch(
        model, True, device_alignment=True,
        condition_on_previous_text=False, initial_prompt="hello there",
    )
    assert got == ref


def test_flow_matches_host_loop_with_thresholds(model):
    """Quality thresholds (the reference defaults, transcribe.py:111-113)
    engage the no-speech skip ON DEVICE and must not force the host loop or
    change the output."""
    kw = dict(device_alignment=True, no_speech_threshold=0.6,
              logprob_threshold=-1.0)
    ref = _run_batch(model, False, **kw)
    got = _run_batch(model, True, **kw)
    assert got == ref


def test_initial_state_roundtrip():
    state, frames = initial_state(
        [[1, 2, 3], list(range(400))],
        [100, 3000],
        [5000, 2900],
        batch_size=4,
        hist_len=223,
        eot=EOT,
    )
    assert np.asarray(state.seek).tolist() == [100, 3000, 0, 0]
    assert np.asarray(state.done).tolist() == [False, True, True, True]
    assert int(state.count[1]) == 223
    assert np.asarray(state.hist)[1, -223:].tolist() == list(range(400))[-223:]
    assert np.asarray(frames).tolist() == [5000, 2900, 0, 0]


def test_pack_split_host_outputs_roundtrip():
    """The packed single-read drain must reproduce every lane exactly —
    including int32 token ids that bitcast to NaN/denormal float patterns."""
    from whisper_timestamped_tpu.parallel.deviceflow import (
        pack_host_outputs,
        split_host_outputs,
    )

    B, M, H = 5, 12, 8
    rng = np.random.default_rng(0)
    # adversarial ids: NaN-pattern (0x7fc00000), negative, zero, max int32
    tokens = rng.integers(0, 2**31 - 1, (B, M), dtype=np.int32)
    tokens[0, 0] = 0x7FC00000
    tokens[1, 1] = -1
    tokens[2, 2] = 0
    tokens[3, 3] = np.int32(2**31 - 1)
    lp = rng.standard_normal((B, M)).astype(np.float32)
    sums = rng.standard_normal(B).astype(np.float32)
    nsp = rng.random(B).astype(np.float32)
    state = WindowState(
        seek=jnp.asarray([0, 1, 2**30, -7, 2999], jnp.int32),
        done=jnp.asarray([True, False, True, False, False]),
        hist=jnp.zeros((B, H), jnp.int32),
        count=jnp.zeros((B,), jnp.int32),
    )
    packed = pack_host_outputs(
        jnp.asarray(tokens), jnp.asarray(lp), jnp.asarray(sums),
        jnp.asarray(nsp), state,
    )
    assert packed.shape == (B, 2 * M + 4)
    t2, lp2, s2, n2, d2, k2 = split_host_outputs(np.asarray(packed), M)
    np.testing.assert_array_equal(t2, tokens)
    np.testing.assert_array_equal(lp2, lp)
    np.testing.assert_array_equal(s2, sums)
    np.testing.assert_array_equal(n2, nsp)
    np.testing.assert_array_equal(d2, np.asarray(state.done))
    np.testing.assert_array_equal(k2, np.asarray(state.seek))
