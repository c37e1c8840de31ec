"""Golden-file non-regression harness.

Same strategy as the reference's test suite (``tests/test_transcribe.py:94-198``):
run a fixed configuration end-to-end, store the first run's words.json under
``tests/expected/``, and compare later runs after rounding every float to one
decimal (the reference's ``loose`` tolerance). Regenerate with
``GENERATE_EXPECTED=1 python -m pytest tests/test_golden.py``.

Models are synthetic (no downloads), so these goldens pin OUR pipeline's
behavior — decode order, segmentation, alignment, confidence rounding — not
the official checkpoints' outputs.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_timestamped_tpu.api import transcribe_timestamped
from whisper_timestamped_tpu.models.load import WhisperModel

from model_utils import make_hf_model, hf_model_to_jax, make_tokenizer

pytest.importorskip("torch")

EXPECTED_DIR = os.path.join(os.path.dirname(__file__), "expected")
GENERATE = os.environ.get("GENERATE_EXPECTED") == "1"


def loose(obj):
    """Round every float to 1 decimal (reference tests/test_transcribe.py:185-198)."""
    if isinstance(obj, float):
        return round(obj, 1)
    if isinstance(obj, dict):
        return {k: loose(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [loose(v) for v in obj]
    return obj


def assert_non_regression(result: dict, name: str):
    os.makedirs(EXPECTED_DIR, exist_ok=True)
    path = os.path.join(EXPECTED_DIR, name + ".words.json")
    if GENERATE or not os.path.exists(path):
        with open(path, "w", encoding="utf-8") as f:
            json.dump(result, f, indent=2, ensure_ascii=False)
        if not GENERATE:
            pytest.skip(f"generated golden {name}")
        return
    with open(path, encoding="utf-8") as f:
        expected = json.load(f)
    assert loose(result) == loose(expected), f"regression vs golden {name}"


@pytest.fixture(scope="module")
def model():
    m = make_hf_model(seed=0)
    params, dims = hf_model_to_jax(m)
    return WhisperModel(
        params=jax.tree.map(jnp.asarray, params),
        dims=dims,
        alignment_heads=[(0, 1), (1, 0), (1, 2)],
    )


@pytest.fixture(scope="module")
def tok():
    return make_tokenizer()


def _audio(seed, seconds):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(16000 * seconds) * 0.1).astype(np.float32)


# Config matrix mirroring the reference's expected-dir classes
# (/root/reference/tests/expected/, matrix at test_transcribe.py:300-650).
# Special keys: _audio=(seed, seconds) picks the input; _tok overrides the
# tokenizer kwargs; keys colliding with the base kwargs override them
# (e.g. thresholds for the fallback/no-speech classes).
# See tests/expected/README.md for the config -> reference-dir mapping.
CONFIGS = {
    # language matrix (ref: tiny_fr/medium_fr, tiny_auto/medium_auto)
    "efficient_greedy": dict(language="en"),
    "autodetect_language": dict(),
    # alignment options (ref: corner_cases, punctuations_no/yes)
    "disfluencies": dict(language="en", detect_disfluencies=True),
    "no_refine": dict(language="en", refine_whisper_precision=0.0),
    "punctuation_stripped": dict(language="en", remove_punctuation_from_words=True),
    "confidence_punct": dict(language="en", include_punctuation_in_confidence=True),
    # engines (ref: naive, naive.cuda; accurate preset)
    "naive": dict(language="en", naive_approach=True),
    "beam3": dict(language="en", beam_size=3),
    # trust_whisper_timestamps=False in BOTH engines (the reference supports
    # it efficient-side at transcribe.py:585-707 and naive-side at :1178-1202)
    "recompute_all": dict(language="en", trust_whisper_timestamps=False,
                          naive_approach=True),
    "recompute_all_efficient": dict(language="en",
                                    trust_whisper_timestamps=False),
    # VAD classes (ref: verbose/vad_* stdout dirs; auditok variant)
    "vad_explicit": dict(language="en", vad=[(0.0, 3.0), (4.0, 6.0)]),
    "vad_auditok": dict(language="en", vad="auditok"),
    # monolingual *.en models on foreign audio (ref: tiny.en, small.en,
    # TestTranscribeMonolingual) — no language detection, bare sot sequence
    "monolingual_en": dict(_tok=dict(multilingual=False)),
    # unspaced language (ref: TestTranscribeUnspacedLanguage, ja)
    "unspaced_ja": dict(language="ja"),
    # task=translate flag parity
    "translate_task": dict(language="fr", task="translate"),
    # decode strategies (ref: corner_cases temperature tests, best_of)
    "temperature_sampling": dict(language="en", temperature=0.7),
    "best_of2": dict(language="en", temperature=0.7, best_of=2),
    # temperature fallback ACTUALLY TRIGGERING (ref: corner_cases random.wav —
    # random-weight logprobs sit far below -0.5, so t=0.0 fails the check and
    # the 0.2 retry's sampled output is kept; reference fallback rule at
    # whisper transcribe + our engine.decode_with_fallback)
    "temperature_fallback": dict(
        language="en", temperature=[0.0, 0.2], logprob_threshold=-0.5,
        no_speech_threshold=0.99,
    ),
    # no-speech skip machinery (ref: empty/silence handling): threshold ~0
    # makes every window skip -> empty output via the skip path, not VAD
    "no_speech_skip_all": dict(
        language="en", no_speech_threshold=1e-9, logprob_threshold=None,
    ),
    # prompt threading (ref: corner_cases condition-off music; initial_prompt)
    "condition_off": dict(language="en", condition_on_previous_text=False,
                          _audio=(8, 35)),
    "long_conditioned": dict(language="en", _audio=(8, 35)),
    "initial_prompt": dict(language="en", initial_prompt="hello world"),
    # stuck LM (ref: corner_cases/stucked_lm_apollo11): EOT suppressed, the
    # decode hits its token budget with no final timestamp -> unfinished-
    # decoding alignment path (reference transcribe.py:490-517)
    "stuck_lm": dict(language="en", suppress_tokens="-1,320", sample_len=24),
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_golden(name, model, tok):
    opts = dict(CONFIGS[name])
    seed, seconds = opts.pop("_audio", (7, 7))
    tok_kw = opts.pop("_tok", None)
    kwargs = dict(
        tokenizer=make_tokenizer(**tok_kw) if tok_kw else tok,
        no_speech_threshold=None, logprob_threshold=None,
        compression_ratio_threshold=None,
    )
    kwargs.update(opts)
    result = transcribe_timestamped(model, _audio(seed, seconds), **kwargs)
    if "language_probs" in result:
        result = {**result, "language_probs": loose(result["language_probs"])}
    assert_non_regression(result, name)


def test_golden_verbose_stdout(model, tok, capsys):
    """Verbose word-line transcript pinned as a golden (the reference pins
    VAD configurations through their stdout transcripts,
    tests/expected/verbose/*.stdout, test_transcribe.py:490-524)."""
    transcribe_timestamped(
        model, _audio(7, 7), language="en", tokenizer=tok,
        vad=[(0.0, 3.0), (4.0, 6.0)], verbose=True,
        no_speech_threshold=None, logprob_threshold=None,
        compression_ratio_threshold=None,
    )
    out = capsys.readouterr().out
    os.makedirs(os.path.join(EXPECTED_DIR, "verbose"), exist_ok=True)
    path = os.path.join(EXPECTED_DIR, "verbose", "vad_explicit.stdout")
    if GENERATE or not os.path.exists(path):
        with open(path, "w", encoding="utf-8") as f:
            f.write(out)
        if not GENERATE:
            pytest.skip("generated stdout golden")
        return
    with open(path, encoding="utf-8") as f:
        assert out == f.read()


def test_golden_vad_silero(model, tok, tmp_path, monkeypatch, capsys):
    """VAD-silero end-to-end, pinned through BOTH the words.json and the
    verbose stdout transcript — the reference pins its silero configs this
    way (tests/expected/verbose/*.stdout lines driven by
    test_transcribe.py:490-524). Uses the deterministic fake-silero
    torchscript (the JAX port's oracle) since real weights can't download."""
    from test_vad import _make_fake_silero_jit

    import whisper_timestamped_tpu as wtt

    monkeypatch.setenv("SILERO_VAD_PATH", _make_fake_silero_jit(tmp_path))
    path = "/root/reference/tests/data/words.wav"
    if not os.path.exists(path):
        pytest.skip("fixture unavailable")
    result = transcribe_timestamped(
        model, wtt.load_audio(path), language="en", tokenizer=tok,
        vad="silero", verbose=True,
        no_speech_threshold=None, logprob_threshold=None,
        compression_ratio_threshold=None,
    )
    out = capsys.readouterr().out
    stdout_path = os.path.join(EXPECTED_DIR, "verbose", "vad_silero.stdout")
    if GENERATE or not os.path.exists(stdout_path):
        with open(stdout_path, "w", encoding="utf-8") as f:
            f.write(out)
    else:
        with open(stdout_path, encoding="utf-8") as f:
            assert out == f.read()
    assert "speech_activity" in result
    assert_non_regression(result, "words_vad_silero")


def test_golden_real_audio(model, tok):
    """Real fixture wav through the full pipeline (deterministic greedy)."""
    import whisper_timestamped_tpu as wtt

    path = "/root/reference/tests/data/bonjour.wav"
    if not os.path.exists(path):
        pytest.skip("fixture unavailable")
    audio = wtt.load_audio(path)
    result = transcribe_timestamped(
        model, audio, language="fr", tokenizer=tok,
        no_speech_threshold=None, logprob_threshold=None,
        compression_ratio_threshold=None,
    )
    assert_non_regression(result, "bonjour_fr")


def test_golden_real_audio_vad(model, tok):
    """The reference's VAD fixture (tests/data/words.wav) through the full
    pipeline with the built-in energy VAD (its vad_* configs are pinned on
    this file, test_transcribe.py:490-524)."""
    import whisper_timestamped_tpu as wtt

    path = "/root/reference/tests/data/words.wav"
    if not os.path.exists(path):
        pytest.skip("fixture unavailable")
    audio = wtt.load_audio(path)
    result = transcribe_timestamped(
        model, audio, language="en", tokenizer=tok, vad="auditok",
        no_speech_threshold=None, logprob_threshold=None,
        compression_ratio_threshold=None,
    )
    assert "speech_activity" in result
    assert_non_regression(result, "words_vad_auditok")
