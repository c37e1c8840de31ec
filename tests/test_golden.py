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


CONFIGS = {
    "efficient_greedy": dict(language="en"),
    "autodetect_language": dict(),
    "disfluencies": dict(language="en", detect_disfluencies=True),
    "vad_explicit": dict(language="en", vad=[(0.0, 3.0), (4.0, 6.0)]),
    "naive": dict(language="en", naive_approach=True),
    "beam3": dict(language="en", beam_size=3),
    "no_refine": dict(language="en", refine_whisper_precision=0.0),
    "punctuation_stripped": dict(language="en", remove_punctuation_from_words=True),
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_golden(name, model, tok):
    opts = CONFIGS[name]
    result = transcribe_timestamped(
        model, _audio(7, 7), tokenizer=tok,
        no_speech_threshold=None, logprob_threshold=None,
        compression_ratio_threshold=None,
        **opts,
    )
    if "language_probs" in result:
        result = {**result, "language_probs": loose(result["language_probs"])}
    assert_non_regression(result, name)


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
