"""Silero-VAD speech-timestamp extraction.

The reference loads silero via ``torch.hub`` + the package's
``get_speech_timestamps`` util (reference ``transcribe.py:1949-2023``). Here:

  * the frame-probability model is a **JAX port** of the silero VAD network
    (STFT filter-bank conv -> 4-layer conv encoder -> LSTM cell -> 1x1 conv
    head): the ``.jit`` checkpoint's state_dict is parsed ONCE at load time
    (torch on host), after which inference is a single jitted program —
    framing, STFT, and the encoder run batched over all chunks, the LSTM is
    a ``lax.scan`` over the chunk axis. The port is self-validating: at load
    it is checked against the torchscript forward on random chunks, and any
    mismatch (an unknown silero architecture revision) falls back to the
    torchscript adapter with a log message.
  * the hysteresis state machine below reimplements the published silero
    ``get_speech_timestamps`` semantics (threshold / neg_threshold=thr-0.15,
    min_speech/min_silence durations, speech padding) and is unit-tested
    against synthetic probability tracks.

Nothing is downloaded: silero weights must already exist locally
(``SILERO_VAD_PATH`` or the torch.hub cache) — vad.py enforces this.
"""

from __future__ import annotations

import logging
from typing import Callable, List, Optional

import numpy as np

logger = logging.getLogger("whisper_timestamped_tpu")

WINDOW_SIZE_SAMPLES = 512  # silero v4/v5 @ 16 kHz
CONTEXT_SAMPLES = 64  # leading context carried from the previous chunk (v5)


# ---------------------------------------------------------------------------
# JAX port of the silero VAD network (v5 architecture)
# ---------------------------------------------------------------------------

# state_dict schema of the published silero-vad v5 .jit checkpoint (16 kHz
# path). The shapes drive the jnp forward; anything else falls back to the
# torchscript adapter.
_V5_KEYS = {
    "stft": "_model.stft.forward_basis_buffer",  # (258, 1, 256) conv, stride 128
    "enc_w": "_model.encoder.{i}.reparam_conv.weight",  # 4 conv1d layers, k=3
    "enc_b": "_model.encoder.{i}.reparam_conv.bias",
    "rnn_wi": "_model.decoder.rnn.weight_ih",  # LSTMCell(128, 128)
    "rnn_wh": "_model.decoder.rnn.weight_hh",
    "rnn_bi": "_model.decoder.rnn.bias_ih",
    "rnn_bh": "_model.decoder.rnn.bias_hh",
    "head_w": "_model.decoder.decoder.2.weight",  # (1, 128, 1) conv head
    "head_b": "_model.decoder.decoder.2.bias",
}
_ENC_STRIDES = (1, 2, 2, 1)  # per encoder layer, padding 1 each


def parse_silero_state_dict(sd: dict) -> Optional[dict]:
    """Extract the v5-schema weights as numpy arrays, or None if the
    checkpoint does not match (e.g. the v3/v4 architecture).

    Accepts torch tensors (jit state_dict) or numpy arrays (onnx
    initializers remapped by :func:`match_onnx_silero_weights`)."""

    def get(key):
        t = sd.get(key)
        if t is None:
            return None
        if hasattr(t, "detach"):
            t = t.detach().cpu().numpy()
        return np.asarray(t, np.float32)

    stft = get(_V5_KEYS["stft"])
    if stft is None or stft.ndim != 3 or stft.shape[1] != 1 or stft.shape[0] % 2:
        return None
    enc = []
    for i in range(4):
        w = get(_V5_KEYS["enc_w"].format(i=i))
        b = get(_V5_KEYS["enc_b"].format(i=i))
        if w is None or b is None or w.ndim != 3 or w.shape[2] != 3:
            return None
        enc.append((w, b))
    rnn = tuple(get(_V5_KEYS[k]) for k in ("rnn_wi", "rnn_wh", "rnn_bi", "rnn_bh"))
    head_w, head_b = get(_V5_KEYS["head_w"]), get(_V5_KEYS["head_b"])
    if any(x is None for x in rnn) or head_w is None or head_b is None:
        return None
    if rnn[0].shape[0] != 4 * rnn[1].shape[1]:
        return None
    return {"stft": stft, "enc": enc, "rnn": rnn, "head": (head_w, head_b)}


def match_onnx_silero_weights(inits: dict) -> Optional[dict]:
    """Remap ONNX initializer names onto the v5 jit state_dict schema.

    The published silero exports keep the module paths in initializer names
    (possibly without the ``_model.`` prefix, possibly under an ``If``-branch
    subgraph); match each canonical key by suffix. When name matching fails
    (e.g. an exporter that renamed everything), fall back to chaining the
    conv shapes: STFT basis (2F, 1, K) → encoder convs (out, in, 3) linked
    in→out starting from F → (1, C, 1) head; the LSTM weights are only
    accepted by name (``weight_ih``/``weight_hh`` have identical shapes).
    """
    by_suffix = {}
    for name, arr in inits.items():
        by_suffix[name] = arr

    def find(canonical: str):
        suffix = canonical[len("_model."):]  # e.g. "stft.forward_basis_buffer"
        for name, arr in by_suffix.items():
            if name == canonical or name.endswith(suffix):
                return arr
        return None

    sd = {}
    missing = []
    for slot, key in _V5_KEYS.items():
        keys = [key.format(i=i) for i in range(4)] if "{i}" in key else [key]
        for k in keys:
            arr = find(k)
            if arr is None:
                missing.append(k)
            else:
                sd[k] = arr
    if not missing:
        return sd

    # shape-chaining fallback (module paths mangled by the exporter). Bias
    # shapes alone are ambiguous (the v5 stack has two 64- and two 128-wide
    # conv biases), so each conv weight pairs with the CLOSEST unused 1-D
    # tensor of matching length in graph order — torch exporters emit a
    # node's weight and bias initializers adjacently.
    order = {n: i for i, n in enumerate(inits)}
    stfts = [a for a in inits.values() if a.ndim == 3 and a.shape[1] == 1
             and a.shape[0] % 2 == 0 and a.shape[0] > 8 and a.shape[2] > 4]
    convs = {n: a for n, a in inits.items() if a.ndim == 3 and a.shape[2] == 3}
    heads = [a for a in inits.values()
             if a.ndim == 3 and a.shape[0] == 1 and a.shape[2] == 1]
    lstm = {("w" if "weight" in n else "b") + ("i" if "_ih" in n else "h"): a
            for n, a in inits.items()
            if ("weight_ih" in n or "weight_hh" in n or "bias_ih" in n or "bias_hh" in n)}
    if len(stfts) != 1 or len(heads) != 1 or len(lstm) < 4:
        return None
    used_biases: set = set()

    def nearest_bias(anchor_name: str, length: int):
        cands = [
            (abs(order[n] - order[anchor_name]), order[n], n)
            for n, a in inits.items()
            if a.ndim == 1 and a.shape[0] == length and n not in used_biases
        ]
        if not cands:
            return None
        name = min(cands)[2]
        used_biases.add(name)
        return inits[name]

    stft = stfts[0]
    sd = {_V5_KEYS["stft"]: stft}
    in_ch = stft.shape[0] // 2
    for i in range(4):
        w_name = next((n for n, a in convs.items() if a.shape[1] == in_ch), None)
        if w_name is None:
            return None
        w = convs.pop(w_name)
        b = nearest_bias(w_name, w.shape[0])
        if b is None:
            return None
        sd[_V5_KEYS["enc_w"].format(i=i)] = w
        sd[_V5_KEYS["enc_b"].format(i=i)] = b
        in_ch = w.shape[0]
    sd[_V5_KEYS["rnn_wi"]] = lstm.get("wi")
    sd[_V5_KEYS["rnn_wh"]] = lstm.get("wh")
    sd[_V5_KEYS["rnn_bi"]] = lstm.get("bi")
    sd[_V5_KEYS["rnn_bh"]] = lstm.get("bh")
    sd[_V5_KEYS["head_w"]] = heads[0]
    sd[_V5_KEYS["head_b"]] = nearest_bias(next(iter(inits)), 1)
    if any(v is None for v in sd.values()):
        return None
    return sd


def load_onnx_prob_model(path: str) -> Optional[Callable[[np.ndarray, int], np.ndarray]]:
    """Build the JAX prob model from a cached ``silero_vad.onnx``.

    The reference runs this file through onnxruntime
    (``transcribe.py:1956-2011``); neither onnx nor onnxruntime exists in
    this image, so the initializers are lifted straight out of the protobuf
    (``onnx_weights.py``) and run through the same JAX network as the ``.jit``
    path. Returns None when the file's weights don't match the v5 schema."""
    from .onnx_weights import parse_onnx_initializers

    try:
        inits = parse_onnx_initializers(path)
    except Exception as exc:
        logger.warning("could not parse %s as ONNX (%s)", path, exc)
        return None
    sd = match_onnx_silero_weights(inits)
    weights = parse_silero_state_dict(sd) if sd else None
    if weights is None:
        logger.warning(
            "%s does not match the silero v5 weight schema — "
            "use a .jit checkpoint or the energy VAD", path,
        )
        return None
    return make_jax_prob_fn(weights)


def make_jax_prob_fn(weights: dict) -> Callable[[np.ndarray, int], np.ndarray]:
    """Build ``probs_fn(chunks (N, 512), sr) -> (N,)`` running entirely in
    JAX. The LSTM recurrence is a ``lax.scan`` over chunks; everything before
    it is batched over all chunks at once."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    stft = jnp.asarray(weights["stft"])  # (2F, 1, K)
    enc = [(jnp.asarray(w), jnp.asarray(b)) for w, b in weights["enc"]]
    wi, wh, bi, bh = (jnp.asarray(x) for x in weights["rnn"])
    head_w, head_b = (jnp.asarray(x) for x in weights["head"])
    F2, _, K = stft.shape
    F = F2 // 2
    H = wh.shape[1]

    @jax.jit
    def forward(chunks: jnp.ndarray) -> jnp.ndarray:  # (N, 512) -> (N,)
        N = chunks.shape[0]
        # v5 framing: each chunk is prefixed with the last 64 samples of the
        # previous one (zeros before the first) -> 576-sample frames
        flat = jnp.concatenate([jnp.zeros((CONTEXT_SAMPLES,), chunks.dtype), chunks.reshape(-1)])
        idx = (
            jnp.arange(N)[:, None] * WINDOW_SIZE_SAMPLES
            + jnp.arange(WINDOW_SIZE_SAMPLES + CONTEXT_SAMPLES)[None, :]
        )
        frames = flat[idx]  # (N, 576)

        # STFT as a strided conv with the precomputed real/imag basis
        x = lax.conv_general_dilated(
            frames[:, None, :], stft, window_strides=(K // 2,), padding="VALID",
            dimension_numbers=("NCW", "OIW", "NCW"),
        )  # (N, 2F, T)
        mag = jnp.sqrt(x[:, :F] ** 2 + x[:, F:] ** 2 + 1e-12)

        h = mag
        for (w, b), s in zip(enc, _ENC_STRIDES):
            h = lax.conv_general_dilated(
                h, jnp.asarray(w), window_strides=(s,), padding=[(1, 1)],
                dimension_numbers=("NCW", "OIW", "NCW"),
            ) + b[None, :, None]
            h = jax.nn.relu(h)
        feat = h.mean(axis=-1)  # (N, C) — collapse the residual time axis

        def lstm_step(carry, x_t):
            hS, cS = carry
            gates = x_t @ wi.T + bi + hS @ wh.T + bh
            i_g, f_g, g_g, o_g = jnp.split(gates, 4)
            cS = jax.nn.sigmoid(f_g) * cS + jax.nn.sigmoid(i_g) * jnp.tanh(g_g)
            hS = jax.nn.sigmoid(o_g) * jnp.tanh(cS)
            return (hS, cS), hS

        (_, _), hs = lax.scan(
            lstm_step, (jnp.zeros((H,)), jnp.zeros((H,))), feat
        )  # (N, H)
        out = jax.nn.relu(hs) @ head_w[0, :, 0] + head_b[0]
        return jax.nn.sigmoid(out)

    def probs_fn(chunks: np.ndarray, sample_rate: int) -> np.ndarray:
        assert sample_rate == 16000, "the JAX silero port supports 16 kHz audio"
        return np.asarray(forward(jnp.asarray(chunks, jnp.float32)))

    probs_fn.is_jax = True  # inference is torch-free (tests assert this)
    return probs_fn


def load_jax_prob_model(path: str) -> Optional[Callable[[np.ndarray, int], np.ndarray]]:
    """Parse silero ``.jit`` weights into the jnp forward; None on mismatch.

    Self-validating: the JAX forward is compared against the torchscript
    model on random chunks before torch is released — a silero architecture
    this port does not model is detected here, not silently mis-scored.
    """
    import torch

    model = torch.jit.load(path, map_location="cpu")
    weights = parse_silero_state_dict(dict(model.state_dict()))
    if weights is None:
        return None
    jax_fn = make_jax_prob_fn(weights)
    ts_fn = load_torchscript_prob_model(path)
    rng = np.random.default_rng(0)
    chunks = (rng.standard_normal((6, WINDOW_SIZE_SAMPLES)) * 0.2).astype(np.float32)
    try:
        want = ts_fn(chunks, 16000)
        got = jax_fn(chunks, 16000)
    except Exception as exc:  # torchscript refused our call convention
        logger.warning("silero torchscript validation failed (%s)", exc)
        return None
    if not np.allclose(got, want, atol=1e-4):
        logger.warning(
            "JAX silero port disagrees with the torchscript model "
            "(max diff %.3g) — falling back to the torchscript adapter",
            float(np.max(np.abs(got - want))),
        )
        return None
    return jax_fn


def load_torchscript_prob_model(path: str) -> Callable[[np.ndarray, int], np.ndarray]:
    """Wrap a silero ``.jit`` model as a chunk->probability callable."""
    import torch

    model = torch.jit.load(path, map_location="cpu")
    model.eval()

    def probs_fn(chunks: np.ndarray, sample_rate: int) -> np.ndarray:
        out = []
        if hasattr(model, "reset_states"):
            model.reset_states()
        with torch.no_grad():
            for chunk in chunks:
                p = model(torch.from_numpy(chunk).float(), sample_rate)
                out.append(float(p.item() if hasattr(p, "item") else p))
        return np.asarray(out)

    return probs_fn


def speech_probs_to_timestamps(
    speech_probs: np.ndarray,
    audio_length_samples: int,
    *,
    threshold: float = 0.5,
    neg_threshold: Optional[float] = None,
    min_speech_duration_ms: float = 250,
    min_silence_duration_ms: float = 100,
    speech_pad_ms: float = 30,
    sample_rate: int = 16000,
    window_size_samples: int = WINDOW_SIZE_SAMPLES,
) -> List[dict]:
    """Hysteresis state machine over per-window speech probabilities
    (silero ``get_speech_timestamps`` semantics).

    Intentionally a host loop: one iteration per 32 ms window means an hour
    of audio is ~112k trivial iterations (~100 ms) — far below the network
    forward it post-processes, and the two-threshold + min-silence hysteresis
    is inherently sequential. The heavy part (the conv+LSTM net) is the
    jitted JAX program above.
    """
    if neg_threshold is None:
        neg_threshold = max(threshold - 0.15, 0.01)
    min_speech_samples = sample_rate * min_speech_duration_ms / 1000
    min_silence_samples = sample_rate * min_silence_duration_ms / 1000
    speech_pad_samples = sample_rate * speech_pad_ms / 1000

    triggered = False
    speeches: List[dict] = []
    current: dict = {}
    temp_end = 0

    for i, prob in enumerate(speech_probs):
        pos = window_size_samples * i
        if prob >= threshold and temp_end:
            temp_end = 0
        if prob >= threshold and not triggered:
            triggered = True
            current["start"] = pos
            continue
        if prob < neg_threshold and triggered:
            if not temp_end:
                temp_end = pos
            if pos - temp_end < min_silence_samples:
                continue
            current["end"] = temp_end
            if current["end"] - current["start"] > min_speech_samples:
                speeches.append(current)
            current = {}
            triggered = False
            temp_end = 0

    if current and audio_length_samples - current["start"] > min_speech_samples:
        current["end"] = audio_length_samples
        speeches.append(current)

    # pad segments, splitting inter-segment silences
    for i, speech in enumerate(speeches):
        if i == 0:
            speech["start"] = int(max(0, speech["start"] - speech_pad_samples))
        if i != len(speeches) - 1:
            silence = speeches[i + 1]["start"] - speech["end"]
            if silence < 2 * speech_pad_samples:
                speech["end"] += int(silence // 2)
                speeches[i + 1]["start"] = int(max(0, speeches[i + 1]["start"] - silence // 2))
            else:
                speech["end"] = int(min(audio_length_samples, speech["end"] + speech_pad_samples))
                speeches[i + 1]["start"] = int(max(0, speeches[i + 1]["start"] - speech_pad_samples))
        else:
            speech["end"] = int(min(audio_length_samples, speech["end"] + speech_pad_samples))

    return speeches


_PROB_MODEL_CACHE: dict = {}


def _cached_prob_model(path: str) -> Callable[[np.ndarray, int], np.ndarray]:
    """JAX port when the checkpoint matches, torchscript otherwise; cached so
    weight parsing/validation happens once per path. ONNX files have no
    torchscript fallback: a schema mismatch is a hard error (the user should
    fetch a .jit checkpoint or use the energy VAD)."""
    fn = _PROB_MODEL_CACHE.get(path)
    if fn is None:
        if path.endswith(".onnx"):
            fn = load_onnx_prob_model(path)
            if fn is None:
                raise RuntimeError(
                    f"{path} does not match the silero v5 weight schema and "
                    "onnxruntime is not available; provide a .jit silero "
                    "model or use the energy VAD."
                )
        else:
            fn = load_jax_prob_model(path)
            if fn is None:
                # the reference pins older revisions via torch.hub
                # ("silero:3.1", transcribe.py:1949-2023). The JAX port models
                # the v5 network only; v3/v4 architectures run through the
                # torchscript adapter — torch stays on the inference path for
                # them. Say so loudly instead of silently changing engines
                # (MIGRATION.md "Silero VAD revisions").
                logger.warning(
                    "%s does not match the silero v5 weight schema (likely a "
                    "v3/v4 revision): running it through the torchscript "
                    "adapter — torch is required at inference for this "
                    "revision; only v5 checkpoints run on the torch-free JAX "
                    "path (see MIGRATION.md)", path,
                )
                try:
                    fn = load_torchscript_prob_model(path)
                except Exception as exc:
                    raise RuntimeError(
                        f"{path} does not match the silero v5 weight schema "
                        "and the torchscript fallback failed "
                        f"({exc}); provide a v5 checkpoint or use the energy "
                        "VAD (see MIGRATION.md, 'Silero VAD revisions')."
                    ) from exc
        _PROB_MODEL_CACHE[path] = fn
    return fn


def silero_get_speech_timestamps(
    audio: np.ndarray,
    model_path: str,
    *,
    sample_rate: int = 16000,
    min_speech_duration: float = 0.1,
    min_silence_duration: float = 0.1,
    threshold: float = 0.5,
    probs_fn: Optional[Callable] = None,
    window_size_samples: Optional[int] = None,
) -> List[dict]:
    """Speech segments (sample units) for 16 kHz audio via silero weights.

    Matches the reference's invocation (``transcribe.py:2016-2023``:
    normalized audio, durations in ms). ``window_size_samples`` overrides the
    chunking window — v3 revisions use the silero v3 util's 1536 default
    (vad.py passes it for ``silero:3.x`` pinnings); the v5 JAX net requires
    512."""
    from ..vad import normalize_gain

    audio = normalize_gain(np.asarray(audio, np.float32))

    if probs_fn is None:
        # prefer the JAX port (torch is only touched once, to parse weights);
        # unknown .jit architectures fall back to the torchscript adapter
        probs_fn = _cached_prob_model(model_path)
    window = window_size_samples or WINDOW_SIZE_SAMPLES
    if window != WINDOW_SIZE_SAMPLES and getattr(probs_fn, "is_jax", False):
        logger.warning(
            "silero v5 JAX port requires %d-sample windows; ignoring "
            "window_size_samples=%d", WINDOW_SIZE_SAMPLES, window,
        )
        window = WINDOW_SIZE_SAMPLES

    n = len(audio)
    n_chunks = int(np.ceil(n / window))
    padded = np.zeros(n_chunks * window, np.float32)
    padded[:n] = audio
    chunks = padded.reshape(n_chunks, window)
    probs = np.asarray(probs_fn(chunks, sample_rate))

    return speech_probs_to_timestamps(
        probs,
        n,
        threshold=threshold,
        min_speech_duration_ms=round(min_speech_duration * 1000),
        min_silence_duration_ms=round(min_silence_duration * 1000),
        sample_rate=sample_rate,
        window_size_samples=window,
    )
