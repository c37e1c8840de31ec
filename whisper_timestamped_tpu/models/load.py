"""Checkpoint loading: OpenAI ``.pt`` files and HuggingFace Whisper directories.

Functional port of the reference's model-loading layer
(``transcribe.py:2405-2564``: ``load_model``, ``torch_load``,
``hf_to_whisper_states``, ``states_to_dim``, untied-projection handling) —
except the target is our layer-stacked JAX parameter tree, not a torch module.
Nothing is downloaded: names resolve against the standard cache directories and
fail with a clear message otherwise.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import numpy as np

from .whisper_jax import WhisperDims, Params
from .alignment_heads import get_alignment_heads, infer_model_name

OFFICIAL_MODELS = (
    "tiny.en", "tiny", "base.en", "base", "small.en", "small",
    "medium.en", "medium", "large-v1", "large-v2", "large-v3", "large",
    "large-v3-turbo", "turbo",
)


def available_models() -> Tuple[str, ...]:
    return OFFICIAL_MODELS


# Drop-in analog of ``whisper._MODELS`` (the reference re-exports it,
# ``__init__.py:1``). This framework ships no download URLs (zero-egress
# design): entries map to the checkpoint filename expected under
# ``download_root`` / ``~/.cache/whisper``, and ``_download`` resolves
# against that cache instead of the network.
_MODELS = {name: f"{name}.pt" for name in OFFICIAL_MODELS}


def _download(url: str, root: str, in_memory: bool = False):
    """Cache-resolving analog of ``whisper._download`` (re-exported by the
    reference, ``__init__.py:1``). Returns the cached checkpoint path (or its
    bytes when ``in_memory``); never touches the network."""
    path = os.path.join(root, os.path.basename(url))
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{os.path.basename(url)} not found under {root!r}. This framework "
            "does not download weights; place the checkpoint there or pass a "
            "local path to load_model()."
        )
    if in_memory:
        with open(path, "rb") as f:
            return f.read()
    return path


@dataclass
class WhisperModel:
    """A loaded model: parameter pytree + geometry + alignment metadata."""

    params: Params
    dims: WhisperDims
    alignment_heads: Optional[list] = None
    model_name: Optional[str] = None
    tokenizer_ranks: Optional[dict] = None  # byte->rank, when the checkpoint dir has one
    tokenizer_multilingual: Optional[bool] = None  # hint from the vocab filename

    @property
    def is_multilingual(self) -> bool:
        return self.dims.is_multilingual

    @property
    def num_languages(self) -> int:
        return self.dims.num_languages


# ---------------------------------------------------------------------------
# State-dict → parameter-tree conversion
# ---------------------------------------------------------------------------


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):  # torch tensor
        t = t.detach().cpu()
        if t.dtype.__str__() == "torch.bfloat16":
            t = t.float()
        return t.numpy()
    return np.asarray(t)


def _lin(sd, prefix, bias=True, transpose=True):
    w = _to_np(sd[f"{prefix}.weight"])
    out = {"w": np.ascontiguousarray(w.T) if transpose else w}
    if bias and f"{prefix}.bias" in sd:
        out["b"] = _to_np(sd[f"{prefix}.bias"])
    return out


def _ln_params(sd, prefix):
    return {"g": _to_np(sd[f"{prefix}.weight"]), "b": _to_np(sd[f"{prefix}.bias"])}


def _stack(blocks):
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *blocks)


def _count_layers(sd, pattern):
    rx = re.compile(pattern)
    layers = {int(m.group(1)) for k in sd if (m := rx.match(k))}
    return max(layers) + 1 if layers else 0


def from_openai_state_dict(
    sd: Dict[str, Any], dims: Optional[WhisperDims] = None
) -> Tuple[Params, WhisperDims]:
    """Convert an openai-whisper state dict (keys like ``encoder.blocks.0.attn.query.weight``)."""
    sd = {k.replace("model.", "", 1) if k.startswith("model.") else k: v for k, v in sd.items()}
    if dims is None:
        dims = states_to_dims_openai(sd)

    def attn(prefix):
        return {
            "q": _lin(sd, f"{prefix}.query"),
            "k": _lin(sd, f"{prefix}.key", bias=False),
            "v": _lin(sd, f"{prefix}.value"),
            "o": _lin(sd, f"{prefix}.out"),
        }

    enc_blocks = []
    for i in range(dims.n_audio_layer):
        p = f"encoder.blocks.{i}"
        enc_blocks.append(
            {
                "attn_ln": _ln_params(sd, f"{p}.attn_ln"),
                "attn": attn(f"{p}.attn"),
                "mlp_ln": _ln_params(sd, f"{p}.mlp_ln"),
                "mlp": {"fc1": _lin(sd, f"{p}.mlp.0"), "fc2": _lin(sd, f"{p}.mlp.2")},
            }
        )
    dec_blocks = []
    for i in range(dims.n_text_layer):
        p = f"decoder.blocks.{i}"
        dec_blocks.append(
            {
                "attn_ln": _ln_params(sd, f"{p}.attn_ln"),
                "attn": attn(f"{p}.attn"),
                "cross_ln": _ln_params(sd, f"{p}.cross_attn_ln"),
                "cross": attn(f"{p}.cross_attn"),
                "mlp_ln": _ln_params(sd, f"{p}.mlp_ln"),
                "mlp": {"fc1": _lin(sd, f"{p}.mlp.0"), "fc2": _lin(sd, f"{p}.mlp.2")},
            }
        )
    params = {
        "encoder": {
            "conv1": {
                "w": _to_np(sd["encoder.conv1.weight"]).transpose(2, 1, 0),
                "b": _to_np(sd["encoder.conv1.bias"]),
            },
            "conv2": {
                "w": _to_np(sd["encoder.conv2.weight"]).transpose(2, 1, 0),
                "b": _to_np(sd["encoder.conv2.bias"]),
            },
            "blocks": _stack(enc_blocks),
            "ln_post": _ln_params(sd, "encoder.ln_post"),
            **(
                {"pos_emb": _to_np(sd["encoder.positional_embedding"])}
                if "encoder.positional_embedding" in sd
                else {}
            ),
        },
        "decoder": {
            "tok_emb": _to_np(sd["decoder.token_embedding.weight"]),
            "pos_emb": _to_np(sd["decoder.positional_embedding"]),
            "blocks": _stack(dec_blocks),
            "ln": _ln_params(sd, "decoder.ln"),
        },
    }
    # untied output projection (reference WhisperUntied, transcribe.py:2925-2962)
    if "decoder.proj_out.weight" in sd:
        params["decoder"]["proj"] = {"w": _to_np(sd["decoder.proj_out.weight"]).T}
    return params, dims


def states_to_dims_openai(sd: Dict[str, Any]) -> WhisperDims:
    """Infer geometry from an openai-format state dict (port of reference
    ``states_to_dim``, ``transcribe.py:2909-2923``). Head counts use the fixed
    64-dim heads of all released Whisper models."""
    n_mels = _to_np(sd["encoder.conv1.weight"]).shape[1]
    n_audio_state = _to_np(sd["encoder.conv1.weight"]).shape[0]
    n_vocab, n_text_state = _to_np(sd["decoder.token_embedding.weight"]).shape
    return WhisperDims(
        n_mels=n_mels,
        n_audio_ctx=_to_np(sd["encoder.positional_embedding"]).shape[0]
        if "encoder.positional_embedding" in sd
        else 1500,
        n_audio_state=n_audio_state,
        n_audio_head=max(1, n_audio_state // 64),
        n_audio_layer=_count_layers(sd, r"encoder\.blocks\.(\d+)\."),
        n_vocab=n_vocab,
        n_text_ctx=_to_np(sd["decoder.positional_embedding"]).shape[0],
        n_text_state=n_text_state,
        n_text_head=max(1, n_text_state // 64),
        n_text_layer=_count_layers(sd, r"decoder\.blocks\.(\d+)\."),
    )


def from_hf_state_dict(
    sd: Dict[str, Any], config: Optional[dict] = None
) -> Tuple[Params, WhisperDims]:
    """Convert an HF ``WhisperForConditionalGeneration`` state dict.

    Equivalent to the reference's key-renaming table ``hf_to_whisper_states``
    (``transcribe.py:2876-2907``), but mapping directly into our tree.
    """
    sd = {k[len("model."):] if k.startswith("model.") else k: v for k, v in sd.items()}
    if config is not None:
        dims = dims_from_hf_config(config)
    else:
        dims = states_to_dims_hf(sd)

    def attn(prefix):
        return {
            "q": _lin(sd, f"{prefix}.q_proj"),
            "k": _lin(sd, f"{prefix}.k_proj", bias=False),
            "v": _lin(sd, f"{prefix}.v_proj"),
            "o": _lin(sd, f"{prefix}.out_proj"),
        }

    enc_blocks = []
    for i in range(dims.n_audio_layer):
        p = f"encoder.layers.{i}"
        enc_blocks.append(
            {
                "attn_ln": _ln_params(sd, f"{p}.self_attn_layer_norm"),
                "attn": attn(f"{p}.self_attn"),
                "mlp_ln": _ln_params(sd, f"{p}.final_layer_norm"),
                "mlp": {"fc1": _lin(sd, f"{p}.fc1"), "fc2": _lin(sd, f"{p}.fc2")},
            }
        )
    dec_blocks = []
    for i in range(dims.n_text_layer):
        p = f"decoder.layers.{i}"
        dec_blocks.append(
            {
                "attn_ln": _ln_params(sd, f"{p}.self_attn_layer_norm"),
                "attn": attn(f"{p}.self_attn"),
                "cross_ln": _ln_params(sd, f"{p}.encoder_attn_layer_norm"),
                "cross": attn(f"{p}.encoder_attn"),
                "mlp_ln": _ln_params(sd, f"{p}.final_layer_norm"),
                "mlp": {"fc1": _lin(sd, f"{p}.fc1"), "fc2": _lin(sd, f"{p}.fc2")},
            }
        )
    params = {
        "encoder": {
            "conv1": {
                "w": _to_np(sd["encoder.conv1.weight"]).transpose(2, 1, 0),
                "b": _to_np(sd["encoder.conv1.bias"]),
            },
            "conv2": {
                "w": _to_np(sd["encoder.conv2.weight"]).transpose(2, 1, 0),
                "b": _to_np(sd["encoder.conv2.bias"]),
            },
            "blocks": _stack(enc_blocks),
            "ln_post": _ln_params(sd, "encoder.layer_norm"),
            **(
                {"pos_emb": _to_np(sd["encoder.embed_positions.weight"])}
                if "encoder.embed_positions.weight" in sd
                else {}
            ),
        },
        "decoder": {
            "tok_emb": _to_np(sd["decoder.embed_tokens.weight"]),
            "pos_emb": _to_np(sd["decoder.embed_positions.weight"]),
            "blocks": _stack(dec_blocks),
            "ln": _ln_params(sd, "decoder.layer_norm"),
        },
    }
    if "proj_out.weight" in sd:
        proj = _to_np(sd["proj_out.weight"])
        if not np.array_equal(proj, params["decoder"]["tok_emb"]):
            params["decoder"]["proj"] = {"w": proj.T}
    return params, dims


def states_to_dims_hf(sd: Dict[str, Any]) -> WhisperDims:
    n_mels = _to_np(sd["encoder.conv1.weight"]).shape[1]
    n_audio_state = _to_np(sd["encoder.conv1.weight"]).shape[0]
    n_vocab, n_text_state = _to_np(sd["decoder.embed_tokens.weight"]).shape
    return WhisperDims(
        n_mels=n_mels,
        n_audio_ctx=_to_np(sd["encoder.embed_positions.weight"]).shape[0]
        if "encoder.embed_positions.weight" in sd
        else 1500,
        n_audio_state=n_audio_state,
        n_audio_head=max(1, n_audio_state // 64),
        n_audio_layer=_count_layers(sd, r"encoder\.layers\.(\d+)\."),
        n_vocab=n_vocab,
        n_text_ctx=_to_np(sd["decoder.embed_positions.weight"]).shape[0],
        n_text_state=n_text_state,
        n_text_head=max(1, n_text_state // 64),
        n_text_layer=_count_layers(sd, r"decoder\.layers\.(\d+)\."),
    )


def dims_from_hf_config(config: dict) -> WhisperDims:
    d = config["d_model"]
    return WhisperDims(
        n_mels=config.get("num_mel_bins", 80),
        n_audio_ctx=config.get("max_source_positions", 1500),
        n_audio_state=d,
        n_audio_head=config.get("encoder_attention_heads", max(1, d // 64)),
        n_audio_layer=config["encoder_layers"],
        n_vocab=config["vocab_size"],
        n_text_ctx=config.get("max_target_positions", 448),
        n_text_state=d,
        n_text_head=config.get("decoder_attention_heads", max(1, d // 64)),
        n_text_layer=config["decoder_layers"],
    )


# ---------------------------------------------------------------------------
# File / directory resolution
# ---------------------------------------------------------------------------


def _torch_load(path: str) -> Dict[str, Any]:
    """Load a .pt/.bin file (torch pickle), CPU, weights only where possible.

    Port of the reference's ``torch_load`` (``transcribe.py:2546-2564``)."""
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        return torch.load(path, map_location="cpu", weights_only=False)


def _load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    try:
        return load_file(path)
    except Exception:
        # fall back through torch for bf16 payloads numpy can't represent
        from safetensors.torch import load_file as load_torch

        return {k: _to_np(v) for k, v in load_torch(path).items()}


def _load_sharded_hf(dirname: str, index_file: str) -> Dict[str, Any]:
    with open(os.path.join(dirname, index_file)) as f:
        index = json.load(f)
    sd: Dict[str, Any] = {}
    for shard in sorted(set(index["weight_map"].values())):
        p = os.path.join(dirname, shard)
        if shard.endswith(".safetensors"):
            sd.update(_load_safetensors(p))
        else:
            sd.update(_torch_load(p))
    return sd


def _load_hf_dir(dirname: str) -> Tuple[Params, WhisperDims, Optional[dict]]:
    config = None
    cfg_path = os.path.join(dirname, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            config = json.load(f)
    candidates = [
        ("model.safetensors", _load_safetensors),
        ("pytorch_model.bin", _torch_load),
        ("whisper.ckpt", _torch_load),
        ("model.safetensors.index.json", None),
        ("pytorch_model.bin.index.json", None),
    ]
    sd = None
    for fname, loader in candidates:
        p = os.path.join(dirname, fname)
        if os.path.exists(p):
            sd = _load_sharded_hf(dirname, fname) if loader is None else loader(p)
            break
    if sd is None:
        raise FileNotFoundError(
            f"No model weights found in {dirname} (expected model.safetensors, "
            "pytorch_model.bin, or a sharded index)."
        )
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    params, dims = from_hf_state_dict(sd, config)
    return params, dims, config


def _tokenizer_ranks_from_dir(dirname: str) -> Tuple[Optional[dict], Optional[bool]]:
    """(byte->rank table, multilingual hint) from files next to a checkpoint."""
    from ..tokenizer import load_hf_vocab_ranks, load_tiktoken_ranks

    for cand, loader, multi in (
        ("multilingual.tiktoken", load_tiktoken_ranks, True),
        ("gpt2.tiktoken", load_tiktoken_ranks, False),
        ("vocab.json", load_hf_vocab_ranks, None),
    ):
        p = os.path.join(dirname, cand)
        if os.path.exists(p):
            return loader(p), multi
    return None, None


def _num_parameters_for_name_inference(params: Params) -> int:
    """Parameter count excluding untied proj (reference ``transcribe.py:2396-2402``
    also excludes HF encoder positions, which our tree never stores)."""
    import jax

    total = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    proj = params["decoder"].get("proj")
    if proj is not None:
        total -= int(np.prod(proj["w"].shape))
    enc_pos = params["encoder"].get("pos_emb")
    if enc_pos is not None:
        # encoder positions are a buffer in openai models / excluded by the
        # reference's count (transcribe.py:2399)
        total -= int(np.prod(np.asarray(enc_pos).shape))
    return total


def load_model(
    name_or_path: str,
    device=None,
    download_root: Optional[str] = None,
    backend: str = "jax",
    dtype=None,
) -> WhisperModel:
    """Load a Whisper model into the JAX parameter tree.

    Accepts: a local OpenAI ``.pt`` file, a local HF model directory, a local
    safetensors file, or an official model name resolved against
    ``download_root`` / ``~/.cache/whisper``. Port of reference ``load_model``
    (``transcribe.py:2405-2544``) minus network access.
    """
    if backend not in ("jax", "tpu"):
        raise ValueError(f"Unsupported backend {backend!r}: this framework is JAX/TPU-native")
    model_name = None
    if os.path.isdir(name_or_path):
        params, dims, config = _load_hf_dir(name_or_path)
        if config and config.get("_name_or_path"):
            model_name = config["_name_or_path"]
        ranks, multi_hint = _tokenizer_ranks_from_dir(name_or_path)
    elif os.path.isfile(name_or_path):
        ranks, multi_hint = _tokenizer_ranks_from_dir(os.path.dirname(os.path.abspath(name_or_path)))
        if name_or_path.endswith(".safetensors"):
            sd = _load_safetensors(name_or_path)
            try:
                params, dims = from_hf_state_dict(sd)
            except KeyError:
                params, dims = from_openai_state_dict(sd)
        else:
            ckpt = _torch_load(name_or_path)
            dims = WhisperDims(**ckpt["dims"]) if isinstance(ckpt, dict) and "dims" in ckpt else None
            sd = ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
            if any(k.startswith(("encoder.layers", "model.encoder.layers")) for k in sd):
                params, dims = from_hf_state_dict(sd)
            else:
                params, dims = from_openai_state_dict(sd, dims)
        model_name = os.path.basename(name_or_path)
    elif name_or_path in OFFICIAL_MODELS:
        root = download_root or os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")), "whisper"
        )
        pt = os.path.join(root, f"{name_or_path}.pt")
        if not os.path.exists(pt):
            raise FileNotFoundError(
                f"Checkpoint for {name_or_path!r} not found at {pt}. This framework "
                "does not download weights; place the official .pt there or pass a path."
            )
        return load_model(pt, device=device, dtype=dtype)
    else:
        raise FileNotFoundError(f"Cannot resolve model {name_or_path!r} (not a file, "
                                f"directory, or official name {OFFICIAL_MODELS})")

    # alignment heads (inferred from the numpy tree before device placement)
    inferred = None
    if model_name:
        from .alignment_heads import heads_for_model_name

        inferred = heads_for_model_name(model_name)
    if inferred is None:
        count = _num_parameters_for_name_inference(params)
        first_pos = bool(np.asarray(params["encoder"]["conv1"]["w"]).flat[0] > 0)
        name = infer_model_name(count, first_pos)
        if name:
            inferred = get_alignment_heads(name, dims.n_text_layer, dims.n_text_head)
            model_name = model_name or name

    # Materialize as JAX device arrays (jit closes over params; numpy leaves
    # would break traced indexing and re-upload on every call).
    import jax
    import jax.numpy as jnp

    def _materialize(x):
        x = np.asarray(x)
        if dtype is not None and np.issubdtype(x.dtype, np.floating):
            return jnp.asarray(x, dtype=dtype)
        return jnp.asarray(x)

    params = jax.tree.map(_materialize, params)
    return WhisperModel(
        params=params,
        dims=dims,
        alignment_heads=inferred,
        model_name=model_name,
        tokenizer_ranks=ranks,
        tokenizer_multilingual=multi_hint,
    )
