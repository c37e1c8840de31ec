"""Shared test helpers: synthetic random-weight Whisper checkpoints + tokenizer.

No network access exists in CI, so every test model is built locally:
an HF ``WhisperForConditionalGeneration`` with a tiny config (the torch
parity oracle), an OpenAI-format ``.pt`` with the same weights, and a
synthetic byte-level vocabulary wired to the whisper special-token layout.
"""

import functools
import os

import numpy as np

from whisper_timestamped_tpu.tokenizer import get_tokenizer, synthetic_ranks

# Geometry shared by all synthetic models. vocab_size chosen so that the
# special-token layout leaves headroom: n_base=320 (256 bytes + 64 merges),
# specials end at 320+2+99+6=427, timestamps 427..1927 -> n_vocab=1928.
N_BASE = 320
N_LANGS = 99
N_VOCAB = N_BASE + 2 + N_LANGS + 6 + 1501  # 1928
D_MODEL = 64
N_HEADS = 4
N_LAYERS = 2
FFN = 128


def make_tokenizer(language=None, task=None, multilingual=True):
    return get_tokenizer(
        ranks=synthetic_ranks(),
        multilingual=multilingual,
        num_languages=N_LANGS,
        language=language,
        task=task,
    )


@functools.lru_cache(maxsize=4)
def make_hf_model(seed: int = 0, max_source_positions: int = 1500):
    """Tiny random HF Whisper (torch, eager attention) — the parity oracle."""
    import torch
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    tok = make_tokenizer()
    cfg = WhisperConfig(
        vocab_size=N_VOCAB,
        num_mel_bins=80,
        d_model=D_MODEL,
        encoder_layers=N_LAYERS,
        decoder_layers=N_LAYERS,
        encoder_attention_heads=N_HEADS,
        decoder_attention_heads=N_HEADS,
        encoder_ffn_dim=FFN,
        decoder_ffn_dim=FFN,
        max_source_positions=max_source_positions,
        max_target_positions=448,
        pad_token_id=tok.eot,
        bos_token_id=tok.eot,
        eos_token_id=tok.eot,
        decoder_start_token_id=tok.sot,
        attn_implementation="eager",
        tie_word_embeddings=True,
    )
    torch.manual_seed(seed)
    model = WhisperForConditionalGeneration(cfg).eval()
    return model


def hf_model_to_jax(model):
    from whisper_timestamped_tpu.models import from_hf_state_dict

    sd = {k: v for k, v in model.state_dict().items()}
    return from_hf_state_dict(sd, model.config.to_dict())


def save_openai_pt(model, path):
    """Write the HF model's weights as an OpenAI-format .pt checkpoint."""
    import torch

    cfg = model.config
    sd = model.state_dict()
    out = {}

    def put(dst, src, transpose=False):
        t = sd[src]
        out[dst] = t.t().contiguous() if transpose else t

    put("encoder.conv1.weight", "model.encoder.conv1.weight")
    put("encoder.conv1.bias", "model.encoder.conv1.bias")
    put("encoder.conv2.weight", "model.encoder.conv2.weight")
    put("encoder.conv2.bias", "model.encoder.conv2.bias")
    out["encoder.positional_embedding"] = sd["model.encoder.embed_positions.weight"]
    for i in range(cfg.encoder_layers):
        s, d = f"model.encoder.layers.{i}", f"encoder.blocks.{i}"
        _map_block(out, sd, s, d, cross=False)
    put("encoder.ln_post.weight", "model.encoder.layer_norm.weight")
    put("encoder.ln_post.bias", "model.encoder.layer_norm.bias")
    out["decoder.token_embedding.weight"] = sd["model.decoder.embed_tokens.weight"]
    out["decoder.positional_embedding"] = sd["model.decoder.embed_positions.weight"]
    for i in range(cfg.decoder_layers):
        s, d = f"model.decoder.layers.{i}", f"decoder.blocks.{i}"
        _map_block(out, sd, s, d, cross=True)
    put("decoder.ln.weight", "model.decoder.layer_norm.weight")
    put("decoder.ln.bias", "model.decoder.layer_norm.bias")

    dims = dict(
        n_mels=cfg.num_mel_bins,
        n_audio_ctx=cfg.max_source_positions,
        n_audio_state=cfg.d_model,
        n_audio_head=cfg.encoder_attention_heads,
        n_audio_layer=cfg.encoder_layers,
        n_vocab=cfg.vocab_size,
        n_text_ctx=cfg.max_target_positions,
        n_text_state=cfg.d_model,
        n_text_head=cfg.decoder_attention_heads,
        n_text_layer=cfg.decoder_layers,
    )
    torch.save({"dims": dims, "model_state_dict": out}, path)
    return path


def _map_block(out, sd, s, d, cross):
    pairs = [
        (f"{d}.attn.query", f"{s}.self_attn.q_proj", True),
        (f"{d}.attn.key", f"{s}.self_attn.k_proj", False),
        (f"{d}.attn.value", f"{s}.self_attn.v_proj", True),
        (f"{d}.attn.out", f"{s}.self_attn.out_proj", True),
    ]
    if cross:
        pairs += [
            (f"{d}.cross_attn.query", f"{s}.encoder_attn.q_proj", True),
            (f"{d}.cross_attn.key", f"{s}.encoder_attn.k_proj", False),
            (f"{d}.cross_attn.value", f"{s}.encoder_attn.v_proj", True),
            (f"{d}.cross_attn.out", f"{s}.encoder_attn.out_proj", True),
        ]
    for dst, src, has_bias in pairs:
        out[f"{dst}.weight"] = sd[f"{src}.weight"]
        if has_bias:
            out[f"{dst}.bias"] = sd[f"{src}.bias"]
    out[f"{d}.attn_ln.weight"] = sd[f"{s}.self_attn_layer_norm.weight"]
    out[f"{d}.attn_ln.bias"] = sd[f"{s}.self_attn_layer_norm.bias"]
    if cross:
        out[f"{d}.cross_attn_ln.weight"] = sd[f"{s}.encoder_attn_layer_norm.weight"]
        out[f"{d}.cross_attn_ln.bias"] = sd[f"{s}.encoder_attn_layer_norm.bias"]
    out[f"{d}.mlp.0.weight"] = sd[f"{s}.fc1.weight"]
    out[f"{d}.mlp.0.bias"] = sd[f"{s}.fc1.bias"]
    out[f"{d}.mlp.2.weight"] = sd[f"{s}.fc2.weight"]
    out[f"{d}.mlp.2.bias"] = sd[f"{s}.fc2.bias"]
    out[f"{d}.mlp_ln.weight"] = sd[f"{s}.final_layer_norm.weight"]
    out[f"{d}.mlp_ln.bias"] = sd[f"{s}.final_layer_norm.bias"]
