"""Model core tests: parity vs torch/transformers oracle, cache consistency, loaders."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_timestamped_tpu.models import (
    TINY_TEST_DIMS,
    WhisperDims,
    decode_full,
    decode_step,
    encode,
    from_hf_state_dict,
    init_cache,
    init_params,
    load_model,
    sinusoids,
)

from model_utils import make_hf_model, hf_model_to_jax, save_openai_pt, N_VOCAB

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def oracle():
    model = make_hf_model(seed=0)
    params, dims = hf_model_to_jax(model)
    return model, params, dims


def test_dims_inferred_from_hf_config(oracle):
    _, _, dims = oracle
    assert dims.n_vocab == N_VOCAB
    assert dims.n_audio_state == 64 and dims.n_audio_head == 4
    assert dims.n_audio_ctx == 1500 and dims.n_text_ctx == 448


def test_sinusoids_match_hf_positions(oracle):
    model, _, dims = oracle
    theirs = model.model.encoder.embed_positions.weight.detach().numpy()
    ours = sinusoids(dims.n_audio_ctx, dims.n_audio_state)
    np.testing.assert_allclose(ours, theirs, atol=1e-4)  # f32 vs f64 timescales


def test_encoder_parity(oracle):
    model, params, dims = oracle
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 80, 3000)).astype(np.float32) * 0.5
    ours = np.asarray(encode(params, jnp.asarray(mel), dims))
    with torch.no_grad():
        theirs = model.model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    assert ours.shape == theirs.shape == (2, 1500, 64)
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_decoder_parity_with_cross_attention(oracle):
    model, params, dims = oracle
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 80, 3000)).astype(np.float32) * 0.5
    toks = np.array([[3, 17, 99, 256, 7]], dtype=np.int64)
    xa = encode(params, jnp.asarray(mel), dims)
    logits, ws = decode_full(params, jnp.asarray(toks, jnp.int32), xa, dims, return_cross_attn=True)
    with torch.no_grad():
        out = model(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(toks),
            output_attentions=True,
        )
    np.testing.assert_allclose(np.asarray(logits), out.logits.numpy(), atol=3e-3)
    # ours are PRE-softmax qk scores (L, B, H, S, T); softmax to compare with
    # HF's post-softmax cross_attentions
    import jax.nn

    ours_w = np.asarray(jax.nn.softmax(jnp.asarray(ws), axis=-1))
    theirs_w = np.stack([w.numpy() for w in out.cross_attentions])
    np.testing.assert_allclose(ours_w, theirs_w, atol=2e-4)


def test_incremental_decode_matches_full(oracle):
    _, params, dims = oracle
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((1, 80, 3000)).astype(np.float32) * 0.5
    toks = np.array([[3, 17, 99, 256, 7, 1200]], dtype=np.int32)
    xa = encode(params, jnp.asarray(mel), dims)
    full_logits, full_ws = decode_full(params, jnp.asarray(toks), xa, dims, return_cross_attn=True)

    cache = init_cache(params, xa, dims)
    step_logits, step_ws = [], []
    for i in range(toks.shape[1]):
        logits, cache, ws = decode_step(params, jnp.asarray(toks[:, i : i + 1]), cache, jnp.int32(i), dims)
        step_logits.append(np.asarray(logits)[:, 0])
        step_ws.append(np.asarray(ws)[:, :, :, 0])  # (L, B, H, T)
    step_logits = np.stack(step_logits, axis=1)  # (B, S, V)
    np.testing.assert_allclose(step_logits, np.asarray(full_logits), atol=2e-3)
    step_ws = np.stack(step_ws, axis=3)  # (L, B, H, S, T)
    np.testing.assert_allclose(step_ws, np.asarray(full_ws), atol=1e-4)


def test_prompt_chunk_then_steps(oracle):
    """Prompt processed as one multi-token step == token-by-token."""
    _, params, dims = oracle
    rng = np.random.default_rng(3)
    xa = jnp.asarray(rng.standard_normal((1, 1500, 64)).astype(np.float32) * 0.1)
    toks = jnp.asarray(np.array([[5, 6, 7, 8]], dtype=np.int32))

    cache = init_cache(params, xa, dims)
    logits_chunk, cache_chunk, _ = decode_step(params, toks, cache, jnp.int32(0), dims)

    cache2 = init_cache(params, xa, dims)
    outs = []
    for i in range(4):
        l, cache2, _ = decode_step(params, toks[:, i : i + 1], cache2, jnp.int32(i), dims)
        outs.append(np.asarray(l)[:, 0])
    np.testing.assert_allclose(np.asarray(logits_chunk), np.stack(outs, axis=1), atol=2e-3)
    np.testing.assert_allclose(np.asarray(cache_chunk.k), np.asarray(cache2.k), atol=1e-4)


def test_openai_pt_roundtrip(tmp_path, oracle):
    model, hf_params, dims = oracle
    path = str(tmp_path / "tiny_synth.pt")
    save_openai_pt(model, path)
    loaded = load_model(path)
    assert loaded.dims == dims
    for a, b in zip(jax.tree.leaves(loaded.params), jax.tree.leaves(hf_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_hf_dir_roundtrip(tmp_path, oracle):
    model, hf_params, dims = oracle
    d = str(tmp_path / "hf_model")
    model.save_pretrained(d, safe_serialization=True)
    loaded = load_model(d)
    assert loaded.dims == dims
    leaves_a = jax.tree.leaves(loaded.params)
    leaves_b = jax.tree.leaves(hf_params)
    assert len(leaves_a) == len(leaves_b)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_untied_proj(tmp_path):
    import torch as t
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    from model_utils import make_tokenizer

    tok = make_tokenizer()
    cfg_kw = dict(
        vocab_size=N_VOCAB, num_mel_bins=80, d_model=64, encoder_layers=2,
        decoder_layers=2, encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128, max_source_positions=100,
        max_target_positions=448, pad_token_id=tok.eot, bos_token_id=tok.eot,
        eos_token_id=tok.eot, decoder_start_token_id=tok.sot,
        attn_implementation="eager", tie_word_embeddings=False,
    )
    t.manual_seed(7)
    m = WhisperForConditionalGeneration(WhisperConfig(**cfg_kw)).eval()
    params, dims = from_hf_state_dict(m.state_dict(), m.config.to_dict())
    assert "proj" in params["decoder"]
    rng = np.random.default_rng(5)
    mel = rng.standard_normal((1, 80, 200)).astype(np.float32) * 0.3
    toks = np.array([[3, 4]], dtype=np.int64)
    xa = encode(params, jnp.asarray(mel), dims)
    logits, _ = decode_full(params, jnp.asarray(toks, jnp.int32), xa, dims)
    with t.no_grad():
        theirs = m(input_features=t.from_numpy(mel), decoder_input_ids=t.from_numpy(toks)).logits
    np.testing.assert_allclose(np.asarray(logits), theirs.numpy(), atol=3e-3)


def test_random_init_shapes():
    params = init_params(TINY_TEST_DIMS)
    assert params["decoder"]["tok_emb"].shape == (TINY_TEST_DIMS.n_vocab, 64)
    assert params["encoder"]["blocks"]["attn"]["q"]["w"].shape == (2, 64, 64)


def test_alignment_heads_inference():
    from whisper_timestamped_tpu.models.alignment_heads import (
        infer_model_name,
        heads_for_model_name,
    )

    assert infer_model_name(37184640) == "tiny"
    assert infer_model_name(1541384960, True) == "large-v1"
    assert infer_model_name(1541384960, False) == "large-v3"
    assert infer_model_name(123) is None
    assert heads_for_model_name("openai/whisper-tiny") == heads_for_model_name("tiny")
    assert heads_for_model_name("tiny.en.pt") == heads_for_model_name("tiny.en")


def test_asymmetric_layers_distil_style(tmp_path):
    """distil-whisper geometry: deep encoder, shallow decoder."""
    import torch as t
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    from model_utils import make_tokenizer

    tok = make_tokenizer()
    cfg = WhisperConfig(
        vocab_size=N_VOCAB, num_mel_bins=80, d_model=64, encoder_layers=4,
        decoder_layers=1, encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128, max_source_positions=100,
        max_target_positions=448, pad_token_id=tok.eot, bos_token_id=tok.eot,
        eos_token_id=tok.eot, decoder_start_token_id=tok.sot,
        attn_implementation="eager",
    )
    t.manual_seed(3)
    m = WhisperForConditionalGeneration(cfg).eval()
    params, dims = from_hf_state_dict(m.state_dict(), m.config.to_dict())
    assert dims.n_audio_layer == 4 and dims.n_text_layer == 1
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 80, 200)).astype(np.float32) * 0.3
    toks = np.array([[3, 4, 5]], dtype=np.int64)
    xa = encode(params, jnp.asarray(mel), dims)
    logits, _ = decode_full(params, jnp.asarray(toks, jnp.int32), xa, dims)
    with t.no_grad():
        theirs = m(input_features=t.from_numpy(mel), decoder_input_ids=t.from_numpy(toks)).logits
    np.testing.assert_allclose(np.asarray(logits), theirs.numpy(), atol=3e-3)
