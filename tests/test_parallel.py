"""Mesh/sharding/training tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from whisper_timestamped_tpu.models.whisper_jax import WhisperDims, decode_full, encode, init_params
from whisper_timestamped_tpu.parallel.mesh import (
    get_mesh,
    param_pspec_tree,
    shard_batch,
    shard_params,
)
from whisper_timestamped_tpu.training import make_train_step

DIMS = WhisperDims(
    n_mels=80, n_audio_ctx=60, n_audio_state=64, n_audio_head=4, n_audio_layer=2,
    n_vocab=1928, n_text_ctx=48, n_text_state=64, n_text_head=4, n_text_layer=2,
)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_pspec_rules():
    params = init_params(DIMS)
    specs = param_pspec_tree(params)
    assert specs["decoder"]["blocks"]["attn"]["q"]["w"] == P(None, None, "tp")
    assert specs["decoder"]["blocks"]["attn"]["o"]["w"] == P(None, "tp", None)
    assert specs["decoder"]["blocks"]["mlp"]["fc1"]["b"] == P(None, "tp")
    assert specs["decoder"]["blocks"]["mlp"]["fc2"]["b"] == P()
    assert specs["decoder"]["tok_emb"] == P()
    assert specs["encoder"]["conv1"]["w"] == P()


def test_tp_forward_matches_single_device():
    params = init_params(DIMS, jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 80, 120)).astype(np.float32) * 0.3)
    tokens = jnp.asarray(rng.integers(0, 300, (2, 8)).astype(np.int32))

    def fwd(params, mel, tokens):
        xa = encode(params, mel, DIMS)
        logits, _ = decode_full(params, tokens, xa, DIMS)
        return logits

    ref = np.asarray(jax.jit(fwd)(params, mel, tokens))

    mesh = get_mesh(dp=2, tp=4)
    with mesh:
        p_sharded = shard_params(params, mesh)
        mel_s = shard_batch(mel, mesh)
        tok_s = shard_batch(tokens, mesh)
        out = np.asarray(jax.jit(fwd)(p_sharded, mel_s, tok_s))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_train_step_runs_and_learns():
    params = init_params(DIMS, jax.random.PRNGKey(2))
    init_state, train_step = make_train_step(DIMS)
    state = init_state(params)
    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal((2, 80, 120)).astype(np.float32) * 0.3)
    tokens = jnp.asarray(rng.integers(0, 300, (2, 12)).astype(np.int32))
    mask = jnp.ones((2, 12), jnp.float32)
    step = jax.jit(train_step)
    losses = []
    for _ in range(5):
        state, loss = step(state, mel, tokens, mask)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # overfits the fixed batch


def test_graft_entry_contract():
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)

    fn, args = mod.entry()
    logits = jax.jit(fn)(*args)
    assert logits.shape[-1] == 51865


def test_checkpoint_save_restore(tmp_path):
    from whisper_timestamped_tpu.training import (
        load_checkpoint,
        make_train_step,
        save_checkpoint,
    )

    params = init_params(DIMS, jax.random.PRNGKey(4))
    init_state, train_step = make_train_step(DIMS)
    state = init_state(params)
    rng = np.random.default_rng(2)
    mel = jnp.asarray(rng.standard_normal((1, 80, 120)).astype(np.float32) * 0.3)
    tokens = jnp.asarray(rng.integers(0, 300, (1, 8)).astype(np.int32))
    mask = jnp.ones((1, 8), jnp.float32)
    state, _ = jax.jit(train_step)(state, mel, tokens, mask)

    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)
    restored = load_checkpoint(path, state)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # training continues from the restored state
    restored, loss = jax.jit(train_step)(restored, mel, tokens, mask)
    assert np.isfinite(float(loss))
