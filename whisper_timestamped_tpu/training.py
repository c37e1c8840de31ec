"""Fine-tuning support: teacher-forced loss + jittable train step.

A capability beyond the reference (which is inference-only): standard
cross-entropy fine-tuning of the Whisper encoder/decoder, designed for
pjit/mesh execution — params TP-sharded, batch DP-sharded (see parallel/mesh).
"""

from __future__ import annotations

import os
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .models.whisper_jax import WhisperDims, decode_full, encode


def teacher_forced_loss(
    params,
    mel: jnp.ndarray,  # (B, n_mels, T)
    tokens: jnp.ndarray,  # (B, S) int32: full sequences incl. sot/eot
    loss_mask: jnp.ndarray,  # (B, S) float: which positions contribute
    dims: WhisperDims,
) -> jnp.ndarray:
    """Mean next-token cross entropy over masked positions."""
    xa = encode(params, mel, dims)
    logits, _ = decode_full(params, tokens[:, :-1], xa, dims)
    targets = tokens[:, 1:]
    mask = loss_mask[:, 1:]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_train_step(dims: WhisperDims, optimizer: Optional[optax.GradientTransformation] = None):
    """Returns (init_state, train_step). ``train_step`` is jit/pjit-friendly:
    pure, static shapes, grads + optimizer update in one program."""
    optimizer = optimizer or optax.adamw(1e-5)

    def init_state(params) -> TrainState:
        return TrainState(params=params, opt_state=optimizer.init(params), step=jnp.int32(0))

    def train_step(state: TrainState, mel, tokens, loss_mask) -> Tuple[TrainState, jnp.ndarray]:
        loss, grads = jax.value_and_grad(teacher_forced_loss)(
            state.params, mel, tokens, loss_mask, dims
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state, step=state.step + 1), loss

    return init_state, train_step


def save_checkpoint(path: str, state: TrainState) -> None:
    """Persist a TrainState with orbax (params + optimizer + step)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    # force=True: periodic saves to a fixed path (ckpt/latest) must overwrite
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore a TrainState saved by ``save_checkpoint`` (template gives the
    tree structure/shapes)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
