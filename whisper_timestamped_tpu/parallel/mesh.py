"""Device meshes and sharding rules (DP over batch, megatron-style TP).

The reference has no distributed layer at all (strictly single-device,
batch-1 — reference ``transcribe.py:806`` asserts batch==1; survey §2.c).
This module is a new capability of the TPU build: data parallelism over
files/VAD-chunks/windows and tensor parallelism over attention heads + MLP
for models that exceed one chip's HBM. Communication is XLA collectives over
ICI, inserted by GSPMD from these sharding annotations — there is no
NCCL/MPI analog to port.

Sharding rules (layer-stacked param tree):
  * attention q/k/v: output (head) dim over ``tp``; o-projection: input dim.
  * MLP fc1: output dim over ``tp``; fc2: input dim.
  * embeddings, layernorms, convs: replicated.
  * activations: batch over ``dp``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(
    dp: Optional[int] = None, tp: int = 1, devices=None, axis_names=("dp", "tp")
) -> Mesh:
    """A (dp, tp) mesh over the available devices (dp inferred if None)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
        dp = n // tp
    assert dp * tp <= n, f"mesh {dp}x{tp} needs {dp*tp} devices, have {n}"
    dev_array = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(dev_array, axis_names)


def _pspec_for_path(path: str, ndim: int) -> P:
    """Partition spec for one parameter leaf, by its tree path."""
    # stacked block params carry a leading layer axis (ndim includes it)
    if "blocks" in path:
        if any(f"'{k}'" in path for k in ("attn_ln", "mlp_ln", "cross_ln")):
            return P()
        if "'q'" in path or "'k'" in path or "'v'" in path or "'fc1'" in path:
            # weight (L, in, out) -> shard out; bias (L, out) -> shard out
            if ndim == 3:
                return P(None, None, "tp")
            if ndim == 2:
                return P(None, "tp")
        if "'o'" in path or "'fc2'" in path:
            # weight (L, in, out) -> shard in; bias replicated
            if ndim == 3:
                return P(None, "tp", None)
            return P()
    return P()  # embeddings, convs, layernorms, positions: replicated


def param_pspec_tree(params: Dict[str, Any]):
    """PartitionSpec pytree matching ``params``."""

    def visit(path, leaf):
        return _pspec_for_path(jax.tree_util.keystr(path), np.ndim(leaf))

    return jax.tree_util.tree_map_with_path(visit, params)


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place params on the mesh with TP sharding (replicated over dp)."""
    specs = param_pspec_tree(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_batch(tree, mesh: Mesh, axis: str = "dp"):
    """Shard the leading (batch) axis of every leaf over ``axis``."""

    def put(x):
        spec = P(axis, *([None] * (np.ndim(x) - 1))) if np.ndim(x) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def place_batch(tree, mesh: Mesh, axis: str = "dp"):
    """Like ``shard_batch`` but tolerant: leaves whose leading axis is not
    divisible by the mesh axis are replicated instead (e.g. a B=1 serial
    decode on a tp-only mesh, or masks shared across the batch)."""
    n = mesh.shape[axis]

    def put(x):
        if np.ndim(x) >= 1 and np.shape(x)[0] % n == 0:
            spec = P(axis, *([None] * (np.ndim(x) - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)
