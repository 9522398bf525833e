"""Tensor-parallel parameter sharding rules (megatron-style, via GSPMD).

The reference has no tensor parallelism (its only distribution is the
DataParallel list scatter, reference utils/DataParallel.py:8-110); this
module is the TPU-native extension for serving/training beyond one chip's
HBM: a 2-D ``(data, model)`` mesh where

  * every 2-layer MLP is column-parallel then row-parallel (the first
    kernel's output features and the second kernel's input features live on
    the ``model`` axis; the elementwise ReLU acts on the shards and XLA
    inserts the psum after the row-parallel matmul),
  * attention q/k/v projections shard the head axis, the output projection
    contracts it back,
  * transformer FFN pairs (linear1/linear2, fc2_0/fc2_1) follow the same
    column/row pattern,
  * everything else (norms, embeddings, bias tables, single-layer heads) is
    replicated.

No hand-written collectives: parameters carry ``NamedSharding``s and GSPMD
derives the all-reduces, exactly like the data-parallel path in
``parallel/mesh.py``.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COLUMN = {"linear1", "fc2_0"}       # kernel (D, F): shard F
_ROW = {"linear2", "fc2_1"}          # kernel (F, D): shard F (input axis)
_QKV = {"q", "k", "v"}               # DenseGeneral (D, h, hd): shard h


def make_mesh_2d(n_data: int, n_model: int) -> Mesh:
    devices = jax.devices()
    n = n_data * n_model
    assert n <= len(devices), (n, len(devices))
    return Mesh(np.asarray(devices[:n]).reshape(n_data, n_model),
                ("data", "model"))


def _spec(path, ndim, keys, axis):
    mod, name = path[-2] if len(path) >= 2 else "", path[-1]
    if name == "kernel":
        if mod in _QKV and ndim == 3 and len(path) >= 3 and \
                path[-3] == "self_attn":
            return P(None, axis, None)
        if mod == "out" and ndim == 3:
            return P(axis, None, None)
        if mod in _COLUMN and ndim == 2:
            return P(None, axis)
        if mod in _ROW and ndim == 2:
            return P(axis, None)
        if mod == "dense0" and ndim == 2 and \
                path[:-2] + ("dense1", "kernel") in keys:
            return P(None, axis)
        if mod == "dense1" and ndim == 2:
            return P(axis, None)
    if name == "bias":
        if mod in _QKV and ndim == 2 and len(path) >= 3 and \
                path[-3] == "self_attn":
            return P(axis, None)
        if mod in _COLUMN and ndim == 1:
            return P(axis)
        if mod == "dense0" and ndim == 1 and \
                path[:-2] + ("dense1", "kernel") in keys:
            return P(axis)
    return P()


def param_partition_specs(params, axis: str = "model"):
    """A PartitionSpec pytree matching ``params`` (works for BigC, BaseC and
    any module built from the shared layers)."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    keys = set(flat)
    specs = {p: _spec(p, v.ndim, keys, axis) for p, v in flat.items()}
    return flax.traverse_util.unflatten_dict(specs)


def shard_params(params, mesh: Mesh, axis: str = "model"):
    """device_put the params with the TP specs on ``mesh``."""
    specs = param_partition_specs(params, axis)
    return jax.device_put(params, jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P)))


def state_shardings(state):
    """Read back the concrete sharding of every leaf of a (sharded) state —
    pass as jit in/out shardings so TP layouts survive the step boundary."""
    return jax.tree_util.tree_map(lambda x: x.sharding, state)
