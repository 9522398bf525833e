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


def mesh_from_spec(spec: str):
    """CLI ``--mesh`` parser: ``"8"`` -> 1-D data mesh over 8 devices;
    ``"4,2"`` -> 2-D (data, model) mesh (megatron-style TP over the model
    axis).  Returns (mesh, n_model)."""
    parts = [int(p) for p in str(spec).split(",") if p.strip()]
    assert 1 <= len(parts) <= 2, f"--mesh wants 'D' or 'D,M', got {spec!r}"
    if len(parts) == 1 or parts[1] == 1:
        from .mesh import make_mesh
        return make_mesh(parts[0]), 1
    return make_mesh_2d(parts[0], parts[1]), parts[1]


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


def _fits(shape, spec, mesh: Mesh) -> bool:
    """True if every sharded dim of ``shape`` divides by its mesh extent."""
    for i, name in enumerate(spec):
        if name is None:
            continue
        names = name if isinstance(name, tuple) else (name,)
        k = 1
        for nm in names:
            k *= mesh.shape[nm]
        if shape[i] % k:
            return False
    return True


def shard_params(params, mesh: Mesh, axis: str = "model"):
    """device_put the params with the TP specs on ``mesh``.

    Dims the mesh's model extent does not divide fall back to replication
    (e.g. a 2-wide geometry kernel on an 8-way model axis): GSPMD requires
    divisibility, and replicating a small leaf costs nothing."""
    specs = param_partition_specs(params, axis)
    sh = jax.tree_util.tree_map(
        lambda v, s: NamedSharding(mesh, s if _fits(v.shape, s, mesh)
                                   else P()),
        params, specs)
    return jax.device_put(params, sh)


def state_shardings(state):
    """Read back the concrete sharding of every leaf of a (sharded) state —
    pass as jit in/out shardings so TP layouts survive the step boundary."""
    return jax.tree_util.tree_map(lambda x: x.sharding, state)
