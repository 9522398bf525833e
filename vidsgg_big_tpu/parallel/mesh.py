"""Device mesh + sharding helpers.

The reference's entire distributed surface is a single-process
``nn.DataParallel`` list-scatter over <=4 GPUs (reference
utils/DataParallel.py:8-110).  The TPU-native equivalent: a 1-D ``data`` mesh
over ICI, fixed-shape batches sharded on their leading axis, parameters
replicated, and XLA GSPMD inserting the cross-replica collectives (gradient
all-reduce) automatically from the shardings.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    assert n <= len(devices), (n, len(devices))
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (video) axis of every leaf across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """device_put a pytree with its leading axis split across the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
