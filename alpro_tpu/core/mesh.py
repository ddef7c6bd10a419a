"""Device mesh + sharding helpers.

The reference scales with Horovod data parallelism only (SURVEY.md §2.10); here
the equivalent is a `jax.sharding.Mesh` with a `dp` axis: parameters are
replicated, the batch is sharded over `dp`, and gradient allreduce disappears
into the psum that GSPMD inserts for the jit-compiled train step. The mesh also
carries optional `tp` (reserved for tensor-parallel extensions) so multi-axis
layouts compile through the same code path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"
MODEL_AXIS = "tp"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = (DATA_AXIS,),
) -> Mesh:
    """Build a mesh over the given (default: all) devices.

    `shape=None` puts every device on the first axis (pure data parallel).
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    if shape is None:
        shape = [len(devices)] + [1] * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; replicate the rest."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host-side batch pytree on the mesh, sharded over dp."""
    def _put(x):
        return jax.device_put(x, data_sharding(mesh, np.ndim(x) or 1))
    return jax.tree_util.tree_map(_put, batch)


def replicate(mesh: Mesh, tree):
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
