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
SEQ_AXIS = "sp"


def axis_names_for_shape(shape) -> tuple:
    """Mesh axis names by rank: 1D → (dp,), 2D → (dp, sp).

    The 2D layout is the long-video configuration: batch over dp, the
    TimeSformer temporal-attention frame axis over sp
    (`parallel/seq_parallel.py`, `models/timesformer.py` sp_axis)."""
    n = len(shape)
    if n == 1:
        return (DATA_AXIS,)
    if n == 2:
        return (DATA_AXIS, SEQ_AXIS)
    raise ValueError(f"unsupported mesh rank {n}; use 1 (dp) or 2 (dp, sp)")


def maybe_shard_axis(x, axis: Optional[str], dim: int):
    """GSPMD constraint: shard x's `dim` over mesh axis `axis`, leaving every
    other dim unconstrained (so e.g. an existing dp batch sharding is kept).

    No-op when `axis` is None or no ambient mesh carrying `axis` is active at
    trace time — callers activate one with `with jax.set_mesh(mesh):` around
    the jitted call (see `cli/common.py::setup_training`); traces without the
    context (param init, plain eval jits) compile exactly as before."""
    if not axis:
        return x
    am = jax.sharding.get_abstract_mesh()
    if am.empty or axis not in am.axis_names:
        return x
    from jax.sharding import PartitionSpec

    U = PartitionSpec.UNCONSTRAINED
    spec = PartitionSpec(*[axis if i == dim else U for i in range(x.ndim)])
    return jax.lax.with_sharding_constraint(x, spec)


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


def select_devices(n: int) -> list:
    """Pick `n` of the global devices for a mesh, multi-process-safe.

    Single-process a plain prefix works; multi-process the prefix would put
    every mesh device on process 0 and leave other hosts with zero
    addressable shards (`make_array_from_process_local_data` then fails with
    empty addressable_shards). Instead take n/P devices from EVERY process so
    each host keeps an addressable slice of the mesh."""
    devices = list(jax.devices())
    if n == len(devices):
        return devices
    cnt = jax.process_count()
    if cnt == 1:
        return devices[:n]
    if n % cnt != 0:
        raise ValueError(
            f"cannot lay {n} mesh devices over {cnt} processes evenly; "
            f"adjust train_batch_size or mesh_shape"
        )
    per = n // cnt
    picked = []
    for p in range(cnt):
        local = [d for d in devices if d.process_index == p]
        if len(local) < per:
            raise ValueError(
                f"process {p} has {len(local)} devices, need {per}"
            )
        picked.extend(local[:per])
    return picked


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; replicate the rest."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host-side batch pytree on the mesh, sharded over dp.

    Single-process: a plain device_put onto the NamedSharding. Multi-process
    (after `core.distributed.maybe_initialize`): each host holds 1/P of the
    global batch, so the global jax.Array is assembled with
    `jax.make_array_from_process_local_data` — the host-local rows become
    this host's shards of the global array, no cross-host transfer."""
    multiprocess = jax.process_count() > 1

    def _put(x):
        sharding = data_sharding(mesh, np.ndim(x) or 1)
        if multiprocess:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            )
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(_put, batch)


def replicate(mesh: Mesh, tree):
    """Replicate a host-side pytree onto every device of the mesh. In a
    multi-process runtime every host must hold the same values (same-seed
    init or a restored checkpoint — both deterministic here); the global
    array is stitched from each host's local copy."""
    sharding = replicated_sharding(mesh)
    if jax.process_count() > 1:
        def _put(x):
            x = np.asarray(x)
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.tree_util.tree_map(_put, tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
