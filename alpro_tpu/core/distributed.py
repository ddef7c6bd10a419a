"""Multi-process (multi-host) runtime initialization.

The reference launches one process per GPU with `horovodrun -np N` and calls
`hvd.init()` first thing (`/root/reference/run_scripts/pt_alpro.sh:8`,
`/root/reference/src/tasks/run_video_retrieval.py:818`). The TPU-native
equivalent is one process per host: `jax.distributed.initialize()` connects
the hosts through the JAX coordination service, after which `jax.devices()`
is the GLOBAL device list and GSPMD collectives span hosts (ICI within a
slice, DCN across slices).

Activation is env-gated so single-host runs never pay for it:

  * `ALPRO_COORDINATOR=host:port` + `ALPRO_NUM_PROCESSES` +
    `ALPRO_PROCESS_ID` — explicit coordination (any backend incl. the
    CPU-gloo test rig; the `horovodrun -np N` role).
  * `ALPRO_DISTRIBUTED=1` — auto-detect from the cluster environment
    (TPU pod metadata / SLURM / GKE), i.e. bare
    `jax.distributed.initialize()`.

Unlike the reference — whose VTM negative mining indexes the gathered
similarity matrix by `hvd.local_rank()` and is therefore wrong multi-node
(SURVEY.md §1 layering note, `alpro_models.py:285-290`) — nothing here
depends on process identity inside the step function: the jitted step sees
one global batch and GSPMD handles the rest, so single-host and multi-host
runs compute the identical global program.
"""

from __future__ import annotations

import os

import jax

_INITIALIZED = False


def maybe_initialize() -> bool:
    """Idempotent, env-gated `jax.distributed.initialize`.

    Must run before the first device access (backend init is lazy; the
    CLIs call this at the top of `setup_environment`). Returns True when a
    multi-process runtime was (or already had been) initialized.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    coord = os.environ.get("ALPRO_COORDINATOR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["ALPRO_NUM_PROCESSES"]),
            process_id=int(os.environ["ALPRO_PROCESS_ID"]),
        )
        _INITIALIZED = True
        return True
    if os.environ.get("ALPRO_DISTRIBUTED", "") not in ("", "0"):
        jax.distributed.initialize()
        _INITIALIZED = True
        return True
    return False


def process_info() -> tuple:
    """(process_index, process_count), safe before backend init."""
    try:
        return jax.process_index(), jax.process_count()
    except RuntimeError:
        return 0, 1


def is_primary() -> bool:
    """True on the host that owns run-dir file writes (rank 0). The
    reference gates result/checkpoint writes to rank 0 the same way
    (`run_video_retrieval.py:697-728`); non-primary hosts writing to a
    shared output_dir would race, and their host-local dirs may not exist
    (setup_environment only mkdirs on the primary)."""
    return process_info()[0] == 0


def data_shards() -> tuple:
    """(num_shards, shard_id) for per-host dataset sharding — the
    DistributedSampler role (`run_video_retrieval.py:115-117`): every host
    loads a disjoint stripe of the dataset, synchronized by the shared
    shuffle seed in `BatchLoader`."""
    idx, cnt = process_info()
    return cnt, idx


def local_batch_size(global_batch_size: int) -> int:
    """Per-host slice of the global batch. `train_batch_size` is GLOBAL
    (it shards over the full dp mesh); each host's loader yields 1/P of it
    and `shard_batch` assembles the global jax.Array. Differs from the
    reference, where batch size is per-process and the global batch is
    implicit (`horovodrun -np 16` × train_batch_size)."""
    _, cnt = process_info()
    if global_batch_size % cnt != 0:
        raise ValueError(
            f"train_batch_size {global_batch_size} must divide evenly over "
            f"{cnt} processes"
        )
    return global_batch_size // cnt
