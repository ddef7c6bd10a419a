"""Host-object synchronization across processes.

The reference gathers pickled python objects with `hvd.allgather` byte
tensors and broadcasts choices with `hvd.broadcast_`
(`/root/reference/src/utils/distributed.py:149-204`), and merges eval results
through temp JSON files on a shared filesystem
(`run_video_retrieval.py:697-728`). The TPU-native equivalents wrap
`jax.experimental.multihost_utils`; in a single-process run they degrade to
identity, so the same code path works everywhere.
"""

from __future__ import annotations

import pickle
from typing import Any, List

import jax
import numpy as np


def _single_process() -> bool:
    return jax.process_count() == 1


def all_gather_list(data: Any) -> List[Any]:
    """Gather one picklable object per process → list ordered by process
    index (reference `all_gather_list`)."""
    if _single_process():
        return [data]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(data), dtype=np.uint8)
    # pad to the max length across processes
    n = np.asarray([payload.size], np.int32)
    sizes = multihost_utils.process_allgather(n)  # (P, 1)
    max_len = int(sizes.max())
    padded = np.zeros(max_len, np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)  # (P, max_len)
    return [
        pickle.loads(gathered[i, : int(sizes[i, 0])].tobytes())
        for i in range(gathered.shape[0])
    ]


def broadcast_object(data: Any, root: int = 0) -> Any:
    """Broadcast a picklable object from the root process (reference
    `any_broadcast`)."""
    if _single_process():
        return data
    from jax.experimental import multihost_utils

    is_root = jax.process_index() == root
    payload = pickle.dumps(data) if is_root else b""
    arr = np.frombuffer(payload, dtype=np.uint8)
    n = multihost_utils.broadcast_one_to_all(
        np.asarray([arr.size], np.int32), is_source=is_root
    )
    buf = np.zeros(int(n[0]), np.uint8)
    if is_root:
        buf[:] = arr
    out = multihost_utils.broadcast_one_to_all(buf, is_source=is_root)
    return pickle.loads(out.tobytes())


def barrier(name: str = "barrier") -> None:
    if _single_process():
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
