"""Checkpoint save/restore via Orbax.

Two tiers, mirroring the reference (`/root/reference/src/utils/load_save.py`):
  * deploy checkpoints — model params only, `ckpt/model_step_{N}`
    (`ModelSaver.save`, :45-70);
  * resume checkpoints — params + optimizer state + step in
    `restore/` with a double-buffered backup, written every save_steps
    (`E2E_TrainingRestorer`, :280-347).
"""

from __future__ import annotations

import os
import threading
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False

from alpro_tpu.core.logging import LOGGER


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_params(output_dir: str, step: int, params: Any) -> str:
    path = os.path.abspath(os.path.join(output_dir, "ckpt", f"model_step_{step}"))
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, _to_numpy_tree(params), force=True)
        ckptr.wait_until_finished()
    else:  # msgpack fallback
        import flax.serialization

        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path + ".msgpack", "wb") as f:
            f.write(flax.serialization.to_bytes(_to_numpy_tree(params)))
    LOGGER.info("saved model checkpoint: %s", path)
    return path


def load_params(path: str, target: Optional[Any] = None) -> Any:
    path = os.path.abspath(path)
    if os.path.exists(path + ".msgpack"):
        import flax.serialization

        with open(path + ".msgpack", "rb") as f:
            data = f.read()
        assert target is not None, "msgpack restore needs a target tree"
        return flax.serialization.from_bytes(target, data)
    assert _HAS_ORBAX, "orbax unavailable and no msgpack checkpoint found"
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        # read shapes/dtypes without materializing device arrays on host
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(
                np.shape(x), getattr(x, "dtype", None) or np.asarray(x).dtype
            ),
            target,
        )
        return ckptr.restore(path, abstract)
    return ckptr.restore(path)


class TrainingRestorer:
    """Preemption-safe resume: state written to restore/{a,b} alternately;
    the newer valid one wins at restore (reference double-buffer
    `restore.pt` / `restore_backup.pt`, `load_save.py:280-347`)."""

    def __init__(self, output_dir: str, save_steps: int = 500,
                 async_save: bool = True):
        self.dir = os.path.abspath(os.path.join(output_dir, "restore"))
        os.makedirs(self.dir, exist_ok=True)
        self.save_steps = save_steps
        self._slot = 0
        # Async saves overlap disk serialization with training (the reference
        # blocks the step loop on torch.save, `load_save.py:320-334`). The
        # device→host transfer still happens at the save boundary (caller's
        # device_get); only the host-side write goes to the background.
        self.async_save = bool(async_save) and _HAS_ORBAX
        self._ckptr = (
            ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
            if self.async_save
            else None
        )
        self._pending: Optional[threading.Thread] = None
        self._pending_error: Optional[BaseException] = None

    def _join_pending(self) -> None:
        t, self._pending = self._pending, None
        if t is not None:
            t.join()
        if self._pending_error is not None:
            err, self._pending_error = self._pending_error, None
            # a failed background commit must not be silent: the sync path
            # raised in the train loop, so the async path re-raises on join
            raise RuntimeError("async checkpoint save failed") from err

    def wait_until_finished(self) -> None:
        """Block until any in-flight async save has committed (call once at
        the end of training so the final resume point is never lost)."""
        self._join_pending()

    def due(self, global_step: int) -> bool:
        """Whether a resume checkpoint is due at this step. Callers must check
        this BEFORE materializing the state on host — a per-step
        `jax.device_get(state)` would force a blocking device sync and a
        full params+optimizer transfer on every step."""
        return self.save_steps > 0 and global_step % self.save_steps == 0

    def step(self, global_step: int, state) -> None:
        if self.due(global_step):
            self.save(state() if callable(state) else state)

    def save(self, state) -> None:
        slot = "a" if self._slot == 0 else "b"
        self._slot ^= 1
        path = os.path.join(self.dir, slot)
        # invalidate the slot's marker BEFORE overwriting its data: a
        # preemption mid-overwrite must fall back to the OTHER slot, never
        # restore a stale marker over partial/deleted data
        try:
            os.remove(path + ".done")
        except FileNotFoundError:
            pass
        step = int(np.asarray(jax.device_get(state.step)))
        if self.async_save:
            # one in-flight save at a time; a/b double-buffering means the
            # slot being overwritten is never the newest-wins restore target
            self._join_pending()
            tree = _to_numpy_tree(state)
            self._ckptr.save(path, args=ocp.args.StandardSave(tree), force=True)

            def _finalize(ckptr=self._ckptr, path=path, step=step):
                try:
                    ckptr.wait_until_finished()
                    # marker only after the atomic orbax commit: a preemption
                    # mid-save leaves the previous slot as the restore target
                    with open(path + ".done", "w") as f:
                        f.write(str(step))
                except BaseException as e:  # surfaced on the next join
                    self._pending_error = e

            self._pending = threading.Thread(target=_finalize, daemon=True)
            self._pending.start()
            return
        if _HAS_ORBAX:
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(path, _to_numpy_tree(state), force=True)
            ckptr.wait_until_finished()
        else:
            import flax.serialization

            with open(path + ".msgpack", "wb") as f:
                f.write(flax.serialization.to_bytes(_to_numpy_tree(state)))
        # stamp completion marker with the step for newest-wins restore
        with open(path + ".done", "w") as f:
            f.write(str(step))

    def latest_slot(self) -> Optional[str]:
        best, best_step = None, -1
        for slot in ("a", "b"):
            marker = os.path.join(self.dir, slot + ".done")
            if os.path.exists(marker):
                s = int(open(marker).read().strip() or -1)
                if s > best_step:
                    best, best_step = slot, s
        return best

    def restore(self, target):
        self._join_pending()
        slot = self.latest_slot()
        if slot is None:
            return None
        # seed the alternation so the NEXT save overwrites the OLDER slot —
        # a fresh post-preemption restorer starting at 'a' would otherwise
        # clobber the newest checkpoint first, breaking the double buffer
        self._slot = 1 if slot == "a" else 0
        return load_params(os.path.join(self.dir, slot), target)
