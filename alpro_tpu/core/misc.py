"""Misc utilities: seeding, retrying IO, training-meta snapshots, profiling.

Reference equivalents: `set_random_seed` (`src/utils/misc.py:12-18`),
retry-10× checkpoint IO ("azure blob fails occasionally",
`src/utils/load_save.py:54-70`), `save_training_meta` code-zip snapshot
(`load_save.py:19-42`), and the rebuild's profiler hook (the reference has
none — SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
import zipfile
from typing import Callable, Optional

import numpy as np

from alpro_tpu.core.logging import LOGGER


def parse_compiler_options(spec) -> Optional[dict]:
    """Parse an `--xla_compiler_options` value into the dict `jax.jit`'s
    `compiler_options=` expects.

    Accepts "key=value,key=value" (or an already-parsed dict, passed
    through). Empty/None → None (no options; the default everywhere). The
    options are applied per-computation at compile time; unknown names are
    rejected loudly by the backend compiler — verified live on the TPU
    remote-compile path (docs/PERF.md round 5 flag sweep)."""
    if not spec:
        return None
    if isinstance(spec, dict):
        return dict(spec) or None
    out = {}
    for kv in str(spec).split(","):
        kv = kv.strip()
        if not kv:
            continue
        if "=" not in kv:
            raise ValueError(
                f"--xla_compiler_options entry {kv!r} is not key=value")
        k, v = kv.split("=", 1)
        out[k.strip()] = v.strip()
    return out or None


def set_random_seed(seed: int) -> "np.random.Generator":
    """Seed numpy's global state (host-side data pipeline) and return a
    Generator. Device-side randomness is explicit PRNG keys throughout."""
    np.random.seed(seed)
    import random

    random.seed(seed)
    return np.random.default_rng(seed)


def retry_io(fn: Callable, n_retries: int = 10, sleep_s: float = 1.0,
             what: str = "io"):
    """Retry flaky filesystem/blob operations (`load_save.py:54-70`)."""
    for attempt in range(n_retries):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — deliberately broad, like the reference
            LOGGER.warning("%s failed (attempt %d/%d): %s", what, attempt + 1,
                           n_retries, e)
            time.sleep(sleep_s)
    return fn()  # final attempt propagates the error


def save_training_meta(output_dir: str, cfg: dict, repo_root: Optional[str] = None):
    """Snapshot args + a zip of the codebase into the run dir
    (`load_save.py:19-42`) so every run is reproducible from its output."""
    log_dir = os.path.join(output_dir, "log")
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, "args.json"), "w") as f:
        json.dump({k: v for k, v in cfg.items() if _jsonable(v)}, f, indent=2)

    repo_root = repo_root or os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    zip_path = os.path.join(log_dir, "code.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for base, dirs, files in os.walk(repo_root):
            dirs[:] = [
                d for d in dirs
                if d not in (".git", "__pycache__", "output", "data", ".claude")
            ]
            for fname in files:
                if fname.endswith((".py", ".json", ".cpp", ".md", "Makefile")):
                    full = os.path.join(base, fname)
                    zf.write(full, os.path.relpath(full, repo_root))
    LOGGER.info("saved training meta to %s", log_dir)


def _jsonable(v) -> bool:
    try:
        json.dumps(v)
        return True
    except (TypeError, ValueError):
        return False


@contextlib.contextmanager
def maybe_profile(output_dir: Optional[str], enabled: bool = False):
    """jax.profiler trace context — TensorBoard-compatible traces under
    <output_dir>/profile (the reference has no profiling at all)."""
    if not enabled or not output_dir:
        yield
        return
    import jax

    trace_dir = os.path.join(output_dir, "profile")
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        yield
    LOGGER.info("wrote profiler trace to %s", trace_dir)
