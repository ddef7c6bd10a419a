"""Persistent XLA compile cache — one switch for every benchmark/CLI entry.

Remote compiles through this sandbox's TPU tunnel take 2–12 min; the
persistent cache makes every graph a one-time cost across processes AND
rounds. Call before the first jit compilation (safe afterwards: jax applies
it to subsequent compiles).
"""

from __future__ import annotations

CACHE_DIR = "/root/.cache/jax_comp"


def enable_compile_cache(cache_dir: str = CACHE_DIR) -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs: compile-cache is best-effort
