"""Precision policy: bf16 compute / fp32 params + optimizer state.

The reference relies on apex amp O1/O2 fp16 with dynamic loss scaling
(`src/tasks/run_video_retrieval.py:329-331,439-441`). On TPU, bfloat16 shares
the fp32 exponent range, so no loss scaling is needed: parameters and the
optimizer state stay fp32, and matmul-heavy module compute runs in bf16 with
fp32 accumulation on the MXU (`preferred_element_type`).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # softmax / losses / layernorm statistics always run in fp32
    reduce_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, tree):
        import jax

        return jax.tree_util.tree_map(
            lambda x: x.astype(self.compute_dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )


DEFAULT = Policy()
FP32 = Policy(compute_dtype=jnp.float32)


def policy_from_name(name: str) -> Policy:
    if name in ("bf16", "bfloat16"):
        return DEFAULT
    if name in ("fp32", "float32"):
        return FP32
    raise ValueError(f"unknown precision policy {name!r}")
