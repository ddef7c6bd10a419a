"""Sequence-parallel temporal attention — TPU-native long-video extension.

The divided space-time factorization bounds the fused sequence (SURVEY.md §5),
but the *temporal* attention still sees all T frames. For long videos
(T ≫ 16), this module shards the frame axis across the mesh: each device
computes Q for its local T-shard and attends over the full T via all-gathered
K/V. With ALPRO head dims (D=768) and T up to a few hundred, K/V per
(b·n) row is tiny — one all_gather over ICI beats a ring schedule, and the
attention math stays exact (no approximation).

No reference counterpart (the reference replicates T everywhere); this is the
natural mesh extension flagged in SURVEY.md §2.10.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from alpro_tpu.ops.attention import multi_head_attention


def sharded_temporal_attention(
    x: jnp.ndarray,
    qkv_kernel: jnp.ndarray,
    qkv_bias: jnp.ndarray,
    proj_kernel: jnp.ndarray,
    proj_bias: jnp.ndarray,
    num_heads: int,
    mesh: Mesh,
    axis: str = "dp",
) -> jnp.ndarray:
    """Temporal self-attention over axis 1 of x: (BN, T, D), with T sharded
    over `axis`. Numerically equal to the unsharded attention (tested on the
    8-device CPU mesh).

    Weights follow the TimeSformer qkv layout: qkv_kernel (D, 3D) with
    [q; k; v] column chunks, proj_kernel (D, D).
    """
    D = x.shape[-1]
    hd = D // num_heads

    def local_fn(x_local, qkv_k, qkv_b, proj_k, proj_b):
        BN, T_local, _ = x_local.shape
        qkv = x_local @ qkv_k + qkv_b  # (BN, T_local, 3D)
        qkv = qkv.reshape(BN, T_local, 3, num_heads, hd)
        q = jnp.moveaxis(qkv[:, :, 0], 1, 2)  # (BN, H, T_local, hd)
        k = jnp.moveaxis(qkv[:, :, 1], 1, 2)
        v = jnp.moveaxis(qkv[:, :, 2], 1, 2)
        # gather K/V over the sharded frame axis → full-T keys/values
        k_full = jax.lax.all_gather(k, axis, axis=2, tiled=True)
        v_full = jax.lax.all_gather(v, axis, axis=2, tiled=True)
        out = multi_head_attention(q, k_full, v_full, impl="xla")
        out = jnp.moveaxis(out, 1, 2).reshape(BN, T_local, D)
        return out @ proj_k + proj_b

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(), P(), P(), P()),
        out_specs=P(None, axis, None),
    )
    return fn(x, qkv_kernel, qkv_bias, proj_kernel, proj_bias)
