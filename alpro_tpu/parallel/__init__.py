"""Explicit-SPMD helpers (shard_map) mirroring the reference collectives.

The framework's default distribution model is GSPMD global math
(`train/step.py`). This module provides the *explicit* formulation — local
shards + `jax.lax.all_gather` + `jax.lax.axis_index` — for two purposes:

  1. cross-validation tests: the global VTC loss must equal the
     reference-semantics gathered/offset-target computation on a real mesh
     (fixing the reference's `hvd.local_rank()` bug, SURVEY.md §1, by using
     the global axis index);
  2. an escape hatch for kernels that want hand-placed collectives.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from alpro_tpu.core.mesh import DATA_AXIS


def vtc_loss_explicit(
    mesh: Mesh,
    video_feat: jnp.ndarray,
    text_feat: jnp.ndarray,
    temp: jnp.ndarray,
    axis: str = DATA_AXIS,
) -> jnp.ndarray:
    """Reference-shaped VTC: allgather remote features (stop-grad, like the
    non-differentiable hvd.allgather at `alpro_models.py:110-111`... except
    the *local* columns of the gathered matrix do carry gradient there via
    the local operand — here the gathered side is fully stop-gradded and the
    local row side carries the gradient), one-hot targets at the *global*
    device offset (`jax.lax.axis_index`, not local_rank)."""

    def local_loss(vf, tf, temp):
        b = vf.shape[0]
        g_vf = jax.lax.stop_gradient(
            jax.lax.all_gather(vf, axis).reshape(-1, vf.shape[-1])
        )
        g_tf = jax.lax.stop_gradient(
            jax.lax.all_gather(tf, axis).reshape(-1, tf.shape[-1])
        )
        sim_v2t = vf @ g_tf.T / temp
        sim_t2v = tf @ g_vf.T / temp
        idx = jax.lax.axis_index(axis)
        offset = b * idx
        cols = jnp.arange(g_tf.shape[0])[None, :]
        rows = jnp.arange(b)[:, None] + offset
        targets = (cols == rows).astype(jnp.float32)
        loss_v2t = -jnp.mean(
            jnp.sum(jax.nn.log_softmax(sim_v2t, axis=1) * targets, axis=1)
        )
        loss_t2v = -jnp.mean(
            jnp.sum(jax.nn.log_softmax(sim_t2v, axis=1) * targets, axis=1)
        )
        local = (loss_v2t + loss_t2v) / 2.0
        return jax.lax.pmean(local, axis)

    fn = shard_map(
        local_loss,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=P(),
    )
    return fn(video_feat, text_feat, temp)
