"""VTC — video-text contrastive loss with in-batch negatives.

Reference behaviour (`/root/reference/src/modeling/alpro_models.py:109-128`):
each device computes sim(local_feats, allgathered_feats) and builds one-hot
targets at its own block offset — using ``hvd.local_rank()``, which is only
correct single-node (SURVEY.md §1). Here the loss is written as *global* math:
under pjit/GSPMD with the batch sharded over the `dp` mesh axis, XLA inserts
the all_gather automatically and the one-hot-at-global-offset targets become a
plain identity — correct at any scale by construction.

Gradient-semantics note: Horovod's allgather is non-differentiable, so the
reference only backprops through the local side of the sim matrix. The global
formulation backprops through both sides (the standard CLIP loss — strictly
more gradient signal, same loss value). `stop_gather_grad=True` reproduces the
reference's one-sided gradients exactly for A/B comparisons.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _one_sided(feat_a, feat_b_sg):
    return feat_a @ jax.lax.stop_gradient(feat_b_sg).T


def vtc_loss(
    video_feat: jnp.ndarray,
    text_feat: jnp.ndarray,
    temp: jnp.ndarray,
    stop_gather_grad: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Args:
      video_feat, text_feat: (B, d) L2-normalized features (global batch under
        GSPMD; sharded over dp at runtime).
      temp: clamped temperature scalar.
    Returns: (loss, sim_v2t, sim_t2v) — sims are (B, B) logits (scaled by 1/temp).
    """
    vf = video_feat.astype(jnp.float32)
    tf = text_feat.astype(jnp.float32)
    if stop_gather_grad:
        sim_v2t = _one_sided(vf, tf) / temp
        sim_t2v = _one_sided(tf, vf) / temp
    else:
        sim_v2t = vf @ tf.T / temp
        sim_t2v = tf @ vf.T / temp

    B = vf.shape[0]
    targets = jnp.eye(B, dtype=jnp.float32)
    loss_v2t = -jnp.mean(
        jnp.sum(jax.nn.log_softmax(sim_v2t, axis=1) * targets, axis=1)
    )
    loss_t2v = -jnp.mean(
        jnp.sum(jax.nn.log_softmax(sim_t2v, axis=1) * targets, axis=1)
    )
    return (loss_v2t + loss_t2v) / 2.0, sim_v2t, sim_t2v
