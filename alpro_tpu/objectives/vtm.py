"""VTM — video-text matching with hard-negative mining, jit-safe.

The reference samples one hard negative per example with a Python loop of
`torch.multinomial(...).item()` calls — a per-element host sync
(`/root/reference/src/modeling/alpro_models.py:299-316`, flagged FIXME there).
Here sampling is one batched `jax.random.categorical` over the masked sim
logits: multinomial(softmax(s)) == categorical(s), so the distribution is
identical without any host round-trip.

Negative scope: the reference restricts candidates to the local device's block
of the gathered sim matrix (`alpro_models.py:285-290`). `num_local_blocks > 1`
reproduces that block-diagonal restriction deterministically in global math;
the default (1 block) samples from the full global batch — strictly harder
negatives, the TPU-native default since the gather rides ICI.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def sample_hard_negatives(
    rng: jax.Array,
    sim_v2t: jnp.ndarray,
    sim_t2v: jnp.ndarray,
    num_local_blocks: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (neg_text_idx, neg_video_idx), each (B,).

    neg_text_idx[i]  — index of the hard negative *text* for video i,
                       sampled ∝ softmax(sim_v2t[i]) with self masked out.
    neg_video_idx[i] — index of the hard negative *video* for text i.
    """
    B = sim_v2t.shape[0]
    eye = jnp.eye(B, dtype=bool)
    allowed = ~eye
    if num_local_blocks > 1:
        assert B % num_local_blocks == 0, (
            f"global batch {B} must divide into {num_local_blocks} blocks"
        )
        block = jnp.arange(B) // (B // num_local_blocks)
        same_block = block[:, None] == block[None, :]
        allowed = allowed & same_block
    bias = jnp.where(allowed, 0.0, _NEG_INF)
    rng_t, rng_v = jax.random.split(rng)
    neg_text_idx = jax.random.categorical(
        rng_t, sim_v2t.astype(jnp.float32) + bias, axis=-1
    )
    neg_video_idx = jax.random.categorical(
        rng_v, sim_t2v.astype(jnp.float32) + bias, axis=-1
    )
    return neg_text_idx, neg_video_idx


def vtm_loss_from_logits(
    pos_logits: jnp.ndarray, neg_logits: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """2-way CE over [B positives; 2B negatives] (`alpro_models.py:334-339`)."""
    logits = jnp.concatenate([pos_logits, neg_logits], axis=0).astype(jnp.float32)
    B = pos_logits.shape[0]
    labels = jnp.concatenate(
        [jnp.ones(B, jnp.int32), jnp.zeros(neg_logits.shape[0], jnp.int32)]
    )
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))
    return loss, logits, labels
