"""MLM — masked language modelling CE over the fused text positions.

Reference: `/root/reference/src/modeling/alpro_models.py:346-373` — masked ids
through text mode, fusion over [text, video], MLM head on the text slice,
CrossEntropyLoss with ignore_index=-100.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100


def mlm_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """logits: (B, L, V) fp32; labels: (B, L) int with -100 at unmasked
    positions. Mean CE over non-ignored positions (torch CrossEntropyLoss
    reduction='mean' semantics)."""
    valid = labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / count
