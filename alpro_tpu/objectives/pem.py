"""PEM/MPM — prompting entity modelling with a frozen Prompter teacher.

Reference: `/root/reference/src/modeling/alpro_models.py:389-630` and
`src/pretrain/run_pretrain_sparse.py:326-362`. The teacher encodes
num_entities × num_templates prompt sentences once, average-ensembles per
entity into a (num_entities, 256) prompt bank, then pseudo-labels the masked
crop of each training clip by similarity of its video feature to the bank.
The student's mpm_head predicts those soft labels from the mean fused
embedding of the *erased* patches.

Deviation from the reference, on purpose: the reference's ignore mask takes
``torch.max(sim, dim=1)[1] < 0.2`` — the argmax *index* compared to the
threshold (`alpro_models.py:527`), i.e. "ignore iff the argmax is entity 0",
which contradicts its own comment ("if the prob for the most likely entity is
< 0.2, ignore"). We implement the documented intent: ignore when
max softmax probability < threshold.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def build_prompt_bank(
    encode_text_feat: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    prompt_ids: jnp.ndarray,
    prompt_mask: jnp.ndarray,
    num_entities: int,
    chunk_size: int = 1024,
) -> jnp.ndarray:
    """Encode (num_templates * num_entities, L) prompt token batches into a
    (num_entities, d) averaged, re-normalized prompt bank.

    `encode_text_feat(ids, mask) -> (b, d)` is the teacher's text pipeline
    (text mode → text_proj → L2 norm). Prompt order is template-major —
    template t occupies rows [t*num_entities, (t+1)*num_entities) — matching
    the reference's chunk-then-stack ensembling (`alpro_models.py:470-475`).

    Runs as a lax.map over fixed-size chunks: one compiled program regardless
    of bank size (the reference loops Python-side in 10k steps).
    """
    total, L = prompt_ids.shape
    assert total % num_entities == 0, "prompts must be a multiple of num_entities"
    pad = (-total) % chunk_size
    ids = jnp.pad(prompt_ids, ((0, pad), (0, 0)))
    mask = jnp.pad(prompt_mask, ((0, pad), (0, 0)), constant_values=1)
    n_chunks = ids.shape[0] // chunk_size
    feats = jax.lax.map(
        lambda c: encode_text_feat(c[0], c[1]),
        (
            ids.reshape(n_chunks, chunk_size, L),
            mask.reshape(n_chunks, chunk_size, L),
        ),
    )
    feats = feats.reshape(-1, feats.shape[-1])[:total]
    num_templates = total // num_entities
    bank = feats.reshape(num_templates, num_entities, -1).mean(axis=0)
    return bank


def pseudo_labels_from_feats(
    crop_video_feat: jnp.ndarray,
    prompt_bank: jnp.ndarray,
    temp: jnp.ndarray,
    ignore_threshold: float = 0.2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, d) masked-crop features → ((B, E) soft labels, (B,) ignore mask)."""
    sim = crop_video_feat.astype(jnp.float32) @ prompt_bank.T.astype(jnp.float32)
    sim = sim / temp
    soft = jax.nn.softmax(sim, axis=1)
    ignore = jnp.max(soft, axis=1) < ignore_threshold
    return soft, ignore


def masked_patch_mean(
    fusion_hidden: jnp.ndarray,
    patch_masks: jnp.ndarray,
    txt_len: int,
) -> jnp.ndarray:
    """Mean fused embedding of the erased patches.

    fusion_hidden: (B, Lt + 1 + N, D) fusion output; patch_masks: (B, h, w)
    with 1 = kept, 0 = erased (`alpro_models.py:209-232` — the +1 skips the
    visual CLS token)."""
    B = fusion_hidden.shape[0]
    visual = fusion_hidden[:, txt_len + 1 :, :].astype(jnp.float32)
    inv = 1.0 - patch_masks.reshape(B, -1).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(inv, axis=1, keepdims=True), 1.0)
    return jnp.sum(visual * inv[:, :, None], axis=1) / denom


def mpm_loss(
    mpm_logits: jnp.ndarray,
    soft_labels: jnp.ndarray,
    ignore_masks: jnp.ndarray,
) -> jnp.ndarray:
    """Soft cross-entropy, zeroing ignored rows; normalized by #non-ignored
    (`alpro_models.py:227-231`)."""
    ce = -jnp.sum(
        jax.nn.log_softmax(mpm_logits.astype(jnp.float32), axis=1)
        * soft_labels.astype(jnp.float32),
        axis=1,
    )
    ce = jnp.where(ignore_masks, 0.0, ce)
    B = mpm_logits.shape[0]
    denom = jnp.maximum(B - jnp.sum(ignore_masks), 1)
    return jnp.sum(ce) / denom
