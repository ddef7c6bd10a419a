"""Multi-head attention core shared by the TimeSformer and BERT encoders.

Two implementations behind one API:
  * ``xla``    — einsum → softmax → einsum; XLA fuses the elementwise chain.
  * ``pallas`` — a fused single-pass kernel (see `alpro_tpu/ops/pallas_attn.py`)
                 that keeps the (S_q, S_k) score matrix in VMEM, avoiding the
                 HBM round-trip of the attention probabilities.

``auto`` picks pallas on TPU for the sequence lengths where it wins (spatial
197-token and fusion ~247-token attentions) and xla elsewhere (e.g. the tiny
temporal attention over T ≤ 16 frames, where the matmuls are too small for a
custom kernel to matter).

Replaces the reference's cuDNN softmax-attention in
`src/modeling/timesformer/vit.py:81-100` and `src/modeling/xbert.py:216-346`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    key_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    impl: str = "auto",
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jnp.ndarray:
    """Scaled dot-product attention.

    Args:
      q: (B, H, S_q, D)
      k, v: (B, H, S_k, D)
      key_mask: optional (B, S_k) — 1 for valid keys, 0 for padding.
      scale: defaults to D**-0.5.
      impl: "auto" | "xla" | "pallas".
    Returns:
      (B, H, S_q, D) in q.dtype.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5

    use_dropout = dropout_rate > 0.0 and not deterministic
    if impl == "auto":
        # pallas path has no attention-prob dropout; fall back under dropout
        impl = (
            "pallas"
            if (_on_tpu() and q.shape[-2] >= 64 and not use_dropout)
            else "xla"
        )

    if impl == "pallas":
        from alpro_tpu.ops.pallas_attn import fused_attention

        return fused_attention(q, k, v, key_mask=key_mask, scale=scale)

    return _xla_attention(
        q, k, v,
        key_mask=key_mask,
        scale=scale,
        dropout_rate=dropout_rate,
        dropout_rng=dropout_rng,
        deterministic=deterministic,
    )


def _xla_attention(
    q, k, v, *, key_mask, scale, dropout_rate, dropout_rng, deterministic
):
    dtype = q.dtype
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale
    if key_mask is not None:
        # additive mask in fp32: -10000 on padded keys, matching the HF-BERT
        # extended-mask constant so converted checkpoints reproduce numerics
        bias = (1.0 - key_mask.astype(jnp.float32)) * -10000.0
        scores = scores + bias[:, None, None, :]
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    probs = probs.astype(dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32).astype(dtype)


def multi_head_attention_bshd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    key_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    impl: str = "auto",
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jnp.ndarray:
    """Attention with q/k/v in (B, S, H, D) — the natural layout after the
    fused qkv projection. Skips the (B, H, S, D) transpose on the XLA path:
    profiling shows those head-split transposes of the ~100 MB qkv tensors
    cost ~20 ms/step on the full model (pure HBM copies). The Pallas path
    still transposes (its kernel grid is per-(batch, head))."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    use_dropout = dropout_rate > 0.0 and not deterministic
    if impl == "auto":
        impl = (
            "pallas"
            if (_on_tpu() and q.shape[1] >= 64 and not use_dropout)
            else "xla"
        )
    if impl == "pallas":
        from alpro_tpu.ops.pallas_attn import fused_attention

        out = fused_attention(
            jnp.moveaxis(q, 1, 2), jnp.moveaxis(k, 1, 2),
            jnp.moveaxis(v, 1, 2), key_mask=key_mask, scale=scale,
        )
        return jnp.moveaxis(out, 1, 2)

    dtype = q.dtype
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale
    if key_mask is not None:
        bias = (1.0 - key_mask.astype(jnp.float32)) * -10000.0
        scores = scores + bias[:, None, None, :]
    probs = jax.nn.softmax(scores, axis=-1)
    if use_dropout:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    probs = probs.astype(dtype)
    return jnp.einsum(
        "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
    ).astype(dtype)
