"""Multi-head attention core shared by the TimeSformer and BERT encoders.

Two implementations behind one API:
  * ``xla``    — einsum → softmax → einsum; XLA fuses the elementwise chain.
  * ``pallas`` — a fused single-pass kernel (see `alpro_tpu/ops/pallas_attn.py`)
                 that keeps the (S_q, S_k) score matrix in VMEM, avoiding the
                 HBM round-trip of the attention probabilities.

``auto`` resolves to ``xla``: measured on v5e at ALPRO shapes (docs/PERF.md
round 2), XLA's lowering edges out both Pallas kernels (standalone spatial
qkv→out: xla 2.61 ms vs bshd-pallas 2.99 ms; in-model round 1: 137.4 vs
138.0 ms), and the per-block kernel instances inflate the HLO payload past
this sandbox's remote-compile limit. The kernels remain tested opt-ins via
``impl='pallas'``.

When compute runs in bf16, the materialized score buffer is stored in bf16
(softmax math still fp32 in-register) — halving the largest intermediate's
HBM traffic, and matching the reference's apex-fp16 behaviour, which holds
fp16 scores (`run_video_retrieval.py:329-331` amp O2). fp32 compute keeps
fp32 scores, so checkpoint-parity tests are bit-identical.

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
        impl = "xla"  # measured faster than the pallas kernels (module docstring)

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
    if dtype == jnp.bfloat16:
        # bf16 path: fold the scale into q (one cheap pass over the (B,S,H,D)
        # tensor instead of over the tile-padded (S_q, S_k) score buffer) and
        # have the dot emit bf16 directly — the MXU still accumulates fp32
        # in-register, so this is near-identical to the previous
        # dot→fp32→astype(bf16) rounding (the q*scale product adds one extra
        # bf16 quantization of q; covered by atol=0.08 vs the fp32 path)
        # while avoiding the fp32 score materialization + repack copies XLA
        # otherwise inserts (profiled: docs/PERF.md round 2).
        q = (q * jnp.asarray(scale, jnp.float32)).astype(dtype)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.bfloat16
        )
        if key_mask is not None:
            bias = (1.0 - key_mask.astype(jnp.float32)) * -10000.0
            scores = scores + bias[:, None, None, :].astype(jnp.bfloat16)
    else:
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        scores = scores * scale
        if key_mask is not None:
            # additive mask in fp32: -10000 on padded keys, matching the
            # HF-BERT extended-mask constant so converted checkpoints
            # reproduce numerics
            bias = (1.0 - key_mask.astype(jnp.float32)) * -10000.0
            scores = scores + bias[:, None, None, :]
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
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
        impl = "xla"  # measured faster than the pallas kernels (module docstring)
    if impl == "pallas":
        from alpro_tpu.ops.pallas_attn import fused_attention_bshd

        B, Sq, H, hd = q.shape
        Sk = k.shape[1]
        # flat-channel reshapes are free (no data movement); the kernel
        # slices each head's hd window via its BlockSpec index map, so the
        # (B,S,H,hd)→(B,H,S,hd) transposes never materialize
        out = fused_attention_bshd(
            q.reshape(B, Sq, H * hd), k.reshape(B, Sk, H * hd),
            v.reshape(B, Sk, H * hd), H, key_mask=key_mask, scale=scale,
        )
        return out.reshape(B, Sq, H, hd)

    dtype = q.dtype
    if dtype == jnp.bfloat16:
        # bf16 score buffer straight out of the dot + scale folded into q —
        # see _xla_attention for the rationale (fp32 MXU accumulation, no
        # fp32 score materialization or repack copies)
        q = (q * jnp.asarray(scale, jnp.float32)).astype(dtype)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.bfloat16
        )
        if key_mask is not None:
            bias = (1.0 - key_mask.astype(jnp.float32)) * -10000.0
            scores = scores + bias[:, None, None, :].astype(jnp.bfloat16)
    else:
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        scores = scores * scale
        if key_mask is not None:
            bias = (1.0 - key_mask.astype(jnp.float32)) * -10000.0
            scores = scores + bias[:, None, None, :]
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    if use_dropout:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    probs = probs.astype(dtype)
    return jnp.einsum(
        "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
    ).astype(dtype)
