"""Fused attention Pallas kernel for the short-sequence attentions in ALPRO.

ALPRO's sequence lengths are bounded by design (SURVEY.md §5: video tokens
1+196, text ≤ 50, fusion ≤ ~247), so the whole (S_q, S_k) score matrix of one
(batch, head) program fits comfortably in VMEM. The kernel computes
QKᵀ → bias → softmax → PV in a single pass with fp32 accumulation, so the
attention probabilities never round-trip through HBM (the XLA path materialises
them between the two matmuls unless fusion kicks in).

Differentiable via custom_vjp: forward runs the Pallas kernel, backward
recomputes the probabilities with plain XLA einsums (flash-style recompute —
no residual attention matrix is stored between fwd and bwd).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds; keep importable on CPU for tests
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

_NEG_INF = -1e9


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)  # (Sq, D)
    k = k_ref[0].astype(jnp.float32)  # (Sk, D)
    v = v_ref[0]                      # (Sk, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale + bias_ref[0]  # bias block (1, 1, Sk) broadcasts over rows
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ) / l
    o_ref[0] = o.astype(o_ref.dtype)


def _fused_attention_fwd_impl(q, k, v, bias, scale):
    """q: (B, H, Sq, D); k,v: (B, H, Sk, D); bias: (B, Sk) additive fp32."""
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    sq_pad = _round_up(Sq, 128)
    sk_pad = _round_up(Sk, 128)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - Sq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, sk_pad - Sk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, sk_pad - Sk), (0, 0)))
    biasp = jnp.pad(
        bias.astype(jnp.float32), ((0, 0), (0, sk_pad - Sk)),
        constant_values=_NEG_INF,
    )[:, None, :]  # (B, 1, sk_pad): block dims equal array dims (TPU tiling)

    qp = qp.reshape(B * H, sq_pad, D)
    kp = kp.reshape(B * H, sk_pad, D)
    vp = vp.reshape(B * H, sk_pad, D)

    grid = (B * H,)
    # interpret mode lets the same kernel run (slowly) on CPU for tests
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B * H, sq_pad, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, sq_pad, D), lambda i: (i, 0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, sk_pad, D), lambda i: (i, 0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, sk_pad, D), lambda i: (i, 0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, 1, sk_pad), lambda i: (i // H, 0, 0), memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, sq_pad, D), lambda i: (i, 0, 0), memory_space=_VMEM
        ),
        interpret=interpret,
    )(qp, kp, vp, biasp)
    return out.reshape(B, H, sq_pad, D)[:, :, :Sq, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_attention(q, k, v, bias, scale):
    return _fused_attention_fwd_impl(q, k, v, bias, scale)


def _fused_attention_fwd(q, k, v, bias, scale):
    out = _fused_attention_fwd_impl(q, k, v, bias, scale)
    return out, (q, k, v, bias)


def _fused_attention_bwd(scale, res, g):
    q, k, v, bias = res
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * scale
    s = s + bias.astype(jnp.float32)[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, gf)
    dp = jnp.einsum("bhqd,bhkd->bhqk", gf, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kf) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qf) * scale
    return (
        dq.astype(q.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
        jnp.zeros_like(bias),
    )


_fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    key_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Fused softmax attention. Shapes as `multi_head_attention`."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    B, _, _, _ = q.shape
    Sk = k.shape[2]
    if key_mask is None:
        bias = jnp.zeros((B, Sk), dtype=jnp.float32)
    else:
        # matches the XLA path's HF-style -10000 additive constant
        bias = (1.0 - key_mask.astype(jnp.float32)) * -10000.0
    return _fused_attention(q, k, v, bias, float(scale))


# ---------------------------------------------------------------------------
# bshd-native variant: consumes q/k/v in the (B, S, H·hd) layout the fused
# qkv projection produces, slicing each head's hd-channel window via the
# BlockSpec index map — the (B, S, H, hd) → (B, H, S, hd) head-split
# transposes (pure HBM copies, ~2.8 ms/block at flagship shapes) never exist.
# ---------------------------------------------------------------------------
def _attn_kernel_heads(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float,
                       hd: int, n_heads: int):
    """Blocks carry n_heads·hd = 128 channels (Mosaic's lane-block minimum);
    heads are separated by in-kernel lane slices, which Mosaic supports."""
    bias = bias_ref[0]  # (1, Sk)
    for i in range(n_heads):
        q = q_ref[0, :, i * hd : (i + 1) * hd].astype(jnp.float32)
        k = k_ref[0, :, i * hd : (i + 1) * hd].astype(jnp.float32)
        v = v_ref[0, :, i * hd : (i + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * scale + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32) / l
        o_ref[0, :, i * hd : (i + 1) * hd] = o.astype(o_ref.dtype)


def _fused_attention_bshd_fwd_impl(q, k, v, bias, scale, num_heads):
    """q: (B, Sq, D), k/v: (B, Sk, D) with D = H·hd; bias: (B, Sk) fp32.

    Grid is (B, head-pairs): Mosaic requires 128-multiple lane blocks, so
    each program owns 128 channels (= 128//hd heads) and lane-slices the
    individual heads in VMEM."""
    B, Sq, D = q.shape
    Sk = k.shape[1]
    hd = D // num_heads
    interpret = jax.default_backend() != "tpu"
    # Mosaic requires 128-multiple lane blocks; interpret mode (CPU tests)
    # has no such constraint, so exercise the per-head path there
    lane = 128 if not interpret else hd
    hpb = lane // hd  # heads per channel block
    n_blocks = num_heads // hpb
    sq_pad = _round_up(Sq, 128)
    sk_pad = _round_up(Sk, 128)
    qp = jnp.pad(q, ((0, 0), (0, sq_pad - Sq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, sk_pad - Sk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, sk_pad - Sk), (0, 0)))
    biasp = jnp.pad(
        bias.astype(jnp.float32), ((0, 0), (0, sk_pad - Sk)),
        constant_values=_NEG_INF,
    )[:, None, :]

    out = pl.pallas_call(
        functools.partial(
            _attn_kernel_heads, scale=scale, hd=hd, n_heads=hpb
        ),
        out_shape=jax.ShapeDtypeStruct((B, sq_pad, D), q.dtype),
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((1, sq_pad, lane), lambda b, h: (b, 0, h), memory_space=_VMEM),
            pl.BlockSpec((1, sk_pad, lane), lambda b, h: (b, 0, h), memory_space=_VMEM),
            pl.BlockSpec((1, sk_pad, lane), lambda b, h: (b, 0, h), memory_space=_VMEM),
            pl.BlockSpec((1, 1, sk_pad), lambda b, h: (b, 0, 0), memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, sq_pad, lane), lambda b, h: (b, 0, h), memory_space=_VMEM
        ),
        interpret=interpret,
    )(qp, kp, vp, biasp)
    return out[:, :Sq, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused_attention_bshd(q, k, v, bias, scale, num_heads):
    return _fused_attention_bshd_fwd_impl(q, k, v, bias, scale, num_heads)


def _fab_fwd(q, k, v, bias, scale, num_heads):
    return _fused_attention_bshd_fwd_impl(q, k, v, bias, scale, num_heads), (q, k, v, bias)


def _fab_bwd(scale, num_heads, res, g):
    q, k, v, bias = res
    B, Sq, D = q.shape
    Sk = k.shape[1]
    hd = D // num_heads
    qf = q.astype(jnp.float32).reshape(B, Sq, num_heads, hd)
    kf = k.astype(jnp.float32).reshape(B, Sk, num_heads, hd)
    vf = v.astype(jnp.float32).reshape(B, Sk, num_heads, hd)
    gf = g.astype(jnp.float32).reshape(B, Sq, num_heads, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", qf, kf) * scale
    s = s + bias.astype(jnp.float32)[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, gf)
    dp = jnp.einsum("bqhd,bkhd->bhqk", gf, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, kf) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, qf) * scale
    return (
        dq.reshape(B, Sq, D).astype(q.dtype),
        dk.reshape(B, Sk, D).astype(k.dtype),
        dv.reshape(B, Sk, D).astype(v.dtype),
        jnp.zeros_like(bias),
    )


_fused_attention_bshd.defvjp(_fab_fwd, _fab_bwd)


def fused_attention_bshd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    *,
    key_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Fused attention over flat-channel (B, S, H·hd) q/k/v — no head-split
    transposes on either side. Returns (B, Sq, H·hd)."""
    hd = q.shape[-1] // num_heads
    if scale is None:
        scale = hd ** -0.5
    B, Sq, D = q.shape
    Sk = k.shape[1]
    if jax.default_backend() == "tpu" and (D % 128 != 0 or 128 % hd != 0):
        # lane blocks must be 128-multiples: transpose fallback for odd dims
        out = fused_attention(
            jnp.moveaxis(q.reshape(B, Sq, num_heads, hd), 1, 2),
            jnp.moveaxis(k.reshape(B, Sk, num_heads, hd), 1, 2),
            jnp.moveaxis(v.reshape(B, Sk, num_heads, hd), 1, 2),
            key_mask=key_mask, scale=scale,
        )
        return jnp.moveaxis(out, 1, 2).reshape(B, Sq, D)
    if key_mask is None:
        bias = jnp.zeros((B, Sk), dtype=jnp.float32)
    else:
        bias = (1.0 - key_mask.astype(jnp.float32)) * -10000.0
    return _fused_attention_bshd(q, k, v, bias, float(scale), num_heads)
