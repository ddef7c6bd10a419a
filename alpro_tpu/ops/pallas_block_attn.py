"""Fully fused attention block: qkv projection → attention → output projection
in one Pallas kernel.

Profiling the full TimeSformer step (docs/PERF.md) shows XLA spending
~50 ms/step on the spatial attention's HBM traffic: the (B·T, S, 3D) qkv
tensor (~116 MB) is written + relaid-out, and the fp32 (S, S) score tensor
(~238 MB/block) round-trips twice. This kernel keeps everything on-chip:

  per grid program (one frame row of the batch):
    x: (S_pad, D) in VMEM
    for each head h (static unroll):
        q = x @ Wq[h]; k = x @ Wk[h]; v = x @ Wv[h]      # MXU, no reshapes
        s = q @ kᵀ · scale + key_bias                     # fp32 in VMEM
        o_h = softmax(s) @ v
        acc += o_h @ Wproj[h]
    out = acc + b_proj

Weights are passed pre-split per head — (H, D, hd) / (H, hd, D) — so the
kernel indexes them on the leading dim (no lane slicing, which this
toolchain's Mosaic rejects). Their index_map is constant, so the pipeline
keeps them VMEM-resident across programs instead of re-fetching per program.

HBM traffic per call ≈ read x + write out (~77 MB for the 128×197×768
spatial attention) vs XLA's ~500 MB.

Differentiable via custom_vjp with an XLA-recompute backward.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

_NEG_INF = -1e9


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(x_ref, wq_ref, wk_ref, wv_ref, bqkv_ref, wp_ref, bp_ref,
            kbias_ref, o_ref, *, num_heads: int, scale: float):
    x = x_ref[0]  # (S_pad, D)
    S = x.shape[0]
    D = o_ref.shape[-1]
    acc = jnp.zeros((S, D), jnp.float32)
    kb = kbias_ref[0]  # (1, S_pad) additive fp32, broadcasts over query rows
    for h in range(num_heads):
        q = jnp.dot(x, wq_ref[h], preferred_element_type=jnp.float32)
        k = jnp.dot(x, wk_ref[h], preferred_element_type=jnp.float32)
        v = jnp.dot(x, wv_ref[h], preferred_element_type=jnp.float32)
        q = q + bqkv_ref[0, h][None, :]
        k = k + bqkv_ref[1, h][None, :]
        v = v + bqkv_ref[2, h][None, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale + kb
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(
            p.astype(x.dtype), v.astype(x.dtype),
            preferred_element_type=jnp.float32,
        ) / l
        acc = acc + jnp.dot(
            o.astype(x.dtype), wp_ref[h], preferred_element_type=jnp.float32
        )
    o_ref[0] = (acc + bp_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _split_weights(qkv_kernel, qkv_bias, proj_kernel, num_heads):
    D = qkv_kernel.shape[0]
    hd = D // num_heads
    w = qkv_kernel.reshape(D, 3, num_heads, hd)
    wq = jnp.moveaxis(w[:, 0], 1, 0)  # (H, D, hd)
    wk = jnp.moveaxis(w[:, 1], 1, 0)
    wv = jnp.moveaxis(w[:, 2], 1, 0)
    bqkv = qkv_bias.reshape(3, num_heads, hd)
    wp = proj_kernel.reshape(num_heads, hd, D)
    return wq, wk, wv, bqkv, wp


def _fwd_impl(x, qkv_kernel, qkv_bias, proj_kernel, proj_bias, num_heads,
              key_mask):
    B, S, D = x.shape
    hd = D // num_heads
    scale = hd ** -0.5
    s_pad = _round_up(S, 128)

    xp = jnp.pad(x, ((0, 0), (0, s_pad - S), (0, 0)))
    if key_mask is None:
        kbias = jnp.full((1, s_pad), 0.0, jnp.float32)
        kbias = kbias.at[:, S:].set(_NEG_INF)
        kbias = jnp.broadcast_to(kbias, (B, s_pad))[:, None, :]
    else:
        kb = (1.0 - key_mask.astype(jnp.float32)) * -10000.0
        kb = jnp.pad(kb, ((0, 0), (0, s_pad - S)), constant_values=_NEG_INF)
        kbias = kb[:, None, :]

    wq, wk, wv, bqkv, wp = _split_weights(
        qkv_kernel.astype(x.dtype), qkv_bias.astype(jnp.float32),
        proj_kernel.astype(x.dtype), num_heads,
    )
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, scale=float(scale)),
        out_shape=jax.ShapeDtypeStruct((B, s_pad, D), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, s_pad, D), lambda i: (i, 0, 0), memory_space=_VMEM),
            pl.BlockSpec(memory_space=_VMEM),  # wq — constant: stays resident
            pl.BlockSpec(memory_space=_VMEM),
            pl.BlockSpec(memory_space=_VMEM),
            pl.BlockSpec(memory_space=_VMEM),
            pl.BlockSpec(memory_space=_VMEM),
            pl.BlockSpec(memory_space=_VMEM),
            pl.BlockSpec((1, 1, s_pad), lambda i: (i, 0, 0), memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, s_pad, D), lambda i: (i, 0, 0), memory_space=_VMEM
        ),
        interpret=interpret,
    )(
        xp, wq, wk, wv, bqkv, wp,
        proj_bias.reshape(1, D).astype(jnp.float32), kbias,
    )
    return out[:, :S, :]


def _xla_reference(x, qkv_kernel, qkv_bias, proj_kernel, proj_bias, num_heads,
                   key_mask):
    B, S, D = x.shape
    hd = D // num_heads
    qkv = (x @ qkv_kernel.astype(x.dtype)) + qkv_bias.astype(x.dtype)
    qkv = qkv.reshape(B, S, 3, num_heads, hd)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", qkv[:, :, 0], qkv[:, :, 1],
        preferred_element_type=jnp.float32,
    ) * (hd ** -0.5)
    if key_mask is not None:
        scores = scores + ((1.0 - key_mask.astype(jnp.float32)) * -10000.0)[:, None, None, :]
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs, qkv[:, :, 2],
        preferred_element_type=jnp.float32,
    ).astype(x.dtype).reshape(B, S, D)
    return out @ proj_kernel.astype(x.dtype) + proj_bias.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_attention_block(x, qkv_kernel, qkv_bias, proj_kernel, proj_bias,
                          num_heads, key_mask=None):
    """x: (B, S, D); qkv_kernel: (D, 3D) with [q;k;v] column chunks and
    (..., H, hd) head order (the VitAttention/checkpoint layout);
    proj_kernel: (D, D); key_mask: optional (B, S). Returns (B, S, D):
    proj(attention(qkv(x))) — the whole attention sublayer, pre-residual."""
    return _fwd_impl(x, qkv_kernel, qkv_bias, proj_kernel, proj_bias,
                     num_heads, key_mask)


def _fwd(x, qkv_kernel, qkv_bias, proj_kernel, proj_bias, num_heads, key_mask):
    out = _fwd_impl(x, qkv_kernel, qkv_bias, proj_kernel, proj_bias,
                    num_heads, key_mask)
    return out, (x, qkv_kernel, qkv_bias, proj_kernel, proj_bias, key_mask)


def _bwd(num_heads, res, g):
    x, qkv_kernel, qkv_bias, proj_kernel, proj_bias, key_mask = res

    def f(x, qkv_kernel, qkv_bias, proj_kernel, proj_bias):
        return _xla_reference(
            x, qkv_kernel, qkv_bias, proj_kernel, proj_bias, num_heads, key_mask
        )

    _, vjp = jax.vjp(f, x, qkv_kernel, qkv_bias, proj_kernel, proj_bias)
    dx, dqk, dqb, dpk, dpb = vjp(g)
    return dx, dqk, dqb, dpk, dpb, None


fused_attention_block.defvjp(_fwd, _bwd)
