"""Roll-based temporal attention kernel — divided-ST's frame-axis attention
without relayouts or score matrices.

The temporal attention attends over T ≤ 16 frames independently at every
patch location. XLA lowers it as (B·N, H) batches of tiny (T, hd)×(hd, T)
matmuls, paying ~12 ms/step of (B, T, N, D) ⇄ (B·N, T, D) relayout copies
plus score/softmax fusions (docs/PERF.md profile). This kernel works in the
model's native (B, T, N, 3D) layout using a circulant decomposition:

    band_δ[t] = Σ_d q[t]·k[(t+δ) mod T]          (δ = 0..T−1, via pltpu.roll)

For fixed t, {(t+δ) mod T} covers every key exactly once, so softmax over t'
≡ softmax over δ — elementwise across the whole (T, G) tile, no (T, T)
matrix ever built. The PV product is the same T-term roll-accumulate:

    out[t] = Σ_δ softmax_δ(band)[t] · v[(t+δ) mod T]

Everything is VPU elementwise/reduce work on (T, G, hd) tiles; the qkv and
output projections stay in XLA where they are already MXU-optimal.

Differentiable via custom_vjp (XLA-recompute backward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None


def _roll_up(x, delta):
    """x[(t+delta) % T] along axis 0 — slice+concat on the untiled frame axis
    (this toolchain's Mosaic rejects pltpu.roll and rank-reducing reduces,
    so the kernel keeps everything rank-3 with keepdims)."""
    if delta == 0:
        return x
    return jnp.concatenate([x[delta:], x[:delta]], axis=0)


def _kernel(qkv_ref, o_ref, *, num_heads: int, T: int, scale: float):
    qkv = qkv_ref[0]  # (T, G, 3D)
    D = o_ref.shape[-1]
    hd = D // num_heads
    outs = []
    for h in range(num_heads):
        q = qkv[:, :, h * hd : (h + 1) * hd].astype(jnp.float32) * scale
        k = qkv[:, :, D + h * hd : D + (h + 1) * hd].astype(jnp.float32)
        v = qkv[:, :, 2 * D + h * hd : 2 * D + (h + 1) * hd].astype(jnp.float32)
        # bands: band_δ[t, g] = Σ_d q[t, g, d] · k[(t+δ)%T, g, d]; softmax
        # over t' ≡ softmax over δ, all elementwise on (T, G, 1) tiles
        bands = [
            jnp.sum(q * _roll_up(k, delta), axis=-1, keepdims=True)
            for delta in range(T)
        ]  # each (T, G, 1)
        m = bands[0]
        for b in bands[1:]:
            m = jnp.maximum(m, b)
        exps = [jnp.exp(b - m) for b in bands]
        denom = exps[0]
        for e in exps[1:]:
            denom = denom + e
        o = exps[0] * v
        for delta in range(1, T):
            o = o + exps[delta] * _roll_up(v, delta)
        outs.append(o / denom)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fwd_impl(qkv, num_heads):
    """qkv: (B, T, N, 3D) with [q; k; v] channel chunks in (h, hd) head order.
    Returns (B, T, N, D) attention outputs (pre-projection)."""
    B, T, N, threeD = qkv.shape
    D = threeD // 3
    hd = D // num_heads
    scale = hd ** -0.5
    G = 128
    n_pad = _round_up(N, G)
    qkvp = jnp.pad(qkv, ((0, 0), (0, 0), (0, n_pad - N), (0, 0)))

    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, T=T, scale=float(scale)),
        out_shape=jax.ShapeDtypeStruct((B, T, n_pad, D), qkv.dtype),
        grid=(B, n_pad // G),
        in_specs=[
            pl.BlockSpec(
                (1, T, G, threeD), lambda b, n: (b, 0, n, 0),
                memory_space=_VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, T, G, D), lambda b, n: (b, 0, n, 0), memory_space=_VMEM,
        ),
        interpret=interpret,
    )(qkvp)
    return out[:, :, :N, :]


def _xla_reference(qkv, num_heads):
    B, T, N, threeD = qkv.shape
    D = threeD // 3
    hd = D // num_heads
    q = qkv[..., :D].reshape(B, T, N, num_heads, hd)
    k = qkv[..., D : 2 * D].reshape(B, T, N, num_heads, hd)
    v = qkv[..., 2 * D :].reshape(B, T, N, num_heads, hd)
    s = jnp.einsum("btnhd,bsnhd->bnhts", q, k,
                   preferred_element_type=jnp.float32) * (hd ** -0.5)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bnhts,bsnhd->btnhd", p, v.astype(jnp.float32))
    return o.reshape(B, T, N, D).astype(qkv.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def temporal_attention_roll(qkv, num_heads):
    return _fwd_impl(qkv, num_heads)


def _fwd(qkv, num_heads):
    return _fwd_impl(qkv, num_heads), (qkv,)


def _bwd(num_heads, res, g):
    (qkv,) = res
    _, vjp = jax.vjp(lambda x: _xla_reference(x, num_heads), qkv)
    (dqkv,) = vjp(g.astype(qkv.dtype))
    return (dqkv,)


temporal_attention_roll.defvjp(_fwd, _bwd)


def temporal_attention_packed(
    qkv: jnp.ndarray, num_heads: int, pack: int = 16
) -> jnp.ndarray:
    """MXU-packed temporal attention in pure XLA.

    The naive lowering runs B·N·H ≈ 37k tiny (T, hd)×(hd, T) dots — each uses
    <1% of the 128×128 MXU, so the op is overhead-bound (3.65 ms measured at
    flagship shapes for 0.6 GFLOP of math). Packing `pack` patch locations
    per tile turns them into (pack·T=128, hd)×(hd, 128) matmuls — full MXU
    width — with a static block-diagonal mask confining each location's
    softmax to its own (T, T) block. 16× fewer batched dots, each 16× bigger;
    the wasted off-diagonal FLOPs are free (the MXU was idle anyway).

    qkv: (B, T, N, 3D) with [q; k; v] channel chunks in (head, hd) order.
    Returns (B, T, N, D). Natively differentiable.
    """
    B, T, N, threeD = qkv.shape
    D = threeD // 3
    H = num_heads
    hd = D // H
    scale = hd ** -0.5
    G = -(-N // pack)  # ceil
    Np = G * pack

    x = jnp.pad(qkv, ((0, 0), (0, 0), (0, Np - N), (0, 0)))
    x = x.reshape(B, T, G, pack, 3, H, hd)
    x = x.transpose(4, 0, 2, 5, 3, 1, 6)  # (3, B, G, H, pack, T, hd)
    q = x[0].reshape(B, G, H, pack * T, hd)
    k = x[1].reshape(B, G, H, pack * T, hd)
    v = x[2].reshape(B, G, H, pack * T, hd)

    s = jnp.einsum(
        "bghik,bghjk->bghij", q, k, preferred_element_type=jnp.float32
    ) * scale
    blk = jnp.arange(pack * T) // T
    neg = jnp.where(blk[:, None] == blk[None, :], 0.0, -jnp.inf).astype(jnp.float32)
    p = jax.nn.softmax(s + neg, axis=-1).astype(qkv.dtype)
    o = jnp.einsum(
        "bghij,bghjd->bghid", p, v, preferred_element_type=jnp.float32
    ).astype(qkv.dtype)
    o = o.reshape(B, G, H, pack, T, hd)
    o = o.transpose(0, 4, 1, 3, 2, 5).reshape(B, T, Np, D)
    return o[:, :, :N, :]


def temporal_attention_circulant(qkv: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Circulant temporal attention in pure XLA — the same δ-roll softmax
    identity as the Pallas kernel, expressed with jnp.roll on the frame axis.

    Every op is elementwise over contiguous (B, T, N, H, hd) tensors: no
    (B·N, T, D) relayout, no (T, T) score matrix, no batched tiny matmuls —
    the three things that make XLA's einsum lowering of this attention cost
    ~23 ms at flagship shapes. Natively differentiable.
    """
    B, T, N, threeD = qkv.shape
    D = threeD // 3
    hd = D // num_heads
    scale = hd ** -0.5
    q = qkv[..., :D].reshape(B, T, N, num_heads, hd).astype(jnp.float32) * scale
    k = qkv[..., D : 2 * D].reshape(B, T, N, num_heads, hd).astype(jnp.float32)
    v = qkv[..., 2 * D :].reshape(B, T, N, num_heads, hd).astype(jnp.float32)

    # band_δ[t] = Σ_d q[t]·k[(t+δ) % T]; softmax over t' ≡ softmax over δ
    bands = jnp.stack(
        [jnp.sum(q * jnp.roll(k, -d, axis=1), axis=-1) for d in range(T)]
    )  # (T_δ, B, T, N, H)
    m = jnp.max(bands, axis=0, keepdims=True)
    e = jnp.exp(bands - m)
    denom = jnp.sum(e, axis=0)  # (B, T, N, H)
    out = e[0][..., None] * v
    for d in range(1, T):
        out = out + e[d][..., None] * jnp.roll(v, -d, axis=1)
    out = out / denom[..., None]
    return out.reshape(B, T, N, D).astype(qkv.dtype)
