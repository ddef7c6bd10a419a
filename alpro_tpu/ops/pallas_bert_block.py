"""Fused post-LN BERT layer kernels: the masked attention chain and the MLP
chain, each in one Pallas kernel.

The BERT text/fusion encoder (models/bert.py, replacing the reference's
`/root/reference/src/modeling/xbert.py:216-346,549-559`) is post-LN:

  x = LN(x + proj(masked_attn(q(x), k(x), v(x))))      # attention chain
  x = LN(x + fc2(gelu(fc1(x))))                         # MLP chain

Per layer XLA materializes q/k/v, the (S, S) probs, the attention output,
the proj output, and the (S, 4D) GELU hidden in HBM, with the two LNs on
the slow convert+reduce population (docs/PERF.md roofline). These kernels
keep each chain in VMEM: per grid cell the attention kernel computes the
three head-window projections from the resident x tile, applies the
additive HF mask constant ((1−mask)·−10000, `xbert.py:878-938` semantics),
runs softmax·V and the output-projection partial, accumulates across head
windows in fp32 scratch, then adds the residual and applies the closing
LayerNorm before the single output write. The MLP kernel is the post-LN
variant of ops/pallas_ln_mlp.py.

Head windows are 128 lanes (2 heads at hd=64) with the head axis innermost
in the grid — same Mosaic-safe structure as pallas_fused_block.py.
Differentiable via custom_vjp with XLA-recompute backward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from alpro_tpu.ops.kernel_math import gelu_exact_f32 as _gelu_exact_f32
from alpro_tpu.ops.kernel_math import ln_rows_f32

try:  # pltpu only resolves on TPU builds; keep importable on CPU for tests
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

_LANE = 128
# attention-chain head-window width. 384 (the packed-qkv spatial kernel's
# winner) was measured WORSE here (retrieval p50 28.9 → 32.5 ms): BERT's
# short sequences make per-program compute, not DMA run length, the
# constraint. 128 stands.
_ATTN_LANE = 128
_TM = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_ln_rows_f32 = ln_rows_f32


# ---------------------------------------------------------------------------
# attention chain: LN(x + proj(masked_attn(qkv(x))))
# ---------------------------------------------------------------------------
def _bert_attn_kernel(
    x_ref, mb_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
    wp_ref, bp_ref, s_ref, b_ref, o_ref, acc_ref,
    *, eps: float, scale: float, hd: int, hpb: int, nh_windows: int,
):
    h = pl.program_id(1)
    x = x_ref[0]  # (S, D)
    xc = x.astype(wq_ref.dtype)
    mrow = mb_ref[0].astype(jnp.float32)  # (1, S) additive bias
    qh = jax.lax.dot_general(
        xc, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bq_ref[...].astype(jnp.float32)
    kh = jax.lax.dot_general(
        xc, wk_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bk_ref[...].astype(jnp.float32)
    vh = jax.lax.dot_general(
        xc, wv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bv_ref[...].astype(jnp.float32)
    parts = []
    for i in range(hpb):
        sl = slice(i * hd, (i + 1) * hd)
        # bf16 operands into the MXU (fp32 operands run at a fraction of the
        # bf16 rate); fp32 accumulation, scale applied to fp32 scores
        q = qh[:, sl].astype(xc.dtype)
        k = kh[:, sl].astype(xc.dtype)
        v = vh[:, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        s = s + mrow  # broadcast over query rows
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(xc.dtype), v.astype(xc.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        parts.append(o / l)
    opart = jnp.concatenate(parts, axis=-1)
    contrib = jax.lax.dot_general(
        opart.astype(wp_ref.dtype), wp_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )

    @pl.when(h == 0)
    def _init():
        acc_ref[...] = contrib

    @pl.when(h > 0)
    def _accum():
        acc_ref[...] += contrib

    @pl.when(h == nh_windows - 1)
    def _emit():
        y = acc_ref[...] + bp_ref[...].astype(jnp.float32) + x.astype(
            jnp.float32
        )
        o_ref[0] = _ln_rows_f32(y, s_ref[...], b_ref[...], eps).astype(
            o_ref.dtype
        )


def _bert_attn_fwd_impl(
    x, mask_bias, wq, bq, wk, bk, wv, bv, wproj, bproj, ln_s, ln_b,
    eps, attn_scale, num_heads,
):
    M, S, D = x.shape
    hd = D // num_heads
    interpret = jax.default_backend() != "tpu"
    win = _ATTN_LANE if not interpret else D
    if D % win != 0 or win % hd != 0:
        win = _LANE
    if D % win != 0 or win % hd != 0:
        # a truncated grid would silently skip the trailing D % win lanes
        raise ValueError(
            f"fused BERT attention needs D divisible by a lane window that "
            f"is a head-dim multiple; got D={D}, head_dim={hd}, window={win}"
        )
    hpb = win // hd
    nw = D // win

    wspec = pl.BlockSpec((D, win), lambda m, h: (0, h), memory_space=_VMEM)
    bspec = pl.BlockSpec((1, win), lambda m, h: (0, h), memory_space=_VMEM)
    full = pl.BlockSpec((1, D), lambda m, h: (0, 0), memory_space=_VMEM)
    out = pl.pallas_call(
        functools.partial(
            _bert_attn_kernel, eps=float(eps), scale=float(attn_scale),
            hd=hd, hpb=hpb, nh_windows=nw,
        ),
        out_shape=jax.ShapeDtypeStruct((M, S, D), x.dtype),
        grid=(M, nw),
        in_specs=[
            pl.BlockSpec((1, S, D), lambda m, h: (m, 0, 0), memory_space=_VMEM),
            # (M, 1, S) with a singleton middle dim: a (1, S) block of a
            # (M, S) array is an illegal tile (first of the last two block
            # dims must divide 8 or equal the array dim)
            pl.BlockSpec((1, 1, S), lambda m, h: (m, 0, 0), memory_space=_VMEM),
            wspec, bspec, wspec, bspec, wspec, bspec,
            pl.BlockSpec((win, D), lambda m, h: (h, 0), memory_space=_VMEM),
            full, full, full,
        ],
        out_specs=pl.BlockSpec(
            (1, S, D), lambda m, h: (m, 0, 0), memory_space=_VMEM
        ),
        scratch_shapes=(
            [pltpu.VMEM((S, D), jnp.float32)] if pltpu is not None else []
        ),
        interpret=interpret,
    )(
        x, mask_bias[:, None, :], wq, bq[None, :], wk, bk[None, :],
        wv, bv[None, :], wproj, bproj[None, :], ln_s[None, :], ln_b[None, :],
    )
    return out


def _bert_attn_xla_reference(
    x, mask_bias, wq, bq, wk, bk, wv, bv, wproj, bproj, ln_s, ln_b,
    eps, attn_scale, num_heads,
):
    M, S, D = x.shape
    hd = D // num_heads
    xc = x.astype(wq.dtype)
    q = (
        jnp.einsum("msd,df->msf", xc, wq, preferred_element_type=jnp.float32)
        + bq.astype(jnp.float32)
    ).reshape(M, S, num_heads, hd) * attn_scale
    k = (
        jnp.einsum("msd,df->msf", xc, wk, preferred_element_type=jnp.float32)
        + bk.astype(jnp.float32)
    ).reshape(M, S, num_heads, hd)
    v = (
        jnp.einsum("msd,df->msf", xc, wv, preferred_element_type=jnp.float32)
        + bv.astype(jnp.float32)
    ).reshape(M, S, num_heads, hd)
    s = jnp.einsum("mqhd,mkhd->mhqk", q, k) + mask_bias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("mhqk,mkhd->mqhd", p, v).reshape(M, S, D)
    y = (
        jnp.einsum(
            "msd,df->msf", o.astype(wproj.dtype), wproj,
            preferred_element_type=jnp.float32,
        )
        + bproj.astype(jnp.float32)
        + x.astype(jnp.float32)
    )
    out = _ln_rows_f32(y, ln_s, ln_b, eps)
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14))
def _bert_attn(x, mask_bias, wq, bq, wk, bk, wv, bv, wproj, bproj, ln_s, ln_b,
               eps, attn_scale, num_heads):
    return _bert_attn_fwd_impl(
        x, mask_bias, wq, bq, wk, bk, wv, bv, wproj, bproj, ln_s, ln_b,
        eps, attn_scale, num_heads,
    )


def _bert_attn_vfwd(x, mask_bias, wq, bq, wk, bk, wv, bv, wproj, bproj,
                    ln_s, ln_b, eps, attn_scale, num_heads):
    out = _bert_attn_fwd_impl(
        x, mask_bias, wq, bq, wk, bk, wv, bv, wproj, bproj, ln_s, ln_b,
        eps, attn_scale, num_heads,
    )
    return out, (x, mask_bias, wq, bq, wk, bk, wv, bv, wproj, bproj, ln_s, ln_b)


def _bert_attn_vbwd(eps, attn_scale, num_heads, res, g):
    _, vjp = jax.vjp(
        lambda *a: _bert_attn_xla_reference(*a, eps, attn_scale, num_heads),
        *res,
    )
    return vjp(g)


_bert_attn.defvjp(_bert_attn_vfwd, _bert_attn_vbwd)


def fused_bert_attention_block(
    x: jnp.ndarray,
    attention_mask: jnp.ndarray,
    wq, bq, wk, bk, wv, bv, wproj, bproj, ln_scale, ln_bias,
    num_heads: int,
    *,
    eps: float,
) -> jnp.ndarray:
    """``LN(x + proj(masked_attn(q(x), k(x), v(x))))`` in one kernel.

    x: (M, S, D); attention_mask: (M, S) with 1 = valid key. Weights should
    already carry the compute dtype."""
    D = x.shape[-1]
    hd = D // num_heads
    mask_bias = (1.0 - attention_mask.astype(jnp.float32)) * -10000.0
    return _bert_attn(
        x, mask_bias, wq, bq, wk, bk, wv, bv, wproj, bproj, ln_scale, ln_bias,
        float(eps), hd ** -0.5, num_heads,
    )


# ---------------------------------------------------------------------------
# MLP chain: LN(x + fc2(gelu(fc1(x))))
# ---------------------------------------------------------------------------
def _bert_mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, s_ref, b_ref,
                     o_ref, *, eps: float):
    x = x_ref[...]  # (TM, D)
    h = jax.lax.dot_general(
        x.astype(w1_ref.dtype), w1_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    g = _gelu_exact_f32(h)
    y = jax.lax.dot_general(
        g.astype(w2_ref.dtype), w2_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    y = y + b2_ref[...].astype(jnp.float32) + x.astype(jnp.float32)
    o_ref[...] = _ln_rows_f32(y, s_ref[...], b_ref[...], eps).astype(
        o_ref.dtype
    )


def _bert_mlp_fwd_impl(x, w1, b1, w2, b2, ln_s, ln_b, eps):
    shape = x.shape
    D = shape[-1]
    Dh = w1.shape[-1]
    R = x.size // D
    x2 = x.reshape(R, D)
    interpret = jax.default_backend() != "tpu"
    TM = _TM if not interpret else max(R, 1)
    Rp = _round_up(max(R, 1), TM)
    if Rp != R:
        x2 = jnp.pad(x2, ((0, Rp - R), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_bert_mlp_kernel, eps=float(eps)),
        out_shape=jax.ShapeDtypeStruct((Rp, D), x.dtype),
        grid=(Rp // TM,),
        in_specs=[
            pl.BlockSpec((TM, D), lambda r: (r, 0), memory_space=_VMEM),
            pl.BlockSpec((D, Dh), lambda r: (0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, Dh), lambda r: (0, 0), memory_space=_VMEM),
            pl.BlockSpec((Dh, D), lambda r: (0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, D), lambda r: (0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, D), lambda r: (0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, D), lambda r: (0, 0), memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec((TM, D), lambda r: (r, 0), memory_space=_VMEM),
        interpret=interpret,
    )(x2, w1, b1[None, :], w2, b2[None, :], ln_s[None, :], ln_b[None, :])
    if Rp != R:
        out = out[:R]
    return out.reshape(shape)


def _bert_mlp_xla_reference(x, w1, b1, w2, b2, ln_s, ln_b, eps):
    h = (
        jnp.dot(x.astype(w1.dtype), w1, preferred_element_type=jnp.float32)
        + b1.astype(jnp.float32)
    )
    g = _gelu_exact_f32(h)
    y = (
        jnp.dot(g.astype(w2.dtype), w2, preferred_element_type=jnp.float32)
        + b2.astype(jnp.float32)
        + x.astype(jnp.float32)
    )
    return _ln_rows_f32(y, ln_s, ln_b, eps).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _bert_mlp(x, w1, b1, w2, b2, ln_s, ln_b, eps):
    return _bert_mlp_fwd_impl(x, w1, b1, w2, b2, ln_s, ln_b, eps)


def _bert_mlp_vfwd(x, w1, b1, w2, b2, ln_s, ln_b, eps):
    return (
        _bert_mlp_fwd_impl(x, w1, b1, w2, b2, ln_s, ln_b, eps),
        (x, w1, b1, w2, b2, ln_s, ln_b),
    )


def _bert_mlp_vbwd(eps, res, g):
    _, vjp = jax.vjp(
        lambda *a: _bert_mlp_xla_reference(*a, eps), *res
    )
    return vjp(g)


_bert_mlp.defvjp(_bert_mlp_vfwd, _bert_mlp_vbwd)


def fused_bert_mlp_block(
    x: jnp.ndarray, w1, b1, w2, b2, ln_scale, ln_bias, *, eps: float
) -> jnp.ndarray:
    """``LN(x + fc2(gelu_exact(fc1(x))))`` in one HBM round-trip."""
    return _bert_mlp(x, w1, b1, w2, b2, ln_scale, ln_bias, float(eps))
