"""Whole-attention-chain fused block kernels: LN → qkv → attention → proj
(→ +residual) in a single Pallas kernel.

Why: with the packed-qkv kernels (pallas_qkv_attn.py) the remaining per-block
HBM traffic is structural — the (M, 3D) qkv tensor is written by the
projection matmul and re-read by the attention kernel through 128-lane
BlockSpec windows, i.e. *strided* slices of a 2304-lane array, which stream
at ~49 GB/s on this chip (docs/PERF.md: 154 MB moved in 3.15 ms). These
kernels compute qkv *inside* the kernel from the LayerNormed input and never
materialize it: per grid cell the chain reads the x tile once, runs LN
(fp32 statistics), the three head-window qkv matmuls, the attention core,
and the output-projection partial product, accumulating projections across
head windows in a VMEM fp32 scratch; the block output is written once.

Grid layout: (cells..., head_windows) with the head axis innermost — the x
tile's index map is constant in it, so the tile stays resident in VMEM while
every 128-lane (2-head) window is processed, and the per-window weight
slices (3×0.2 MB) are the only re-fetched blocks. The 12-head single-cell
variant is avoided deliberately: this toolchain's Mosaic crashes on
12-head-unrolled attention bodies (see pallas_temporal_attn.py), while
2-heads-per-program compiles.

Temporal attention uses the circulant δ-roll identity (softmax over keys ≡
softmax over δ, no (T, T) matrices); the temporal wrapper also takes the
*folded* output projection ``w_eff = W_proj · W_temporal_fc`` — two
back-to-back (D, D) matmuls with no nonlinearity between collapse into one —
and adds the residual in-kernel.

Both are differentiable via custom_vjp with XLA-recompute backward.
Replaces the reference's per-block attention chains
(`/root/reference/src/modeling/timesformer/vit.py:136-213`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds; keep importable on CPU for tests
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

_LANE = 128


from alpro_tpu.ops.kernel_math import ln_rows_f32 as _ln_rows


# ---------------------------------------------------------------------------
# spatial: softmax attention over S rows per cell
# ---------------------------------------------------------------------------
def _spatial_block_kernel(
    x_ref, s_ref, b_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
    wp_ref, bp_ref, o_ref, acc_ref,
    *, eps: float, scale: float, hd: int, hpb: int, nh_windows: int,
    residual: bool,
):
    h = pl.program_id(1)
    x = x_ref[0]  # (S, D)
    xn = _ln_rows(x, s_ref[...], b_ref[...], eps).astype(wq_ref.dtype)
    qh = jax.lax.dot_general(
        xn, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bq_ref[...].astype(jnp.float32)
    kh = jax.lax.dot_general(
        xn, wk_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bk_ref[...].astype(jnp.float32)
    vh = jax.lax.dot_general(
        xn, wv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bv_ref[...].astype(jnp.float32)
    parts = []
    for i in range(hpb):
        sl = slice(i * hd, (i + 1) * hd)
        q = qh[:, sl] * scale
        k = kh[:, sl]
        v = vh[:, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        parts.append(o / l)
    opart = jnp.concatenate(parts, axis=-1)  # (S, hpb·hd)
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
        y = acc_ref[...] + bp_ref[...].astype(jnp.float32)
        if residual:
            y = y + x.astype(jnp.float32)
        o_ref[0] = y.astype(o_ref.dtype)


def _spatial_block_fwd_impl(
    x, scale_p, bias_p, wqkv, bqkv, wproj, bproj, eps, attn_scale, num_heads,
    residual,
):
    M, S, D = x.shape
    hd = D // num_heads
    interpret = jax.default_backend() != "tpu"
    win = _LANE if not interpret else D
    if D % win != 0 or win % hd != 0:
        # a truncated grid would silently skip the trailing D % win lanes
        raise ValueError(
            f"fused spatial block needs D divisible by the lane window and "
            f"the window a head-dim multiple; got D={D}, head_dim={hd}, window={win}"
        )
    hpb = win // hd
    nw = D // win  # windows per q/k/v section

    out = pl.pallas_call(
        functools.partial(
            _spatial_block_kernel, eps=float(eps), scale=float(attn_scale),
            hd=hd, hpb=hpb, nh_windows=nw, residual=residual,
        ),
        out_shape=jax.ShapeDtypeStruct((M, S, D), x.dtype),
        grid=(M, nw),
        in_specs=[
            pl.BlockSpec((1, S, D), lambda m, h: (m, 0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, D), lambda m, h: (0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, D), lambda m, h: (0, 0), memory_space=_VMEM),
            pl.BlockSpec((D, win), lambda m, h: (0, h), memory_space=_VMEM),
            pl.BlockSpec((D, win), lambda m, h, nw=nw: (0, nw + h),
                         memory_space=_VMEM),
            pl.BlockSpec((D, win), lambda m, h, nw=nw: (0, 2 * nw + h),
                         memory_space=_VMEM),
            pl.BlockSpec((1, win), lambda m, h: (0, h), memory_space=_VMEM),
            pl.BlockSpec((1, win), lambda m, h, nw=nw: (0, nw + h),
                         memory_space=_VMEM),
            pl.BlockSpec((1, win), lambda m, h, nw=nw: (0, 2 * nw + h),
                         memory_space=_VMEM),
            pl.BlockSpec((win, D), lambda m, h: (h, 0), memory_space=_VMEM),
            pl.BlockSpec((1, D), lambda m, h: (0, 0), memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, S, D), lambda m, h: (m, 0, 0), memory_space=_VMEM
        ),
        scratch_shapes=(
            [pltpu.VMEM((S, D), jnp.float32)] if pltpu is not None else []
        ),
        interpret=interpret,
    )(
        x, scale_p[None, :], bias_p[None, :], wqkv, wqkv, wqkv,
        bqkv[None, :], bqkv[None, :], bqkv[None, :], wproj, bproj[None, :],
    )
    return out


def _spatial_block_xla_reference(
    x, scale_p, bias_p, wqkv, bqkv, wproj, bproj, eps, attn_scale, num_heads,
    residual,
):
    M, S, D = x.shape
    hd = D // num_heads
    xn = _ln_rows(x, scale_p, bias_p, eps).astype(wqkv.dtype)
    qkv = (
        jnp.einsum("msd,df->msf", xn, wqkv, preferred_element_type=jnp.float32)
        + bqkv.astype(jnp.float32)
    )
    q = qkv[..., :D].reshape(M, S, num_heads, hd) * attn_scale
    k = qkv[..., D:2 * D].reshape(M, S, num_heads, hd)
    v = qkv[..., 2 * D:].reshape(M, S, num_heads, hd)
    s = jnp.einsum("mqhd,mkhd->mhqk", q, k)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("mhqk,mkhd->mqhd", p, v).reshape(M, S, D)
    y = (
        jnp.einsum(
            "msd,df->msf", o.astype(wproj.dtype), wproj,
            preferred_element_type=jnp.float32,
        )
        + bproj.astype(jnp.float32)
    )
    if residual:
        y = y + x.astype(jnp.float32)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _spatial_block(x, scale_p, bias_p, wqkv, bqkv, wproj, bproj, eps,
                   attn_scale, num_heads, residual):
    return _spatial_block_fwd_impl(
        x, scale_p, bias_p, wqkv, bqkv, wproj, bproj, eps,
        attn_scale, num_heads, residual,
    )


def _spatial_block_vfwd(x, scale_p, bias_p, wqkv, bqkv, wproj, bproj, eps,
                        attn_scale, num_heads, residual):
    out = _spatial_block_fwd_impl(
        x, scale_p, bias_p, wqkv, bqkv, wproj, bproj, eps, attn_scale,
        num_heads, residual,
    )
    return out, (x, scale_p, bias_p, wqkv, bqkv, wproj, bproj)


def _spatial_block_vbwd(eps, attn_scale, num_heads, residual, res, g):
    x, scale_p, bias_p, wqkv, bqkv, wproj, bproj = res
    _, vjp = jax.vjp(
        lambda *a: _spatial_block_xla_reference(
            *a, eps, attn_scale, num_heads, residual
        ),
        x, scale_p, bias_p, wqkv, bqkv, wproj, bproj,
    )
    return vjp(g)


_spatial_block.defvjp(_spatial_block_vfwd, _spatial_block_vbwd)


def fused_spatial_block(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    wproj: jnp.ndarray,
    bproj: jnp.ndarray,
    num_heads: int,
    *,
    eps: float,
    residual: bool = False,
) -> jnp.ndarray:
    """``proj(softmax_attn(qkv(LN(x))))`` per (batch·frame) cell — qkv never
    leaves VMEM. x: (M, S, D); wqkv: (D, 3D) in [q|k|v] head-major layout;
    wproj: (D, D)."""
    D = x.shape[-1]
    hd = D // num_heads
    return _spatial_block(
        x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, float(eps),
        hd ** -0.5, num_heads, residual,
    )


# ---------------------------------------------------------------------------
# temporal: δ-roll attention over T at each patch location
# ---------------------------------------------------------------------------
def _roll_up(x, delta):
    if delta == 0:
        return x
    return jnp.concatenate([x[delta:], x[:delta]], axis=0)


def _temporal_block_kernel(
    x_ref, s_ref, b_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
    we_ref, be_ref, o_ref, acc_ref,
    *, eps: float, scale: float, hd: int, hpb: int, nh_windows: int, T: int,
):
    h = pl.program_id(2)
    x = x_ref[0]  # (T, Nt, D)
    Nt = x.shape[1]
    D = x.shape[2]
    rows = x.reshape(T * Nt, D)
    xn = _ln_rows(rows, s_ref[...], b_ref[...], eps).astype(wq_ref.dtype)
    # stage q/k/v bf16 (matches the standalone packed-qkv kernel, which
    # reads bf16 qkv and upcasts per band) — halves the VMEM footprint of
    # the three (T·Nt, win) buffers at full-N tiles
    qh = (
        jax.lax.dot_general(
            xn, wq_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bq_ref[...].astype(jnp.float32)
    ).astype(x.dtype)
    kh = (
        jax.lax.dot_general(
            xn, wk_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bk_ref[...].astype(jnp.float32)
    ).astype(x.dtype)
    vh = (
        jax.lax.dot_general(
            xn, wv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bv_ref[...].astype(jnp.float32)
    ).astype(x.dtype)
    parts = []
    for i in range(hpb):
        sl = slice(i * hd, (i + 1) * hd)
        q = qh[:, sl].astype(jnp.float32).reshape(T, Nt, hd) * scale
        k = kh[:, sl].astype(jnp.float32).reshape(T, Nt, hd)
        v = vh[:, sl].astype(jnp.float32).reshape(T, Nt, hd)
        bands = [
            jnp.sum(q * _roll_up(k, d), axis=-1, keepdims=True)
            for d in range(T)
        ]
        m = bands[0]
        for bnd in bands[1:]:
            m = jnp.maximum(m, bnd)
        exps = [jnp.exp(bnd - m) for bnd in bands]
        den = exps[0]
        for e in exps[1:]:
            den = den + e
        o = exps[0] * v
        for d in range(1, T):
            o = o + exps[d] * _roll_up(v, d)
        parts.append((o / den).reshape(T * Nt, hd))
    opart = jnp.concatenate(parts, axis=-1)  # (T·Nt, win)
    contrib = jax.lax.dot_general(
        opart.astype(we_ref.dtype), we_ref[...],
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
        y = acc_ref[...] + be_ref[...].astype(jnp.float32)
        y = y + rows.astype(jnp.float32)  # residual
        o_ref[0] = y.reshape(T, Nt, D).astype(o_ref.dtype)


def _pick_nt(N: int, cap: int = 64) -> int:
    """Largest divisor of N that is a multiple of 8 (Mosaic block-shape
    constraint on the second-to-last dim) and ≤ cap; N itself otherwise
    (a block dim equal to the full array dim is always legal)."""
    for cand in range(min(N - N % 8, cap), 7, -8):
        if N % cand == 0:
            return cand
    return N


def _temporal_block_fwd_impl(
    x, scale_p, bias_p, wqkv, bqkv, w_eff, b_eff, eps, attn_scale, num_heads
):
    B, T, N, D = x.shape
    hd = D // num_heads
    interpret = jax.default_backend() != "tpu"
    win = _LANE if not interpret else D
    if D % win != 0 or win % hd != 0:
        # a truncated grid would silently skip the trailing D % win lanes
        raise ValueError(
            f"fused temporal block needs D divisible by the lane window and "
            f"the window a head-dim multiple; got D={D}, head_dim={hd}, window={win}"
        )
    hpb = win // hd
    nw = D // win
    Nt = _pick_nt(N) if not interpret else N

    out = pl.pallas_call(
        functools.partial(
            _temporal_block_kernel, eps=float(eps), scale=float(attn_scale),
            hd=hd, hpb=hpb, nh_windows=nw, T=T,
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, N, D), x.dtype),
        grid=(B, N // Nt, nw),
        in_specs=[
            pl.BlockSpec((1, T, Nt, D), lambda b, n, h: (b, 0, n, 0),
                         memory_space=_VMEM),
            pl.BlockSpec((1, D), lambda b, n, h: (0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, D), lambda b, n, h: (0, 0), memory_space=_VMEM),
            pl.BlockSpec((D, win), lambda b, n, h: (0, h), memory_space=_VMEM),
            pl.BlockSpec((D, win), lambda b, n, h, nw=nw: (0, nw + h),
                         memory_space=_VMEM),
            pl.BlockSpec((D, win), lambda b, n, h, nw=nw: (0, 2 * nw + h),
                         memory_space=_VMEM),
            pl.BlockSpec((1, win), lambda b, n, h: (0, h), memory_space=_VMEM),
            pl.BlockSpec((1, win), lambda b, n, h, nw=nw: (0, nw + h),
                         memory_space=_VMEM),
            pl.BlockSpec((1, win), lambda b, n, h, nw=nw: (0, 2 * nw + h),
                         memory_space=_VMEM),
            pl.BlockSpec((win, D), lambda b, n, h: (h, 0), memory_space=_VMEM),
            pl.BlockSpec((1, D), lambda b, n, h: (0, 0), memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, T, Nt, D), lambda b, n, h: (b, 0, n, 0), memory_space=_VMEM
        ),
        scratch_shapes=(
            [pltpu.VMEM((T * Nt, D), jnp.float32)] if pltpu is not None else []
        ),
        interpret=interpret,
    )(
        x, scale_p[None, :], bias_p[None, :], wqkv, wqkv, wqkv,
        bqkv[None, :], bqkv[None, :], bqkv[None, :], w_eff, b_eff[None, :],
    )
    return out


def _temporal_block_xla_reference(
    x, scale_p, bias_p, wqkv, bqkv, w_eff, b_eff, eps, attn_scale, num_heads
):
    B, T, N, D = x.shape
    hd = D // num_heads
    xn = _ln_rows(x, scale_p, bias_p, eps).astype(wqkv.dtype)
    qkv = (
        jnp.einsum("btnd,df->btnf", xn, wqkv, preferred_element_type=jnp.float32)
        + bqkv.astype(jnp.float32)
    )
    q = qkv[..., :D].reshape(B, T, N, num_heads, hd) * attn_scale
    k = qkv[..., D:2 * D].reshape(B, T, N, num_heads, hd)
    v = qkv[..., 2 * D:].reshape(B, T, N, num_heads, hd)
    s = jnp.einsum("btnhd,bsnhd->bnhts", q, k)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bnhts,bsnhd->btnhd", p, v).reshape(B, T, N, D)
    y = (
        jnp.einsum(
            "btnd,df->btnf", o.astype(w_eff.dtype), w_eff,
            preferred_element_type=jnp.float32,
        )
        + b_eff.astype(jnp.float32)
    )
    y = y + x.astype(jnp.float32)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _temporal_block(x, scale_p, bias_p, wqkv, bqkv, w_eff, b_eff, eps,
                    attn_scale, num_heads):
    return _temporal_block_fwd_impl(
        x, scale_p, bias_p, wqkv, bqkv, w_eff, b_eff, eps, attn_scale,
        num_heads,
    )


def _temporal_block_vfwd(x, scale_p, bias_p, wqkv, bqkv, w_eff, b_eff, eps,
                         attn_scale, num_heads):
    out = _temporal_block_fwd_impl(
        x, scale_p, bias_p, wqkv, bqkv, w_eff, b_eff, eps, attn_scale,
        num_heads,
    )
    return out, (x, scale_p, bias_p, wqkv, bqkv, w_eff, b_eff)


def _temporal_block_vbwd(eps, attn_scale, num_heads, res, g):
    x, scale_p, bias_p, wqkv, bqkv, w_eff, b_eff = res
    _, vjp = jax.vjp(
        lambda *a: _temporal_block_xla_reference(
            *a, eps, attn_scale, num_heads
        ),
        x, scale_p, bias_p, wqkv, bqkv, w_eff, b_eff,
    )
    return vjp(g)


_temporal_block.defvjp(_temporal_block_vfwd, _temporal_block_vbwd)


def fused_temporal_block(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    w_eff: jnp.ndarray,
    b_eff: jnp.ndarray,
    num_heads: int,
    *,
    eps: float,
) -> jnp.ndarray:
    """``x + (δ-roll temporal attention of qkv(LN(x))) @ w_eff + b_eff`` in
    one kernel. x: (B, T, N, D); w_eff is the pre-folded proj·temporal_fc
    product (D, D), b_eff its folded bias."""
    D = x.shape[-1]
    hd = D // num_heads
    return _temporal_block(
        x, ln_scale, ln_bias, wqkv, bqkv, w_eff, b_eff, float(eps),
        hd ** -0.5, num_heads,
    )
