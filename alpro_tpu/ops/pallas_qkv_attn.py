"""Packed-qkv fused attention kernels — consume the qkv projection's output
tensor directly, in its natural layout.

Motivation (profiled on v5e, docs/PERF.md round 2): XLA's lowering of the
divided space-time attentions spends more on layout than on math. Per step at
flagship shapes (B=16, T=8, N=196, D=768, H=12), the (M, S, 3D) qkv tensors
are repacked twice before the score dot (12.7 ms temporal + 10.3 ms spatial
of pure HBM copies), and the tile-padded (T, T) temporal score buffers cost
several more ms of repacks around the softmax. The earlier per-head kernels
(`pallas_attn.py`) could not fix this: they take q/k/v as three separate
arrays, so XLA materializes three strided-slice copies and pads S to 128
multiples before the kernel ever runs.

These kernels instead receive the *packed* qkv array three times, with three
BlockSpec index maps selecting the q, k and v lane windows of the same
buffer — no slicing copies, no padding (Mosaic on this toolchain accepts
ragged second-to-last block dims, probe-verified), no head-split transposes.
Each grid cell owns a 128-lane channel window (= 2 heads at hd=64) and
separates the heads with in-kernel lane slices; scores, softmax and the PV
product live entirely in VMEM.

The temporal kernel uses the circulant δ-roll identity of
`pallas_temporal_attn.py` (whose 12-head-unrolled body crashes this
toolchain's Mosaic; 2 heads per program compiles) in the model-native
(B, T, N, 3D) layout: for fixed t, {(t+δ) mod T} covers every key exactly
once, so softmax over keys ≡ softmax over δ and no (T, T) matrix — the
worst-tiled tensor in the whole model (lanes 8/128 used) — is ever built.

Both are differentiable via custom_vjp with flash-style XLA recompute
backward (no attention matrix stored between fwd and bwd).

Replaces the cuDNN attention of the reference's divided ST blocks
(`/root/reference/src/modeling/timesformer/vit.py:81-100,136-213`).
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

_LANE = 128
# spatial kernel channel-window width (heads per program = width // hd).
# 384 measured in-model 66.8 → 63.1 ms/batch over 128 (3× longer contiguous
# DMA runs, 1/3 the grid steps); the temporal kernel at 384 crashes this
# toolchain's Mosaic and stays at 128. Module-level for A/B.
_SPATIAL_LANE = 384


def _spatial_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, hd: int,
                    heads_per_block: int):
    for i in range(heads_per_block):
        sl = slice(i * hd, (i + 1) * hd)
        # QKᵀ takes the stored (bf16) operands — fp32 operands would run the
        # MXU at a fraction of its bf16 rate; accumulation stays fp32 and the
        # scale is applied to the fp32 scores (matches the XLA path's
        # bf16-operand dot numerics)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (o / l).astype(o_ref.dtype)


def _spatial_fwd_impl(qkv, num_heads, scale):
    B, S, threeD = qkv.shape
    D = threeD // 3
    hd = D // num_heads
    interpret = jax.default_backend() != "tpu"
    lane = _SPATIAL_LANE if not interpret else hd
    if D % lane != 0 or lane % hd != 0:
        lane = _LANE
    if D % lane != 0 or lane % hd != 0:
        # a truncated grid would silently skip the trailing D % lane lanes
        raise ValueError(
            f"fused spatial attention needs D divisible by a lane width that "
            f"is a head-dim multiple; got D={D}, head_dim={hd}, lane={lane}"
        )
    hpb = lane // hd
    nq = D // lane  # lane-blocks per q/k/v section

    out = pl.pallas_call(
        functools.partial(
            _spatial_kernel, scale=float(scale), hd=hd, heads_per_block=hpb
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, D), qkv.dtype),
        grid=(B, nq),
        in_specs=[
            pl.BlockSpec((1, S, lane), lambda b, h: (b, 0, h), memory_space=_VMEM),
            pl.BlockSpec((1, S, lane), lambda b, h, nq=nq: (b, 0, nq + h),
                         memory_space=_VMEM),
            pl.BlockSpec((1, S, lane), lambda b, h, nq=nq: (b, 0, 2 * nq + h),
                         memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, S, lane), lambda b, h: (b, 0, h), memory_space=_VMEM
        ),
        interpret=interpret,
    )(qkv, qkv, qkv)
    return out


def _spatial_xla_reference(qkv, num_heads, scale):
    B, S, threeD = qkv.shape
    D = threeD // 3
    hd = D // num_heads
    q = qkv[..., :D].reshape(B, S, num_heads, hd).astype(jnp.float32)
    k = qkv[..., D:2 * D].reshape(B, S, num_heads, hd).astype(jnp.float32)
    v = qkv[..., 2 * D:].reshape(B, S, num_heads, hd).astype(jnp.float32)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v)
    return o.reshape(B, S, D).astype(qkv.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _spatial_attention_qkv(qkv, num_heads, scale):
    return _spatial_fwd_impl(qkv, num_heads, scale)


def _spatial_fwd(qkv, num_heads, scale):
    return _spatial_fwd_impl(qkv, num_heads, scale), (qkv,)


def _spatial_bwd(num_heads, scale, res, g):
    (qkv,) = res
    _, vjp = jax.vjp(
        lambda x: _spatial_xla_reference(x, num_heads, scale), qkv
    )
    (dqkv,) = vjp(g.astype(qkv.dtype))
    return (dqkv,)


_spatial_attention_qkv.defvjp(_spatial_fwd, _spatial_bwd)


def fused_attention_qkv(
    qkv: jnp.ndarray, num_heads: int, *, scale: Optional[float] = None
) -> jnp.ndarray:
    """Mask-free attention over packed qkv (B, S, 3·H·hd) → (B, S, H·hd).

    Channel layout is the fused projection's: [q | k | v], each (H, hd)
    head-major. Requires H·hd % 128 == 0 and 128 % hd == 0 on TPU.
    """
    D = qkv.shape[-1] // 3
    hd = D // num_heads
    if scale is None:
        scale = hd ** -0.5
    return _spatial_attention_qkv(qkv, num_heads, float(scale))


# ---------------------------------------------------------------------------
# spatial with a CLS sideband: the shared CLS token never joins the patch
# tensor in HBM. The model's divided-ST spatial attention runs per frame over
# [CLS | N patches] (`vit.py:165-208`), where CLS is one (B, 1, D) row
# broadcast to every frame; materializing it costs a (B, T, 1+N, D) concat
# before the qkv matmul and a misaligned [:, :, 1:, :] slice after the proj,
# every block. Here the kernel reads the frame's N-row qkv block plus the
# sample's single cls qkv row (index map b // T) and emits patch and cls
# attention outputs separately — no concat, no offset-1 slice, and the cls
# proj runs once per sample instead of once per frame (mean commutes with
# the linear proj).
# ---------------------------------------------------------------------------
def _spatial_cls_kernel(qx_ref, kx_ref, vx_ref, qc_ref, kc_ref, vc_ref,
                        ox_ref, oc_ref, *, scale: float, hd: int,
                        heads_per_block: int):
    for i in range(heads_per_block):
        sl = slice(i * hd, (i + 1) * hd)
        qx = qx_ref[0, :, sl]   # (N, hd) stored dtype (bf16 on TPU)
        kx = kx_ref[0, :, sl]
        vx = vx_ref[0, :, sl]
        # cls pieces in fp32: Mosaic rejects 1-row dots (vector.broadcast
        # verifier), so every cls term is a VPU multiply-reduce instead of
        # an MXU dot — it touches one row, the cost is noise
        qcf = qc_ref[0, :, sl].astype(jnp.float32)   # (1, hd)
        kcf = kc_ref[0, :, sl].astype(jnp.float32)
        vcf = vc_ref[0, :, sl].astype(jnp.float32)
        # keys = [cls | patches]; the two score pieces share one softmax
        sxx = jax.lax.dot_general(
            qx, kx, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                            # (N, N)
        sxc = jnp.sum(
            qx.astype(jnp.float32) * kcf, axis=-1, keepdims=True
        ) * scale                                            # (N, 1)
        m = jnp.maximum(jnp.max(sxx, axis=-1, keepdims=True), sxc)
        pxx = jnp.exp(sxx - m)
        pxc = jnp.exp(sxc - m)
        den = jnp.sum(pxx, axis=-1, keepdims=True) + pxc
        o = jnp.dot(
            pxx.astype(vx.dtype), vx, preferred_element_type=jnp.float32
        ) + pxc * vcf
        ox_ref[0, :, sl] = (o / den).astype(ox_ref.dtype)
        # cls query over the same key set. The single query row is
        # replicated to 8 sublanes so both its dots are legal MXU ops
        # (1-row dots crash the Mosaic verifier; sublane-axis reductions
        # measured slow) — row 0 of the 8 identical results is written.
        qc8 = jnp.broadcast_to(qc_ref[0, :, sl], (8, qcf.shape[-1]))
        scx8 = jax.lax.dot_general(
            qc8, kx, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                                 # (8, N)
        scc = jnp.sum(qcf * kcf, axis=-1, keepdims=True) * scale  # (1, 1)
        mc = jnp.maximum(jnp.max(scx8, axis=-1, keepdims=True), scc)
        pcx8 = jnp.exp(scx8 - mc)                                 # (8, N)
        pcc = jnp.exp(scc - mc)                                   # (8, 1)
        denc = jnp.sum(pcx8, axis=-1, keepdims=True) + pcc
        oc8 = jnp.dot(
            pcx8.astype(vx.dtype), vx, preferred_element_type=jnp.float32
        ) + pcc * vcf
        oc_ref[0, :, sl] = ((oc8 / denc).astype(oc_ref.dtype))[0:1]


def _spatial_cls_fwd_impl(qkv_x, qkv_c, num_heads, scale, T):
    M, N, threeD = qkv_x.shape  # M = B·T
    D = threeD // 3
    hd = D // num_heads
    interpret = jax.default_backend() != "tpu"
    lane = _SPATIAL_LANE if not interpret else hd
    if D % lane != 0 or lane % hd != 0:
        lane = _LANE
    if D % lane != 0 or lane % hd != 0:
        raise ValueError(
            f"fused cls-sideband attention needs D divisible by a lane width "
            f"that is a head-dim multiple; got D={D}, head_dim={hd}"
        )
    hpb = lane // hd
    nq = D // lane
    return pl.pallas_call(
        functools.partial(
            _spatial_cls_kernel, scale=float(scale), hd=hd, heads_per_block=hpb
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, N, D), qkv_x.dtype),
            jax.ShapeDtypeStruct((M, 1, D), qkv_x.dtype),
        ),
        grid=(M, nq),
        in_specs=[
            pl.BlockSpec((1, N, lane), lambda b, h: (b, 0, h),
                         memory_space=_VMEM),
            pl.BlockSpec((1, N, lane), lambda b, h, nq=nq: (b, 0, nq + h),
                         memory_space=_VMEM),
            pl.BlockSpec((1, N, lane), lambda b, h, nq=nq: (b, 0, 2 * nq + h),
                         memory_space=_VMEM),
            pl.BlockSpec((1, 1, lane), lambda b, h, T=T: (b // T, 0, h),
                         memory_space=_VMEM),
            pl.BlockSpec((1, 1, lane), lambda b, h, T=T, nq=nq: (b // T, 0, nq + h),
                         memory_space=_VMEM),
            pl.BlockSpec((1, 1, lane), lambda b, h, T=T, nq=nq: (b // T, 0, 2 * nq + h),
                         memory_space=_VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, N, lane), lambda b, h: (b, 0, h),
                         memory_space=_VMEM),
            pl.BlockSpec((1, 1, lane), lambda b, h: (b, 0, h),
                         memory_space=_VMEM),
        ),
        interpret=interpret,
    )(qkv_x, qkv_x, qkv_x, qkv_c, qkv_c, qkv_c)


def _spatial_cls_xla_reference(qkv_x, qkv_c, num_heads, scale, T):
    """Concat-based oracle: broadcast cls to every frame, run the plain
    spatial reference over 1+N, split the outputs back."""
    M, N, threeD = qkv_x.shape
    B = M // T
    c_rep = jnp.broadcast_to(
        qkv_c[:, None, :, :], (B, T, 1, threeD)
    ).reshape(M, 1, threeD)
    full = jnp.concatenate([c_rep, qkv_x], axis=1)  # (M, 1+N, 3D)
    out = _spatial_xla_reference(full, num_heads, scale)
    return out[:, 1:, :], out[:, :1, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _spatial_cls_attention_qkv(qkv_x, qkv_c, num_heads, scale, T):
    return _spatial_cls_fwd_impl(qkv_x, qkv_c, num_heads, scale, T)


def _spatial_cls_fwd(qkv_x, qkv_c, num_heads, scale, T):
    return (
        _spatial_cls_fwd_impl(qkv_x, qkv_c, num_heads, scale, T),
        (qkv_x, qkv_c),
    )


def _spatial_cls_bwd(num_heads, scale, T, res, g):
    qkv_x, qkv_c = res
    gx, gc = g
    _, vjp = jax.vjp(
        lambda a, b: _spatial_cls_xla_reference(a, b, num_heads, scale, T),
        qkv_x, qkv_c,
    )
    return vjp((gx.astype(qkv_x.dtype), gc.astype(qkv_c.dtype)))


_spatial_cls_attention_qkv.defvjp(_spatial_cls_fwd, _spatial_cls_bwd)


def fused_attention_qkv_cls(
    qkv_x: jnp.ndarray, qkv_c: jnp.ndarray, num_heads: int, T: int,
    *, scale: Optional[float] = None
):
    """Per-frame attention over [cls | N patches] without materializing the
    concat: qkv_x (B·T, N, 3D) patch projections, qkv_c (B, 1, 3D) the
    sample-shared cls projection. Returns (patch_out (B·T, N, D),
    cls_out (B·T, 1, D)). Requires B·T % T == 0 and the spatial kernel's
    lane divisibility."""
    D = qkv_x.shape[-1] // 3
    hd = D // num_heads
    if qkv_x.shape[0] % T != 0:
        raise ValueError(f"leading dim {qkv_x.shape[0]} not divisible by T={T}")
    if scale is None:
        scale = hd ** -0.5
    return _spatial_cls_attention_qkv(qkv_x, qkv_c, num_heads, float(scale), T)


# ---------------------------------------------------------------------------
# temporal: attention over T at each patch location, native (B, T, N, 3D)
# ---------------------------------------------------------------------------
def _roll_up(x, delta):
    """x[(t+delta) % T] along axis 0 via slice+concat (this toolchain's
    Mosaic rejects pltpu.roll on these shapes)."""
    if delta == 0:
        return x
    return jnp.concatenate([x[delta:], x[:delta]], axis=0)


def _temporal_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, hd: int,
                     heads_per_block: int, T: int):
    for i in range(heads_per_block):
        sl = slice(i * hd, (i + 1) * hd)
        q = q_ref[0, :, :, sl].astype(jnp.float32) * scale  # (T, N, hd)
        k = k_ref[0, :, :, sl].astype(jnp.float32)
        v = v_ref[0, :, :, sl].astype(jnp.float32)
        # double k/v once so each δ-roll is a static slice of the doubled
        # buffer rather than a materialized two-piece concat (2 copies per
        # head instead of 2·T)
        k2 = jnp.concatenate([k, k], axis=0)  # (2T, N, hd)
        v2 = jnp.concatenate([v, v], axis=0)
        # band_δ[t, n] = Σ_d q[t]·k[(t+δ)%T]; softmax over keys ≡ over δ
        bands = [
            jnp.sum(
                q * jax.lax.slice_in_dim(k2, d, d + T, axis=0),
                axis=-1, keepdims=True,
            )
            for d in range(T)
        ]  # each (T, N, 1)
        m = bands[0]
        for b in bands[1:]:
            m = jnp.maximum(m, b)
        exps = [jnp.exp(b - m) for b in bands]
        den = exps[0]
        for e in exps[1:]:
            den = den + e
        o = exps[0] * v
        for d in range(1, T):
            o = o + exps[d] * jax.lax.slice_in_dim(v2, d, d + T, axis=0)
        o_ref[0, :, :, sl] = (o / den).astype(o_ref.dtype)


def _temporal_kernel_flash(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                           hd: int, heads_per_block: int, T: int):
    """Online-softmax (flash) over the δ-roll bands: a fori_loop carries
    (m, den, o, k_cur, v_cur) and rolls k/v by ONE position per iteration
    (static-shape concat), so the body stays tiny regardless of T and the
    head count per program — the fully unrolled band variant above crashes
    Mosaic beyond 2 heads/program."""
    for i in range(heads_per_block):
        sl = slice(i * hd, (i + 1) * hd)
        q = q_ref[0, :, :, sl].astype(jnp.float32) * scale  # (T, N, hd)
        k0 = k_ref[0, :, :, sl].astype(jnp.float32)
        v0 = v_ref[0, :, :, sl].astype(jnp.float32)
        band0 = jnp.sum(q * k0, axis=-1, keepdims=True)  # δ = 0
        m = band0
        den = jnp.ones_like(band0)
        o = v0

        def body(_d, carry):
            m, den, o, k_cur, v_cur = carry
            k_cur = jnp.concatenate([k_cur[1:], k_cur[:1]], axis=0)
            v_cur = jnp.concatenate([v_cur[1:], v_cur[:1]], axis=0)
            band = jnp.sum(q * k_cur, axis=-1, keepdims=True)
            m_new = jnp.maximum(m, band)
            c = jnp.exp(m - m_new)
            p = jnp.exp(band - m_new)
            return m_new, den * c + p, o * c + p * v_cur, k_cur, v_cur

        m, den, o, _, _ = jax.lax.fori_loop(1, T, body, (m, den, o, k0, v0))
        o_ref[0, :, :, sl] = (o / den).astype(o_ref.dtype)


_TEMPORAL_LANE = 128
_TEMPORAL_FLASH = False
_TEMPORAL_SEG = False

# T·N per VMEM block above which the grid splits the patch axis. The kernel
# is elementwise over N (attention runs over T independently at each patch
# location), so N-blocking is exact. T=8·N=196 (the retrieval/pretrain
# flagship) compiles and is the measured-good envelope; T=16·N=196 needs a
# 34.18 MB scoped-vmem stack against the 16 MB limit (Mosaic compile
# failure, round 4 — the fp32 δ-band intermediates scale with T·N and the
# band list with T²·N). 784 = half the proven envelope leaves margin for
# the T²·N term.
_TEMPORAL_TN_BLOCK = 784


def _temporal_n_block(T: int, N: int) -> int:
    """N-block size inside the VMEM envelope; N itself for T ≤ 8 (the
    measured flagship block shape, kept bit-identical). Mosaic requires the
    sublane block dim be a multiple of 8 or equal to the array dim, so the
    split uses the largest multiple of 8 with T·nb ≤ envelope and a cdiv
    grid — the ragged tail block is masked by Pallas, which is exact here
    because the kernel is elementwise over N."""
    if T <= 8 or T * N <= _TEMPORAL_TN_BLOCK:
        return N
    nb = (_TEMPORAL_TN_BLOCK // T) // 8 * 8
    return min(N, max(nb, 8))


def _temporal_kernel_seg(q_ref, k_ref, v_ref, seg_ref, o_ref, *,
                         scale: float, hd: int, heads_per_block: int, T: int):
    """δ-band variant with the cross-lane band reductions moved onto the
    MXU: the T rolled products are stacked along lanes and contracted with a
    block-diagonal ones matrix (seg_ref, (T·hd, pad128)), replacing 2·T
    VPU lane-reductions per head with one matmul — the in-kernel profile's
    dominant cost (docs/PERF.md round 2)."""
    for i in range(heads_per_block):
        sl = slice(i * hd, (i + 1) * hd)
        q = q_ref[0, :, :, sl].astype(jnp.float32) * scale  # (T, N, hd)
        k = k_ref[0, :, :, sl].astype(jnp.float32)
        v = v_ref[0, :, :, sl].astype(jnp.float32)
        N = q.shape[1]
        k2 = jnp.concatenate([k, k], axis=0)
        v2 = jnp.concatenate([v, v], axis=0)
        prods = jnp.concatenate(
            [q * jax.lax.slice_in_dim(k2, d, d + T, axis=0) for d in range(T)],
            axis=-1,
        )  # (T, N, T·hd)
        bands = jax.lax.dot_general(
            prods.reshape(T * N, T * hd).astype(o_ref.dtype),
            seg_ref[...],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )[:, :T]  # (T·N, T): band_δ in column δ
        m = jnp.max(bands, axis=-1, keepdims=True)
        p = jnp.exp(bands - m)
        den = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / den).reshape(T, N, T)
        o = p[:, :, 0:1] * v
        for d in range(1, T):
            o = o + p[:, :, d:d + 1] * jax.lax.slice_in_dim(v2, d, d + T, axis=0)
        o_ref[0, :, :, sl] = o.astype(o_ref.dtype)


def _temporal_fwd_impl(qkv, num_heads, scale):
    B, T, N, threeD = qkv.shape
    D = threeD // 3
    hd = D // num_heads
    interpret = jax.default_backend() != "tpu"
    lane = (_TEMPORAL_LANE if _TEMPORAL_FLASH else _LANE) if not interpret else hd
    if D % lane != 0 or lane % hd != 0:
        lane = _LANE
    if D % lane != 0 or lane % hd != 0:
        # a truncated grid would silently skip the trailing D % lane lanes
        raise ValueError(
            f"fused temporal attention needs D divisible by a lane width that "
            f"is a head-dim multiple; got D={D}, head_dim={hd}, lane={lane}"
        )
    hpb = lane // hd
    nq = D // lane
    if _TEMPORAL_SEG and not interpret:
        segc = max(128, T)
        seg = (
            (jnp.arange(T * hd)[:, None] // hd) == jnp.arange(segc)[None, :]
        ).astype(qkv.dtype)
        # the (T, nb, T·hd) fp32 prods stack is the VMEM driver here — block
        # N the same way the δ-band branch does (exact: elementwise over N)
        nbs = _temporal_n_block(T, N)
        return pl.pallas_call(
            functools.partial(
                _temporal_kernel_seg, scale=float(scale), hd=hd,
                heads_per_block=hpb, T=T,
            ),
            out_shape=jax.ShapeDtypeStruct((B, T, N, D), qkv.dtype),
            grid=(B, pl.cdiv(N, nbs), nq),
            in_specs=[
                pl.BlockSpec((1, T, nbs, lane), lambda b, n, h: (b, 0, n, h),
                             memory_space=_VMEM),
                pl.BlockSpec((1, T, nbs, lane),
                             lambda b, n, h, nq=nq: (b, 0, n, nq + h),
                             memory_space=_VMEM),
                pl.BlockSpec((1, T, nbs, lane),
                             lambda b, n, h, nq=nq: (b, 0, n, 2 * nq + h),
                             memory_space=_VMEM),
                pl.BlockSpec((T * hd, segc), lambda b, n, h: (0, 0),
                             memory_space=_VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, T, nbs, lane), lambda b, n, h: (b, 0, n, h),
                memory_space=_VMEM,
            ),
            interpret=False,
        )(qkv, qkv, qkv, seg)
    if _TEMPORAL_FLASH and not interpret:
        kern = functools.partial(
            _temporal_kernel_flash, scale=float(scale), hd=hd,
            heads_per_block=hpb, T=T,
        )
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, T, N, D), qkv.dtype),
            grid=(B, nq),
            in_specs=[
                pl.BlockSpec((1, T, N, lane), lambda b, h: (b, 0, 0, h),
                             memory_space=_VMEM),
                pl.BlockSpec((1, T, N, lane), lambda b, h, nq=nq: (b, 0, 0, nq + h),
                             memory_space=_VMEM),
                pl.BlockSpec((1, T, N, lane), lambda b, h, nq=nq: (b, 0, 0, 2 * nq + h),
                             memory_space=_VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, T, N, lane), lambda b, h: (b, 0, 0, h), memory_space=_VMEM
            ),
            interpret=False,
        )(qkv, qkv, qkv)

    nb = _temporal_n_block(T, N)
    out = pl.pallas_call(
        functools.partial(
            _temporal_kernel, scale=float(scale), hd=hd,
            heads_per_block=hpb, T=T,
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, N, D), qkv.dtype),
        grid=(B, pl.cdiv(N, nb), nq),
        in_specs=[
            pl.BlockSpec((1, T, nb, lane), lambda b, n, h: (b, 0, n, h),
                         memory_space=_VMEM),
            pl.BlockSpec((1, T, nb, lane),
                         lambda b, n, h, nq=nq: (b, 0, n, nq + h),
                         memory_space=_VMEM),
            pl.BlockSpec((1, T, nb, lane),
                         lambda b, n, h, nq=nq: (b, 0, n, 2 * nq + h),
                         memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, T, nb, lane), lambda b, n, h: (b, 0, n, h), memory_space=_VMEM
        ),
        interpret=interpret,
    )(qkv, qkv, qkv)
    return out


def _temporal_xla_reference(qkv, num_heads, scale):
    B, T, N, threeD = qkv.shape
    D = threeD // 3
    hd = D // num_heads
    q = qkv[..., :D].reshape(B, T, N, num_heads, hd).astype(jnp.float32)
    k = qkv[..., D:2 * D].reshape(B, T, N, num_heads, hd).astype(jnp.float32)
    v = qkv[..., 2 * D:].reshape(B, T, N, num_heads, hd).astype(jnp.float32)
    s = jnp.einsum("btnhd,bsnhd->bnhts", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bnhts,bsnhd->btnhd", p, v)
    return o.reshape(B, T, N, D).astype(qkv.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _temporal_attention_qkv(qkv, num_heads, scale):
    return _temporal_fwd_impl(qkv, num_heads, scale)


def _temporal_fwd(qkv, num_heads, scale):
    return _temporal_fwd_impl(qkv, num_heads, scale), (qkv,)


def _temporal_bwd(num_heads, scale, res, g):
    (qkv,) = res
    _, vjp = jax.vjp(
        lambda x: _temporal_xla_reference(x, num_heads, scale), qkv
    )
    (dqkv,) = vjp(g.astype(qkv.dtype))
    return (dqkv,)


_temporal_attention_qkv.defvjp(_temporal_fwd, _temporal_bwd)


def fused_temporal_attention_qkv(
    qkv: jnp.ndarray, num_heads: int, *, scale: Optional[float] = None
) -> jnp.ndarray:
    """Temporal attention over packed qkv (B, T, N, 3·H·hd) → (B, T, N, H·hd),
    attending over T independently at each (b, n) location
    (`vit.py:144-162` semantics, model-native layout)."""
    D = qkv.shape[-1] // 3
    hd = D // num_heads
    if scale is None:
        scale = hd ** -0.5
    return _temporal_attention_qkv(qkv, num_heads, float(scale))


# ---------------------------------------------------------------------------
# full-width variants: the qkv block arrives in VMEM at its full 3D lane
# width (contiguous HBM reads instead of the strided 128-lane BlockSpec
# windows above, which profiled at ~122 GB/s), head windows are sliced
# in-kernel with dynamic lane offsets, and the output projection runs
# in-kernel with per-window partials accumulated in fp32 scratch — the
# attention output tensor never round-trips HBM either.
# ---------------------------------------------------------------------------
def _spatial_qkv_proj_kernel(qkv_ref, wp_ref, bp_ref, o_ref, acc_ref, *,
                             scale: float, hd: int, hpb: int, nw: int, D: int):
    h = pl.program_id(1)
    win = hpb * hd
    base = h * win
    qh = qkv_ref[0, :, pl.ds(base, win)].astype(jnp.float32)
    kh = qkv_ref[0, :, pl.ds(D + base, win)].astype(jnp.float32)
    vh = qkv_ref[0, :, pl.ds(2 * D + base, win)].astype(jnp.float32)
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
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        parts.append(o / l)
    opart = jnp.concatenate(parts, axis=-1)  # (S, win)
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

    @pl.when(h == nw - 1)
    def _emit():
        o_ref[0] = (acc_ref[...] + bp_ref[...].astype(jnp.float32)).astype(
            o_ref.dtype
        )


def _spatial_qkv_proj_fwd_impl(qkv, wproj, bproj, num_heads, scale):
    M, S, threeD = qkv.shape
    D = threeD // 3
    hd = D // num_heads
    interpret = jax.default_backend() != "tpu"
    win = _LANE if not interpret else D
    hpb = win // hd
    nw = D // win
    out = pl.pallas_call(
        functools.partial(
            _spatial_qkv_proj_kernel, scale=float(scale), hd=hd, hpb=hpb,
            nw=nw, D=D,
        ),
        out_shape=jax.ShapeDtypeStruct((M, S, D), qkv.dtype),
        grid=(M, nw),
        in_specs=[
            pl.BlockSpec((1, S, threeD), lambda m, h: (m, 0, 0),
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
    )(qkv, wproj, bproj[None, :])
    return out


def _spatial_qkv_proj_xla_reference(qkv, wproj, bproj, num_heads, scale):
    o = _spatial_xla_reference(qkv, num_heads, scale)
    y = jnp.einsum(
        "msd,df->msf", o.astype(wproj.dtype), wproj,
        preferred_element_type=jnp.float32,
    ) + bproj.astype(jnp.float32)
    return y.astype(qkv.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _spatial_qkv_proj(qkv, wproj, bproj, num_heads, scale):
    return _spatial_qkv_proj_fwd_impl(qkv, wproj, bproj, num_heads, scale)


def _spatial_qkv_proj_vfwd(qkv, wproj, bproj, num_heads, scale):
    return (
        _spatial_qkv_proj_fwd_impl(qkv, wproj, bproj, num_heads, scale),
        (qkv, wproj, bproj),
    )


def _spatial_qkv_proj_vbwd(num_heads, scale, res, g):
    _, vjp = jax.vjp(
        lambda *a: _spatial_qkv_proj_xla_reference(*a, num_heads, scale), *res
    )
    return vjp(g)


_spatial_qkv_proj.defvjp(_spatial_qkv_proj_vfwd, _spatial_qkv_proj_vbwd)


def fused_attention_qkv_proj(
    qkv: jnp.ndarray, wproj: jnp.ndarray, bproj: jnp.ndarray, num_heads: int,
    *, scale: Optional[float] = None,
) -> jnp.ndarray:
    """``attn(qkv) @ wproj + bproj`` over packed qkv (M, S, 3D) → (M, S, D),
    full-width VMEM qkv block + in-kernel output projection."""
    D = qkv.shape[-1] // 3
    hd = D // num_heads
    if scale is None:
        scale = hd ** -0.5
    return _spatial_qkv_proj(qkv, wproj, bproj, num_heads, float(scale))


def _temporal_qkv_proj_kernel(qkv_ref, we_ref, be_ref, o_ref, acc_ref, *,
                              scale: float, hd: int, hpb: int, nw: int,
                              D: int, T: int):
    h = pl.program_id(2)
    win = hpb * hd
    base = h * win
    Nt = qkv_ref.shape[2]
    qh = qkv_ref[0, :, :, pl.ds(base, win)].astype(jnp.float32)  # (T, Nt, win)
    kh = qkv_ref[0, :, :, pl.ds(D + base, win)].astype(jnp.float32)
    vh = qkv_ref[0, :, :, pl.ds(2 * D + base, win)].astype(jnp.float32)
    parts = []
    for i in range(hpb):
        sl = slice(i * hd, (i + 1) * hd)
        q = qh[:, :, sl] * scale
        k = kh[:, :, sl]
        v = vh[:, :, sl]
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

    @pl.when(h == nw - 1)
    def _emit():
        y = acc_ref[...] + be_ref[...].astype(jnp.float32)
        o_ref[0] = y.reshape(T, Nt, D).astype(o_ref.dtype)


def _pick_nt8(N: int, cap: int = 48) -> int:
    for cand in range(min(N - N % 8, cap), 7, -8):
        if N % cand == 0:
            return cand
    return N


def _temporal_qkv_proj_fwd_impl(qkv, w_eff, b_eff, num_heads, scale):
    B, T, N, threeD = qkv.shape
    D = threeD // 3
    hd = D // num_heads
    interpret = jax.default_backend() != "tpu"
    win = _LANE if not interpret else D
    hpb = win // hd
    nw = D // win
    Nt = _pick_nt8(N) if not interpret else N
    out = pl.pallas_call(
        functools.partial(
            _temporal_qkv_proj_kernel, scale=float(scale), hd=hd, hpb=hpb,
            nw=nw, D=D, T=T,
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, N, D), qkv.dtype),
        grid=(B, N // Nt, nw),
        in_specs=[
            pl.BlockSpec((1, T, Nt, threeD), lambda b, n, h: (b, 0, n, 0),
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
    )(qkv, w_eff, b_eff[None, :])
    return out


def _temporal_qkv_proj_xla_reference(qkv, w_eff, b_eff, num_heads, scale):
    o = _temporal_xla_reference(qkv, num_heads, scale)
    y = jnp.einsum(
        "btnd,df->btnf", o.astype(w_eff.dtype), w_eff,
        preferred_element_type=jnp.float32,
    ) + b_eff.astype(jnp.float32)
    return y.astype(qkv.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _temporal_qkv_proj(qkv, w_eff, b_eff, num_heads, scale):
    return _temporal_qkv_proj_fwd_impl(qkv, w_eff, b_eff, num_heads, scale)


def _temporal_qkv_proj_vfwd(qkv, w_eff, b_eff, num_heads, scale):
    return (
        _temporal_qkv_proj_fwd_impl(qkv, w_eff, b_eff, num_heads, scale),
        (qkv, w_eff, b_eff),
    )


def _temporal_qkv_proj_vbwd(num_heads, scale, res, g):
    _, vjp = jax.vjp(
        lambda *a: _temporal_qkv_proj_xla_reference(*a, num_heads, scale), *res
    )
    return vjp(g)


_temporal_qkv_proj.defvjp(_temporal_qkv_proj_vfwd, _temporal_qkv_proj_vbwd)


def fused_temporal_attention_qkv_proj(
    qkv: jnp.ndarray, w_eff: jnp.ndarray, b_eff: jnp.ndarray, num_heads: int,
    *, scale: Optional[float] = None,
) -> jnp.ndarray:
    """``temporal_attn(qkv) @ w_eff + b_eff`` over (B, T, N, 3D) → (B, T, N, D).
    On TPU, N must be a multiple of 8 (pad and slice at the call site —
    Mosaic block tiling); full-width VMEM qkv block + in-kernel projection."""
    D = qkv.shape[-1] // 3
    hd = D // num_heads
    if scale is None:
        scale = hd ** -0.5
    return _temporal_qkv_proj(qkv, w_eff, b_eff, num_heads, float(scale))
