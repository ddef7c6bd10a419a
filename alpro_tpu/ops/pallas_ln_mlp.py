"""Fused LayerNorm → MLP (fc1→GELU→fc2) → residual-add Pallas kernel.

Why: the round-2 profile (docs/PERF.md) splits the flagship embed into two
op populations with a ~6× effective-bandwidth gap: matmul fusions stream at
~500 GB/s while the LN convert+reduce fusions and standalone elementwise
chains crawl at ~86–110 GB/s. The transformer block tail
``x + fc2(gelu(fc1(LN(x))))`` currently pays one slow LN round-trip
(read 38.5 MB + write 38.5 MB per block at B=16), materializes the
(25k, 3072) GELU hidden in HBM between the two matmuls (154 MB written +
re-read), and runs a separate residual add. This kernel reads ``x`` once,
keeps LN statistics, both matmuls, the exact-erf GELU, and the residual in
VMEM, and writes the block output once: per-tile traffic drops from ~5
tensor round-trips to one read + one write riding the fast matmul path.

Numerics: LN statistics fp32 (one-pass E[x²]−E[x]², identical to
`ops/layers.py::LayerNorm`); matmuls take bf16 operands with fp32
accumulation; GELU is the exact erf form evaluated in fp32 (the XLA path
evaluates it in bf16 — the kernel is slightly *more* precise); the residual
is added in fp32. Differentiable via custom_vjp with an XLA-recompute
backward (nothing but ``x`` and the weights are saved).

Replaces the reference block tail `timesformer/vit.py:49-65,211-213` (torch
nn.Linear/GELU under cuDNN) for the serving path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from alpro_tpu.ops.kernel_math import gelu_exact_f32 as _gelu_exact_f32
from alpro_tpu.ops.kernel_math import ln_rows_f32 as _ln_rows_f32

try:  # pltpu only resolves on TPU builds; keep importable on CPU for tests
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

_TM = 128  # row tile: fits x/h/weights in ~12 MB of VMEM at D=768, Dh=3072


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ln_mlp_kernel(
    x_ref, scale_ref, bias_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
    *, eps: float, residual: bool,
):
    x = x_ref[...].astype(jnp.float32)  # (TM, D)
    xn = _ln_rows_f32(x, scale_ref[...], bias_ref[...], eps)
    h = jax.lax.dot_general(
        xn.astype(w1_ref.dtype), w1_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    h = h + b1_ref[...].astype(jnp.float32)
    g = _gelu_exact_f32(h)
    y = jax.lax.dot_general(
        g.astype(w2_ref.dtype), w2_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    y = y + b2_ref[...].astype(jnp.float32)
    if residual:
        y = y + x
    o_ref[...] = y.astype(o_ref.dtype)


def _fwd_impl(x, scale, bias, w1, b1, w2, b2, eps, residual, out_dtype):
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
        functools.partial(_ln_mlp_kernel, eps=float(eps), residual=residual),
        out_shape=jax.ShapeDtypeStruct((Rp, D), out_dtype),
        grid=(Rp // TM,),
        in_specs=[
            pl.BlockSpec((TM, D), lambda r: (r, 0), memory_space=_VMEM),
            pl.BlockSpec((1, D), lambda r: (0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, D), lambda r: (0, 0), memory_space=_VMEM),
            pl.BlockSpec((D, Dh), lambda r: (0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, Dh), lambda r: (0, 0), memory_space=_VMEM),
            pl.BlockSpec((Dh, D), lambda r: (0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, D), lambda r: (0, 0), memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec((TM, D), lambda r: (r, 0), memory_space=_VMEM),
        interpret=interpret,
    )(x2, scale[None, :], bias[None, :], w1, b1[None, :], w2, b2[None, :])
    if Rp != R:
        out = out[:R]
    return out.reshape(shape)


def _ln_mlp_xla_reference(x, scale, bias, w1, b1, w2, b2, eps, residual, out_dtype):
    """Same math in plain XLA (backward recompute + CPU test oracle)."""
    xf = x.astype(jnp.float32)
    xn = _ln_rows_f32(xf, scale, bias, eps)
    h = jnp.dot(
        xn.astype(w1.dtype), w1, preferred_element_type=jnp.float32
    ) + b1.astype(jnp.float32)
    g = _gelu_exact_f32(h)
    y = jnp.dot(
        g.astype(w2.dtype), w2, preferred_element_type=jnp.float32
    ) + b2.astype(jnp.float32)
    if residual:
        y = y + xf
    return y.astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _ln_mlp(x, scale, bias, w1, b1, w2, b2, eps, residual, out_dtype):
    return _fwd_impl(x, scale, bias, w1, b1, w2, b2, eps, residual, out_dtype)


def _ln_mlp_fwd(x, scale, bias, w1, b1, w2, b2, eps, residual, out_dtype):
    return (
        _fwd_impl(x, scale, bias, w1, b1, w2, b2, eps, residual, out_dtype),
        (x, scale, bias, w1, b1, w2, b2),
    )


def _ln_mlp_bwd(eps, residual, out_dtype, res, g):
    x, scale, bias, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _ln_mlp_xla_reference(*a, eps, residual, out_dtype),
        x, scale, bias, w1, b1, w2, b2,
    )
    return vjp(g)


_ln_mlp.defvjp(_ln_mlp_fwd, _ln_mlp_bwd)


def fused_ln_mlp(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    *,
    eps: float,
    residual: bool = True,
    out_dtype=None,
) -> jnp.ndarray:
    """``x + fc2(gelu_exact(fc1(LN(x))))`` in one HBM round-trip.

    x: (..., D); w1: (D, Dh); w2: (Dh, D). Weights should already carry the
    compute dtype (bf16 on TPU). With ``residual=False`` returns just the
    MLP(LN(x)) branch.
    """
    if out_dtype is None:
        out_dtype = x.dtype
    return _ln_mlp(x, scale, bias, w1, b1, w2, b2, float(eps), residual, out_dtype)


# ---------------------------------------------------------------------------
# LN → matmul (the pre-attention LN fused into the qkv projection)
# ---------------------------------------------------------------------------
def _ln_matmul_kernel(x_ref, scale_ref, bias_ref, w_ref, b_ref, o_ref, *, eps):
    xn = _ln_rows_f32(x_ref[...], scale_ref[...], bias_ref[...], eps)
    y = jax.lax.dot_general(
        xn.astype(w_ref.dtype), w_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    o_ref[...] = (y + b_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _ln_matmul_fwd_impl(x, scale, bias, w, b, eps, out_dtype):
    shape = x.shape
    D = shape[-1]
    F = w.shape[-1]
    R = x.size // D
    x2 = x.reshape(R, D)
    interpret = jax.default_backend() != "tpu"
    TM = 256 if not interpret else max(R, 1)
    Rp = _round_up(max(R, 1), TM)
    if Rp != R:
        x2 = jnp.pad(x2, ((0, Rp - R), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ln_matmul_kernel, eps=float(eps)),
        out_shape=jax.ShapeDtypeStruct((Rp, F), out_dtype),
        grid=(Rp // TM,),
        in_specs=[
            pl.BlockSpec((TM, D), lambda r: (r, 0), memory_space=_VMEM),
            pl.BlockSpec((1, D), lambda r: (0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, D), lambda r: (0, 0), memory_space=_VMEM),
            pl.BlockSpec((D, F), lambda r: (0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, F), lambda r: (0, 0), memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec((TM, F), lambda r: (r, 0), memory_space=_VMEM),
        interpret=interpret,
    )(x2, scale[None, :], bias[None, :], w, b[None, :])
    if Rp != R:
        out = out[:R]
    return out.reshape(shape[:-1] + (F,))


def _ln_matmul_xla_reference(x, scale, bias, w, b, eps, out_dtype):
    xn = _ln_rows_f32(x, scale, bias, eps)
    y = jnp.dot(xn.astype(w.dtype), w, preferred_element_type=jnp.float32)
    return (y + b.astype(jnp.float32)).astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _ln_matmul(x, scale, bias, w, b, eps, out_dtype):
    return _ln_matmul_fwd_impl(x, scale, bias, w, b, eps, out_dtype)


def _ln_matmul_vfwd(x, scale, bias, w, b, eps, out_dtype):
    return (
        _ln_matmul_fwd_impl(x, scale, bias, w, b, eps, out_dtype),
        (x, scale, bias, w, b),
    )


def _ln_matmul_vbwd(eps, out_dtype, res, g):
    x, scale, bias, w, b = res
    _, vjp = jax.vjp(
        lambda *a: _ln_matmul_xla_reference(*a, eps, out_dtype),
        x, scale, bias, w, b,
    )
    return vjp(g)


_ln_matmul.defvjp(_ln_matmul_vfwd, _ln_matmul_vbwd)


def fused_ln_matmul(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    *,
    eps: float,
    out_dtype=None,
) -> jnp.ndarray:
    """``LN(x) @ w + b`` in one kernel — the pre-attention LayerNorm rides
    the qkv projection's matmul instead of paying its own HBM round-trip
    on the slow convert+reduce path. x: (..., D); w: (D, F)."""
    if out_dtype is None:
        out_dtype = x.dtype
    return _ln_matmul(x, scale, bias, w, b, float(eps), out_dtype)

