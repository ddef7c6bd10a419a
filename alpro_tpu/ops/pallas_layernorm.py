"""Fused LayerNorm Pallas kernel.

Profiling the flagship embed (docs/PERF.md round 2) shows the LN
convert+reduce fusions at ~1.7 ms/block (~22 ms/step) — an effective
~86 GB/s over tensors that are pure bandwidth work. This kernel reads the
bf16 activations once per row tile, computes fp32 statistics in VMEM, and
writes the normalized bf16 output — one HBM round-trip at full tile shapes.

Numerics match `ops/layers.py::LayerNorm` exactly: one-pass fp32
E[x²]−E[x]² statistics, fp32 scale/bias application, cast on write.
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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)  # (Rb, D)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean, 0.0)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def _fwd_impl(x, scale, bias, eps, out_dtype):
    shape = x.shape
    D = shape[-1]
    R = x.size // D
    x2 = x.reshape(R, D)
    Rb = 256
    Rp = _round_up(max(R, 1), Rb)
    x2 = jnp.pad(x2, ((0, Rp - R), (0, 0)))
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=float(eps)),
        out_shape=jax.ShapeDtypeStruct((Rp, D), out_dtype),
        grid=(Rp // Rb,),
        in_specs=[
            pl.BlockSpec((Rb, D), lambda r: (r, 0), memory_space=_VMEM),
            pl.BlockSpec((1, D), lambda r: (0, 0), memory_space=_VMEM),
            pl.BlockSpec((1, D), lambda r: (0, 0), memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec((Rb, D), lambda r: (r, 0), memory_space=_VMEM),
        interpret=interpret,
    )(x2, scale.reshape(1, D), bias.reshape(1, D))
    return out[:R].reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_layernorm(x, scale, bias, eps, out_dtype):
    """LayerNorm over the last axis. scale/bias: (D,). Returns out_dtype."""
    return _fwd_impl(x, scale, bias, eps, out_dtype)


def _fwd(x, scale, bias, eps, out_dtype):
    return _fwd_impl(x, scale, bias, eps, out_dtype), (x, scale)


def _bwd(eps, out_dtype, res, g):
    x, scale = res
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0
    )
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * rstd
    gs = gf * scale.astype(jnp.float32)
    dx = rstd * (
        gs
        - jnp.mean(gs, axis=-1, keepdims=True)
        - xhat * jnp.mean(gs * xhat, axis=-1, keepdims=True)
    )
    reduce_axes = tuple(range(x.ndim - 1))
    dscale = jnp.sum(gf * xhat, axis=reduce_axes)
    dbias = jnp.sum(gf, axis=reduce_axes)
    return (
        dx.astype(x.dtype),
        dscale.astype(scale.dtype),
        dbias.astype(scale.dtype),
    )


fused_layernorm.defvjp(_fwd, _bwd)
