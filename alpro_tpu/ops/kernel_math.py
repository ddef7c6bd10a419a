"""Shared in-kernel math for the Pallas kernel files.

One definition of the fp32 one-pass LayerNorm statistics (identical to
`ops/layers.py::layernorm_apply` up to the output cast) and the erf-form
GELU, so a numerics fix lands everywhere at once instead of diverging
across kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ln_rows_f32(x, scale, bias, eps):
    """fp32 one-pass LN over the last axis; returns fp32 (caller casts)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0
    )
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def erf_f32(x):
    """fp32 erf via Abramowitz–Stegun 7.1.26 (max abs error 1.5e-7 — below
    fp32 round-off for the GELU use). Mosaic has no erf primitive on this
    toolchain; this uses only exp/divide."""
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    e = 1.0 - poly * jnp.exp(-a * a)
    return jnp.where(x < 0.0, -e, e)


def gelu_exact_f32(x):
    """x·Φ(x) with the exact-erf CDF (jax.nn.gelu(approximate=False))."""
    return x * 0.5 * (1.0 + erf_f32(x * (2.0 ** -0.5)))
