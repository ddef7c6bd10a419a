"""Fused preprocess: raw uint8 frames → embedded patch tokens.

The north-star decode→embed pipeline stage (SURVEY.md §2.9), split TPU-wise:
  * normalize (x/255 − mean)/std runs as XLA elementwise (one fused pass over
    the pixel tensor, uint8 → bf16);
  * the *patchify + patch-embedding matmul* — the expensive part, because the
    strided (ph, p, pw, p·C) → (N, p·p·C) transpose is pathological for XLA
    on TPU — runs as a Pallas kernel that never materializes the transposed
    patch tensor in HBM. Transpose-free formulation: for each block of p
    pixel rows, out[pw] = Σ_i row_i.reshape(wp, p·C) @ W[i·p·C:(i+1)·p·C],
    accumulating p small MXU matmuls (only contiguous reshapes).

Differentiable: custom_vjp recomputes patch vectors with XLA ops on the
backward pass for dkernel/dbias (pixels carry no gradient).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None


def _kernel(rows_ref, kern_ref, bias_ref, out_ref, *, wp: int, p: int, C: int):
    """rows block: (1, p, W·C) normalized pixels; out block: (1, wp, D)."""
    pc = p * C
    x = rows_ref[0].reshape(p, wp, pc)
    acc = jnp.zeros((wp, out_ref.shape[-1]), jnp.float32)
    for i in range(p):
        acc = acc + jnp.dot(
            x[i], kern_ref[i * pc : (i + 1) * pc, :],
            preferred_element_type=jnp.float32,
        )
    out_ref[0] = (acc + bias_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


def _normalize(raw, mean, std, dtype):
    x = raw.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
    return x.astype(dtype)


def _fwd_impl(raw, kernel, bias, mean, std):
    B, T, H, W, C = raw.shape
    p = int(round((kernel.shape[0] / C) ** 0.5))
    hp, wp = H // p, W // p
    N = hp * wp
    D = kernel.shape[1]

    frames = _normalize(raw, mean, std, kernel.dtype).reshape(B * T, H, W * C)
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_kernel, wp=wp, p=p, C=C),
        out_shape=jax.ShapeDtypeStruct((B * T * hp, wp, D), kernel.dtype),
        grid=(B * T, hp),
        in_specs=[
            pl.BlockSpec((1, p, W * C), lambda i, j: (i, j, 0), memory_space=_VMEM),
            pl.BlockSpec(memory_space=_VMEM),
            pl.BlockSpec(memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, wp, D), lambda i, j: (i * hp + j, 0, 0), memory_space=_VMEM
        ),
        interpret=interpret,
    )(frames, kernel, bias.reshape(1, D))
    return out.reshape(B, T, N, D)


def _patches_xla(raw, p, mean, std):
    B, T, H, W, C = raw.shape
    hp, wp = H // p, W // p
    x = _normalize(raw, mean, std, jnp.float32)
    x = x.reshape(B, T, hp, p, wp, p, C).transpose(0, 1, 2, 4, 3, 5, 6)
    return x.reshape(B, T, hp * wp, p * p * C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_patchify_embed(raw, kernel, bias, mean, std):
    """raw: (B, T, H, W, C) uint8; kernel: (p·p·C, D) in (i, j, c) row order;
    bias: (D,). Returns (B, T, N, D) in kernel.dtype — numerically equal to
    normalize → patchify → matmul."""
    return _fwd_impl(raw, kernel, bias, mean, std)


def _fwd(raw, kernel, bias, mean, std):
    return _fwd_impl(raw, kernel, bias, mean, std), (raw, kernel)


def _bwd(mean, std, res, g):
    raw, kernel = res
    p = int(round((kernel.shape[0] / raw.shape[-1]) ** 0.5))
    patches = _patches_xla(raw, p, mean, std)  # (B, T, N, K) fp32
    gf = g.astype(jnp.float32)
    dkernel = jnp.einsum("btnk,btnd->kd", patches, gf).astype(kernel.dtype)
    dbias = jnp.sum(gf, axis=(0, 1, 2)).astype(kernel.dtype)
    return None, dkernel, dbias


fused_patchify_embed.defvjp(_fwd, _bwd)
