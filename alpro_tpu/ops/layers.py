"""Shared NN building blocks (LayerNorm, MLP, DropPath) for the encoders.

Numerics notes for checkpoint parity with the torch reference:
  * GELU is the exact erf form (torch `nn.GELU()` / HF "gelu"), not the tanh
    approximation that flax defaults to.
  * LayerNorm statistics are computed in fp32 regardless of compute dtype
    (the MXU path runs bf16; LN in bf16 loses too much precision).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=False)


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics and configurable output dtype.

    impl: 'auto' (fused Pallas kernel on TPU for 128-multiple dims — one HBM
    round-trip instead of XLA's ~86 GB/s convert+reduce fusions, docs/PERF.md
    round 2) | 'xla' | 'pallas'.
    """

    epsilon: float = 1e-12
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        scale = self.param(
            "scale", nn.initializers.ones, (dim,), self.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (dim,), self.param_dtype
        )
        impl = self.impl
        if impl == "auto":
            # measured on v5e (docs/PERF.md round 2): XLA's convert+reduce
            # fusion (1.35 ms at 25k×768 bf16) edges out the Pallas kernel
            # (1.52 ms) — both ~110 GB/s, i.e. HBM-bound either way — and 37
            # kernel instances inflate the HLO past this sandbox's remote-
            # compile payload limit. Keep XLA; the kernel stays as a tested
            # opt-in.
            impl = "xla"
        if impl == "pallas":
            from alpro_tpu.ops.pallas_layernorm import fused_layernorm

            return fused_layernorm(x, scale, bias, float(self.epsilon), self.dtype)
        return layernorm_apply(x, scale, bias, self.epsilon, self.dtype)


def layernorm_apply(x, scale, bias, eps, out_dtype):
    """Functional LN with one-pass fp32 statistics (E[x²] − E[x]²) — the
    exact math of the `LayerNorm` module, shared with fused paths that hold
    raw parameters.

    ``mean`` and the raw variance carry the ``ln_stat`` remat tag: under
    ``remat_policy='dots_ln'`` (models/remat.py) these per-row scalars —
    1/D the activation size — are saved across the checkpoint boundary.
    They are tagged *before* any consumer (so the untagged reduce outputs
    feed nothing else and are dead code in the backward's recompute), and
    the tag sits on the raw ``mean_sq − mean²`` rather than on
    ``max(·, 0)``/``rsqrt`` outputs because the VJPs of those ops need
    their *operand* values — saving downstream of them would resurrect the
    reduces. Net: the recompute reads the activations once (normalize pass)
    instead of twice (statistics + normalize), removing the fp32
    convert+reduce family — the slow-population cost in the training
    profile (docs/PERF.md) — from every backward."""
    from jax.ad_checkpoint import checkpoint_name

    xf = x.astype(jnp.float32)
    mean = checkpoint_name(jnp.mean(xf, axis=-1, keepdims=True), "ln_stat")
    mean_sq = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    var_raw = checkpoint_name(mean_sq - jnp.square(mean), "ln_stat")
    var = jnp.maximum(var_raw, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(out_dtype)


class Mlp(nn.Module):
    """fc1 → GELU → drop → fc2 → drop (reference `timesformer/vit.py:49-65`)."""

    hidden_dim: int
    out_dim: Optional[int] = None
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        out_dim = self.out_dim or x.shape[-1]
        init = nn.initializers.truncated_normal(0.02)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, kernel_init=init, name="fc1")(x)
        x = gelu_exact(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        x = nn.Dense(out_dim, dtype=self.dtype, kernel_init=init, name="fc2")(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return x


class LNParams(nn.Module):
    """Parameter twin of `LayerNorm`: declares the identical {scale, bias}
    tree (same names, shapes, init, fp32 param dtype) without computing —
    for fused kernels that consume the raw parameters. Instantiating this
    under the same module name as a `LayerNorm` yields checkpoint-identical
    parameters."""

    @nn.compact
    def __call__(self, dim: int):
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        return scale, bias


class DenseParams(nn.Module):
    """Parameter twin of the `nn.Dense(kernel_init=truncated_normal(0.02))`
    used throughout the encoders: declares {kernel, bias} without applying.
    `zero_kernel` mirrors the zero-initialized temporal_fc variant."""

    features: int
    zero_kernel: bool = False
    # 'trunc' (ViT-style truncated_normal(0.02)) | 'normal' (BERT-style
    # normal(initializer_range))
    init: str = "trunc"
    init_std: float = 0.02

    @nn.compact
    def __call__(self, in_dim: int):
        if self.zero_kernel:
            init_fn = nn.initializers.zeros
        elif self.init == "normal":
            init_fn = nn.initializers.normal(self.init_std)
        else:
            init_fn = nn.initializers.truncated_normal(self.init_std)
        kernel = self.param(
            "kernel",
            init_fn,
            (in_dim, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return kernel, bias


class AttnParams(nn.Module):
    """Parameter twin of `VitAttention`/`TemporalNativeLayoutAttention`:
    the qkv (D→3D) and proj (D→D) Dense {kernel, bias} trees."""

    @nn.compact
    def __call__(self, dim: int):
        qkv = DenseParams(3 * dim, name="qkv")(dim)
        proj = DenseParams(dim, name="proj")(dim)
        return qkv, proj


class MlpParams(nn.Module):
    """Parameter twin of `Mlp`: fc1/fc2 {kernel, bias} with identical tree."""

    hidden_dim: int
    out_dim: Optional[int] = None

    @nn.compact
    def __call__(self, in_dim: int):
        out_dim = self.out_dim or in_dim
        p1 = DenseParams(self.hidden_dim, name="fc1")(in_dim)
        p2 = DenseParams(out_dim, name="fc2")(self.hidden_dim)
        return p1, p2


def drop_path_mask(
    rng: jax.Array, rate: float, batch_size: int, ndim: int
) -> jnp.ndarray:
    """Per-sample stochastic-depth keep mask, pre-scaled by 1/keep_prob.

    Reference semantics: `timesformer/vit_utils.py` DropPath — keep mask of
    shape (B, 1, ..., 1), output = x * mask / keep_prob.
    """
    keep_prob = 1.0 - rate
    shape = (batch_size,) + (1,) * (ndim - 1)
    keep = jax.random.bernoulli(rng, keep_prob, shape)
    return keep.astype(jnp.float32) / keep_prob


def apply_drop_path(
    x: jnp.ndarray,
    rate: float,
    deterministic: bool,
    rng: Optional[jax.Array],
) -> jnp.ndarray:
    if deterministic or rate == 0.0:
        return x
    mask = drop_path_mask(rng, rate, x.shape[0], x.ndim)
    return x * mask.astype(x.dtype)
