"""Fused normalize+patchify+embed kernel vs the XLA path (uint8 inputs)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from alpro_tpu.models import TimeSformer, TimeSformerConfig
from alpro_tpu.ops.pallas_preprocess import fused_patchify_embed

CFG = TimeSformerConfig(
    img_size=48, patch_size=16, num_frames=2, embed_dim=32, depth=1,
    num_heads=4, drop_path_rate=0.0,
)


def test_fused_kernel_matches_xla_math():
    rng = np.random.RandomState(0)
    raw = rng.randint(0, 255, (2, 2, 48, 48, 3)).astype(np.uint8)
    K = 16 * 16 * 3
    kernel = jnp.asarray(rng.randn(K, 32).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.randn(32).astype(np.float32) * 0.01)
    mean, std = CFG.pixel_mean, CFG.pixel_std

    got = fused_patchify_embed(jnp.asarray(raw), kernel, bias, mean, std)

    x = raw.astype(np.float32) / 255.0
    x = (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    v = x.reshape(2, 2, 3, 16, 3, 16, 3).transpose(0, 1, 2, 4, 3, 5, 6).reshape(2, 2, 9, K)
    want = v @ np.asarray(kernel) + np.asarray(bias)

    assert got.shape == (2, 2, 9, 32)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


def test_fused_kernel_gradients():
    rng = np.random.RandomState(1)
    raw = jnp.asarray(rng.randint(0, 255, (1, 2, 48, 48, 3)).astype(np.uint8))
    K = 16 * 16 * 3
    kernel = jnp.asarray(rng.randn(K, 32).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.randn(32).astype(np.float32) * 0.01)
    mean, std = CFG.pixel_mean, CFG.pixel_std

    def loss_fused(k, b):
        return jnp.sum(fused_patchify_embed(raw, k, b, mean, std) ** 2)

    def loss_xla(k, b):
        x = raw.astype(jnp.float32) / 255.0
        x = (x - jnp.asarray(mean)) / jnp.asarray(std)
        v = x.reshape(1, 2, 3, 16, 3, 16, 3).transpose(0, 1, 2, 4, 3, 5, 6).reshape(1, 2, 9, K)
        return jnp.sum((v @ k + b) ** 2)

    gk_f, gb_f = jax.grad(loss_fused, argnums=(0, 1))(kernel, bias)
    gk_x, gb_x = jax.grad(loss_xla, argnums=(0, 1))(kernel, bias)
    np.testing.assert_allclose(np.asarray(gk_f), np.asarray(gk_x), rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(gb_f), np.asarray(gb_x), rtol=1e-3, atol=1e-2)


def test_fold_uint8_norm_matches_literal_normalize():
    """fold_uint8_norm='on' (normalize folded into the embed matmul, uint8
    relayout) == the literal /255-mean/std path, for both the raw 5-D and
    the pre-patchified 4-D input; 'auto' under fp32 stays on the literal
    path bit-exactly."""
    rng = np.random.RandomState(3)
    raw = rng.randint(0, 255, (2, 2, 48, 48, 3)).astype(np.uint8)
    m_off = TimeSformer(dataclasses.replace(CFG, fold_uint8_norm="off"))
    m_on = TimeSformer(dataclasses.replace(CFG, fold_uint8_norm="on"))
    params = m_off.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(raw))
    want = np.asarray(m_off.apply(params, jnp.asarray(raw)))
    got = np.asarray(m_on.apply(params, jnp.asarray(raw)))
    np.testing.assert_allclose(got, want, atol=1e-4)

    K = 16 * 16 * 3
    v = (
        raw.reshape(2, 2, 3, 16, 3, 16, 3)
        .transpose(0, 1, 2, 4, 3, 5, 6)
        .reshape(2, 2, 9, K)
    )
    got4 = np.asarray(m_on.apply(params, jnp.asarray(v)))
    # 4-D folded ≡ 5-D folded (same math after the host-side repack)
    np.testing.assert_allclose(got4, got, atol=0.0)

    m_auto = TimeSformer(CFG)  # fp32 'auto' → literal path, bit-identical
    auto = np.asarray(m_auto.apply(params, jnp.asarray(raw)))
    assert np.array_equal(auto, want)


def test_model_uint8_fused_equals_float_path():
    """TimeSformer(uint8, fused on) == TimeSformer(pre-normalized float)."""
    rng = np.random.RandomState(2)
    raw = rng.randint(0, 255, (2, 2, 48, 48, 3)).astype(np.uint8)

    cfg_on = dataclasses.replace(CFG, fused_patchify="on")
    cfg_off = dataclasses.replace(CFG, fused_patchify="off")
    m_on = TimeSformer(cfg_on)
    m_off = TimeSformer(cfg_off)
    params = m_on.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(raw))

    out_fused = m_on.apply(params, jnp.asarray(raw))
    out_uint8_xla = m_off.apply(params, jnp.asarray(raw))
    # pre-normalized float input through the same params
    x = raw.astype(np.float32) / 255.0
    x = (x - np.asarray(CFG.pixel_mean, np.float32)) / np.asarray(CFG.pixel_std, np.float32)
    out_float = m_off.apply(params, jnp.asarray(x))

    np.testing.assert_allclose(
        np.asarray(out_uint8_xla), np.asarray(out_float), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_float), atol=1e-4
    )
