"""Packed-qkv fused attention kernels vs XLA references (interpret on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from alpro_tpu.ops.pallas_qkv_attn import (
    _spatial_xla_reference,
    _temporal_xla_reference,
    fused_attention_qkv,
    fused_temporal_attention_qkv,
)


def test_spatial_qkv_matches_reference():
    rng = np.random.RandomState(0)
    B, S, H, hd = 3, 17, 4, 8
    qkv = jnp.asarray(rng.randn(B, S, 3 * H * hd).astype(np.float32))
    got = fused_attention_qkv(qkv, H)
    want = _spatial_xla_reference(qkv, H, hd ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_temporal_qkv_matches_reference():
    rng = np.random.RandomState(1)
    B, T, N, H, hd = 2, 5, 9, 3, 8
    qkv = jnp.asarray(rng.randn(B, T, N, 3 * H * hd).astype(np.float32))
    got = fused_temporal_attention_qkv(qkv, H)
    want = _temporal_xla_reference(qkv, H, hd ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_spatial_qkv_gradients():
    rng = np.random.RandomState(2)
    B, S, H, hd = 2, 11, 2, 8
    qkv = jnp.asarray(rng.randn(B, S, 3 * H * hd).astype(np.float32))

    g1 = jax.grad(lambda x: jnp.sum(fused_attention_qkv(x, H) ** 2))(qkv)
    g2 = jax.grad(
        lambda x: jnp.sum(_spatial_xla_reference(x, H, hd ** -0.5) ** 2)
    )(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_temporal_qkv_gradients():
    rng = np.random.RandomState(3)
    B, T, N, H, hd = 2, 4, 7, 2, 8
    qkv = jnp.asarray(rng.randn(B, T, N, 3 * H * hd).astype(np.float32))

    g1 = jax.grad(
        lambda x: jnp.sum(fused_temporal_attention_qkv(x, H) ** 2)
    )(qkv)
    g2 = jax.grad(
        lambda x: jnp.sum(_temporal_xla_reference(x, H, hd ** -0.5) ** 2)
    )(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_temporal_qkv_matches_bshd_model_path():
    """The packed-qkv temporal kernel must agree with the model's current
    relayout + einsum path (multi_head_attention_bshd) on identical inputs."""
    from alpro_tpu.ops.attention import multi_head_attention_bshd

    rng = np.random.RandomState(4)
    B, T, N, H, hd = 2, 4, 6, 3, 8
    D = H * hd
    qkv = jnp.asarray(rng.randn(B, T, N, 3 * D).astype(np.float32))
    got = fused_temporal_attention_qkv(qkv, H)

    x = jnp.moveaxis(qkv, 1, 2).reshape(B * N, T, 3 * D)
    q = x[..., :D].reshape(B * N, T, H, hd)
    k = x[..., D:2 * D].reshape(B * N, T, H, hd)
    v = x[..., 2 * D:].reshape(B * N, T, H, hd)
    o = multi_head_attention_bshd(q, k, v, impl="xla").reshape(B * N, T, D)
    want = jnp.moveaxis(o.reshape(B, N, T, D), 1, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
