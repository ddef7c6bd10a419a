"""Whole-attention-chain fused block kernels vs XLA references (interpret)."""

import numpy as np
import jax
import jax.numpy as jnp

from alpro_tpu.ops.pallas_fused_block import (
    _spatial_block_xla_reference,
    _temporal_block_xla_reference,
    fused_spatial_block,
    fused_temporal_block,
)


def _mk(rng, *shape):
    return jnp.asarray(rng.randn(*shape).astype(np.float32))


def test_spatial_block_matches_reference():
    rng = np.random.RandomState(0)
    M, S, H, hd = 3, 9, 2, 8
    D = H * hd
    x = _mk(rng, M, S, D)
    args = (_mk(rng, D), _mk(rng, D), _mk(rng, D, 3 * D) * 0.2,
            _mk(rng, 3 * D) * 0.1, _mk(rng, D, D) * 0.2, _mk(rng, D) * 0.1)
    for residual in (False, True):
        got = fused_spatial_block(x, *args, H, eps=1e-6, residual=residual)
        want = _spatial_block_xla_reference(
            x, *args, 1e-6, hd ** -0.5, H, residual
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-5
        )


def test_temporal_block_matches_reference():
    rng = np.random.RandomState(1)
    B, T, N, H, hd = 2, 5, 6, 3, 8
    D = H * hd
    x = _mk(rng, B, T, N, D)
    args = (_mk(rng, D), _mk(rng, D), _mk(rng, D, 3 * D) * 0.2,
            _mk(rng, 3 * D) * 0.1, _mk(rng, D, D) * 0.2, _mk(rng, D) * 0.1)
    got = fused_temporal_block(x, *args, H, eps=1e-6)
    want = _temporal_block_xla_reference(x, *args, 1e-6, hd ** -0.5, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_temporal_block_gradients():
    rng = np.random.RandomState(2)
    B, T, N, H, hd = 2, 3, 4, 2, 8
    D = H * hd
    x = _mk(rng, B, T, N, D)
    args = (_mk(rng, D), _mk(rng, D), _mk(rng, D, 3 * D) * 0.2,
            _mk(rng, 3 * D) * 0.1, _mk(rng, D, D) * 0.2, _mk(rng, D) * 0.1)
    g1 = jax.grad(
        lambda x: jnp.sum(fused_temporal_block(x, *args, H, eps=1e-6) ** 2)
    )(x)
    g2 = jax.grad(
        lambda x: jnp.sum(
            _temporal_block_xla_reference(x, *args, 1e-6, hd ** -0.5, H) ** 2
        )
    )(x)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-3
    )


def test_model_fused_block_equals_xla():
    """TimeSformer with both mega-kernels + fused MLP tail (interpret) vs the
    all-XLA module path, identical params."""
    from alpro_tpu.models import TimeSformer, TimeSformerConfig

    kw = dict(
        img_size=32, patch_size=16, num_frames=4, embed_dim=16, depth=2,
        num_heads=2, drop_path_rate=0.0,
    )
    x = jnp.asarray(
        np.random.RandomState(7).randn(2, 4, 32, 32, 3).astype(np.float32)
    )
    m_x = TimeSformer(
        TimeSformerConfig(
            **kw, attn_impl="xla", temporal_attn_impl="xla", mlp_impl="xla"
        )
    )
    m_f = TimeSformer(
        TimeSformerConfig(
            **kw, attn_impl="fused_block", temporal_attn_impl="fused_block",
            mlp_impl="fused",
        )
    )
    params = m_x.init({"params": jax.random.PRNGKey(0)}, x)
    params_f = m_f.init({"params": jax.random.PRNGKey(0)}, x)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, params_f,
    )
    out_x = m_x.apply(params, x)
    out_f = m_f.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x), atol=5e-5)
