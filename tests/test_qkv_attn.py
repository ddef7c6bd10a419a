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


def test_temporal_n_block_choice():
    """Grid N-splitting: flagship T ≤ 8 keeps the full-N block (the measured
    shape); above the VMEM envelope the largest in-envelope divisor wins."""
    from alpro_tpu.ops.pallas_qkv_attn import _temporal_n_block

    assert _temporal_n_block(8, 196) == 196     # proven flagship block
    assert _temporal_n_block(4, 196) == 196
    # Mosaic sublane rule: block dim ≡ 0 (mod 8) or equal to the array dim,
    # so splits are multiples of 8 on a cdiv grid (ragged tail masked)
    assert _temporal_n_block(16, 196) == 48     # 16·48 = 768 ≤ 784 envelope
    assert _temporal_n_block(16, 98) == 48
    assert _temporal_n_block(32, 196) == 24     # 32·24 = 768 ≤ 784
    assert _temporal_n_block(16, 13) == 13      # 16·13 = 208 ≤ envelope


def test_temporal_qkv_n_blocked_matches_reference():
    """T above the VMEM envelope splits N across grid steps (attention is
    per-patch over T, so the split is exact): T=16, N=98 → three 48-patch
    blocks with a masked ragged tail (98 = 2·48 + 2). Parity + grads vs the
    XLA reference through the split."""
    from alpro_tpu.ops.pallas_qkv_attn import _temporal_n_block

    B, T, N, H, hd = 2, 16, 98, 3, 8
    assert _temporal_n_block(T, N) == 48  # cdiv(98, 48) = 3, tail masked
    rng = np.random.RandomState(7)
    qkv = jnp.asarray(rng.randn(B, T, N, 3 * H * hd).astype(np.float32))
    got = fused_temporal_attention_qkv(qkv, H)
    want = _temporal_xla_reference(qkv, H, hd ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    g1 = jax.grad(
        lambda x: jnp.sum(fused_temporal_attention_qkv(x, H) ** 2)
    )(qkv)
    g2 = jax.grad(
        lambda x: jnp.sum(_temporal_xla_reference(x, H, hd ** -0.5) ** 2)
    )(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


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


def test_spatial_qkv_proj_matches_reference():
    from alpro_tpu.ops.pallas_qkv_attn import (
        _spatial_qkv_proj_xla_reference,
        fused_attention_qkv_proj,
    )

    rng = np.random.RandomState(5)
    M, S, H, hd = 3, 9, 4, 8
    D = H * hd
    qkv = jnp.asarray(rng.randn(M, S, 3 * D).astype(np.float32))
    wp = jnp.asarray(rng.randn(D, D).astype(np.float32) * 0.2)
    bp = jnp.asarray(rng.randn(D).astype(np.float32) * 0.1)
    got = fused_attention_qkv_proj(qkv, wp, bp, H)
    want = _spatial_qkv_proj_xla_reference(qkv, wp, bp, H, hd ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_temporal_qkv_proj_matches_reference_and_grads():
    from alpro_tpu.ops.pallas_qkv_attn import (
        _temporal_qkv_proj_xla_reference,
        fused_temporal_attention_qkv_proj,
    )

    rng = np.random.RandomState(6)
    B, T, N, H, hd = 2, 4, 6, 3, 8
    D = H * hd
    qkv = jnp.asarray(rng.randn(B, T, N, 3 * D).astype(np.float32))
    we = jnp.asarray(rng.randn(D, D).astype(np.float32) * 0.2)
    be = jnp.asarray(rng.randn(D).astype(np.float32) * 0.1)
    got = fused_temporal_attention_qkv_proj(qkv, we, be, H)
    want = _temporal_qkv_proj_xla_reference(qkv, we, be, H, hd ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    g1 = jax.grad(
        lambda q: jnp.sum(fused_temporal_attention_qkv_proj(q, we, be, H) ** 2)
    )(qkv)
    g2 = jax.grad(
        lambda q: jnp.sum(
            _temporal_qkv_proj_xla_reference(q, we, be, H, hd ** -0.5) ** 2
        )
    )(qkv)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-3
    )


def test_model_fused_qkv_proj_equals_xla():
    from alpro_tpu.models import TimeSformer, TimeSformerConfig

    kw = dict(
        img_size=32, patch_size=16, num_frames=4, embed_dim=16, depth=2,
        num_heads=2, drop_path_rate=0.0,
    )
    x = jnp.asarray(
        np.random.RandomState(8).randn(2, 4, 32, 32, 3).astype(np.float32)
    )
    m_x = TimeSformer(
        TimeSformerConfig(**kw, attn_impl="xla", temporal_attn_impl="xla")
    )
    m_f = TimeSformer(
        TimeSformerConfig(
            **kw, attn_impl="fused_qkv_proj",
            temporal_attn_impl="fused_qkv_proj",
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


def test_cls_sideband_matches_reference():
    from alpro_tpu.ops.pallas_qkv_attn import (
        _spatial_cls_xla_reference,
        fused_attention_qkv_cls,
    )

    B, T, N, H, hd = 2, 3, 10, 2, 8
    D = H * hd
    rng = np.random.RandomState(3)
    qkv_x = jnp.asarray(rng.randn(B * T, N, 3 * D).astype(np.float32))
    qkv_c = jnp.asarray(rng.randn(B, 1, 3 * D).astype(np.float32))
    ox, oc = fused_attention_qkv_cls(qkv_x, qkv_c, H, T)
    rx, rc = _spatial_cls_xla_reference(qkv_x, qkv_c, H, hd ** -0.5, T)
    np.testing.assert_allclose(np.asarray(ox), np.asarray(rx), atol=1e-5)
    np.testing.assert_allclose(np.asarray(oc), np.asarray(rc), atol=1e-5)


def test_cls_sideband_gradients():
    from alpro_tpu.ops.pallas_qkv_attn import (
        _spatial_cls_xla_reference,
        fused_attention_qkv_cls,
    )

    B, T, N, H, hd = 1, 2, 6, 2, 4
    D = H * hd
    rng = np.random.RandomState(4)
    qkv_x = jnp.asarray(rng.randn(B * T, N, 3 * D).astype(np.float32))
    qkv_c = jnp.asarray(rng.randn(B, 1, 3 * D).astype(np.float32))

    def f(a, c):
        ox, oc = fused_attention_qkv_cls(a, c, H, T)
        return jnp.sum(ox ** 2) + jnp.sum(oc ** 2)

    def fr(a, c):
        ox, oc = _spatial_cls_xla_reference(a, c, H, hd ** -0.5, T)
        return jnp.sum(ox ** 2) + jnp.sum(oc ** 2)

    g1 = jax.grad(f, argnums=(0, 1))(qkv_x, qkv_c)
    g2 = jax.grad(fr, argnums=(0, 1))(qkv_x, qkv_c)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-4
        )


def test_model_cls_sideband_equals_default():
    """The serving cls-sideband spatial path must match the concat-based
    default bit-for-bit-ish (same params, deterministic, fp32)."""
    from alpro_tpu.models import TimeSformer, TimeSformerConfig

    kw = dict(
        img_size=32, patch_size=16, num_frames=4, embed_dim=16, depth=2,
        num_heads=2, drop_path_rate=0.0,
    )
    x = jnp.asarray(
        np.random.RandomState(9).randn(2, 4, 32, 32, 3).astype(np.float32)
    )
    m_d = TimeSformer(TimeSformerConfig(**kw))  # auto → VitAttention on CPU
    m_s = TimeSformer(TimeSformerConfig(**kw, attn_impl="cls_sideband"))
    params = m_d.init({"params": jax.random.PRNGKey(0)}, x)
    params_s = m_s.init({"params": jax.random.PRNGKey(0)}, x)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, params_s,
    )
    out_d = m_d.apply(params, x)
    out_s = m_s.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_d), atol=5e-5)
