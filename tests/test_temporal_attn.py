"""Roll-based temporal attention kernel vs the XLA einsum reference."""

import numpy as np
import jax
import jax.numpy as jnp

from alpro_tpu.ops.pallas_temporal_attn import (
    _xla_reference,
    temporal_attention_roll,
)


def _mk(B=2, T=4, N=9, D=32, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(B, T, N, 3 * D).astype(np.float32))


def test_matches_xla_reference():
    qkv = _mk()
    want = _xla_reference(qkv, num_heads=4)
    got = temporal_attention_roll(qkv, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_matches_with_nonpow2_frames():
    qkv = _mk(B=1, T=3, N=5, D=16, seed=1)
    want = _xla_reference(qkv, num_heads=2)
    got = temporal_attention_roll(qkv, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_gradients_match_xla():
    qkv = _mk(B=1, T=3, N=4, D=16, seed=2)

    gf = jax.grad(lambda x: jnp.sum(temporal_attention_roll(x, 2) ** 2))(qkv)
    gx = jax.grad(lambda x: jnp.sum(_xla_reference(x, 2) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), atol=1e-4)


def test_each_patch_independent():
    """Changing patch n's pixels must not affect other patches' outputs."""
    qkv = _mk(B=1, T=4, N=6, D=16, seed=3)
    out1 = temporal_attention_roll(qkv, 2)
    qkv2 = qkv.at[:, :, 2, :].add(1.0)
    out2 = temporal_attention_roll(qkv2, 2)
    mask = np.ones(6, bool)
    mask[2] = False
    np.testing.assert_allclose(
        np.asarray(out1)[:, :, mask], np.asarray(out2)[:, :, mask], atol=1e-6
    )
    assert not np.allclose(np.asarray(out1)[:, :, 2], np.asarray(out2)[:, :, 2])


def test_divided_block_circulant_impl_matches_xla_impl():
    """The circulant temporal lowering wired into DividedSTBlock is
    parameter-compatible and numerically equal to the relayout+einsum path."""
    import jax
    import jax.numpy as jnp

    from alpro_tpu.models import TimeSformer, TimeSformerConfig

    base = dict(
        img_size=32, patch_size=16, num_frames=4, embed_dim=48, depth=2,
        num_heads=4, drop_path_rate=0.0,
    )
    m_xla = TimeSformer(TimeSformerConfig(temporal_attn_impl="xla", **base))
    m_circ = TimeSformer(TimeSformerConfig(temporal_attn_impl="circulant", **base))
    m_packed = TimeSformer(TimeSformerConfig(temporal_attn_impl="packed", **base))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 4, 32, 32, 3).astype(np.float32))
    params = m_xla.init({"params": jax.random.PRNGKey(0)}, x)
    # identical param trees: the circulant module reuses qkv/proj names
    p2 = m_circ.init({"params": jax.random.PRNGKey(0)}, x)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
    a = m_xla.apply(params, x)
    b = m_circ.apply(params, x)
    c = m_packed.apply(params, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-5, rtol=1e-5)


def test_packed_matches_reference_math():
    import jax.numpy as jnp

    from alpro_tpu.ops.pallas_temporal_attn import (
        _xla_reference,
        temporal_attention_packed,
    )

    rng = np.random.RandomState(3)
    for B, T, N, D, H in [(2, 4, 9, 24, 4), (1, 8, 33, 16, 2), (2, 3, 16, 12, 3)]:
        qkv = jnp.asarray(rng.randn(B, T, N, 3 * D).astype(np.float32) * 0.3)
        ref = _xla_reference(qkv, H)
        got = temporal_attention_packed(qkv, H, pack=4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_packed_gradients_match_reference_math():
    import jax
    import jax.numpy as jnp

    from alpro_tpu.ops.pallas_temporal_attn import (
        _xla_reference,
        temporal_attention_packed,
    )

    rng = np.random.RandomState(4)
    qkv = jnp.asarray(rng.randn(2, 4, 9, 36).astype(np.float32) * 0.3)
    g_ref = jax.grad(lambda x: (_xla_reference(x, 3) ** 2).sum())(qkv)
    g_got = jax.grad(
        lambda x: (temporal_attention_packed(x, 3, pack=4) ** 2).sum()
    )(qkv)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), atol=1e-4, rtol=1e-4)


def test_temporal_auto_impl_gate():
    """auto → fused kernel only inside its measured envelope: T ≤ 8 (the
    kernel's (1, T, N, lane) VMEM blocks exceed the 16 MB scoped-vmem limit
    at T=16 — 34.18 MB measured, Mosaic compile failure found by
    benchmarks/qa_latency.py), lane-legal dims, serving-only, no sp."""
    from alpro_tpu.models.timesformer import _temporal_auto_impl

    # flagship retrieval/pretrain: fused
    assert _temporal_auto_impl(8, 768, 12, True, None, True) == "fused_qkv_fold"
    assert _temporal_auto_impl(4, 768, 12, True, None, True) == "fused_qkv_fold"
    # QA flagship T=16: must fall back (scoped-vmem)
    assert _temporal_auto_impl(16, 768, 12, True, None, True) == "xla"
    # training / sp-sharded / odd dims / off-TPU: XLA
    assert _temporal_auto_impl(8, 768, 12, False, None, True) == "xla"
    assert _temporal_auto_impl(8, 768, 12, True, "sp", True) == "xla"
    assert _temporal_auto_impl(8, 768, 16, True, None, True) == "xla"  # hd=48
    assert _temporal_auto_impl(8, 768, 12, True, None, False) == "xla"
