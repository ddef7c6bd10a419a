"""Fused LN→MLP→residual kernel vs the module path (interpret on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from alpro_tpu.ops.pallas_ln_mlp import _ln_mlp_xla_reference, fused_ln_mlp


def _mk(rng, *shape):
    return jnp.asarray(rng.randn(*shape).astype(np.float32))


def test_matches_module_path():
    """Kernel output == LayerNorm + Mlp modules + residual on fp32."""
    import flax.linen as nn

    from alpro_tpu.ops.layers import LayerNorm, Mlp

    rng = np.random.RandomState(0)
    R, D, Dh = 9, 16, 32
    x = _mk(rng, R, D)

    class Tail(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = LayerNorm(1e-6, name="norm2")(x)
            return x + Mlp(Dh, name="mlp")(y)

    params = Tail().init(jax.random.PRNGKey(1), x)
    want = Tail().apply(params, x)

    p = params["params"]
    got = fused_ln_mlp(
        x,
        p["norm2"]["scale"], p["norm2"]["bias"],
        p["mlp"]["fc1"]["kernel"], p["mlp"]["fc1"]["bias"],
        p["mlp"]["fc2"]["kernel"], p["mlp"]["fc2"]["bias"],
        eps=1e-6,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_no_residual_and_reference():
    rng = np.random.RandomState(1)
    R, D, Dh = 7, 8, 24
    x = _mk(rng, 2, R, D)  # >2D leading shape
    args = (
        _mk(rng, D), _mk(rng, D), _mk(rng, D, Dh), _mk(rng, Dh),
        _mk(rng, Dh, D), _mk(rng, D),
    )
    got = fused_ln_mlp(x, *args, eps=1e-5, residual=False)
    want = _ln_mlp_xla_reference(x, *args, 1e-5, False, x.dtype)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_gradients_match_reference():
    rng = np.random.RandomState(2)
    R, D, Dh = 6, 8, 16
    x = _mk(rng, R, D)
    args = (
        _mk(rng, D), _mk(rng, D), _mk(rng, D, Dh), _mk(rng, Dh),
        _mk(rng, Dh, D), _mk(rng, D),
    )

    def loss_fused(x, *a):
        return jnp.sum(fused_ln_mlp(x, *a, eps=1e-6) ** 2)

    def loss_ref(x, *a):
        return jnp.sum(_ln_mlp_xla_reference(x, *a, 1e-6, True, x.dtype) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 3, 5))(x, *args)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 3, 5))(x, *args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-3
        )


def test_full_fused_serving_path_equals_xla():
    """All three block-level fused impls (LN+qkv matmul → packed-qkv attn →
    folded proj·temporal_fc; fused LN-MLP tail) in interpret mode vs the
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
            **kw, attn_impl="fused_ln_qkv", temporal_attn_impl="fused_ln_qkv",
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
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x), atol=3e-5)


def test_divided_block_fused_equals_xla():
    """TimeSformer with mlp_impl='fused' (interpret) == 'xla', same params."""
    from alpro_tpu.models import TimeSformer, TimeSformerConfig

    kw = dict(
        img_size=32, patch_size=16, num_frames=3, embed_dim=16, depth=2,
        num_heads=2, drop_path_rate=0.0,
    )
    x = jnp.asarray(
        np.random.RandomState(3).randn(2, 3, 32, 32, 3).astype(np.float32)
    )
    m_x = TimeSformer(TimeSformerConfig(**kw, mlp_impl="xla"))
    m_f = TimeSformer(TimeSformerConfig(**kw, mlp_impl="fused"))
    params = m_x.init({"params": jax.random.PRNGKey(0)}, x)
    params_f = m_f.init({"params": jax.random.PRNGKey(0)}, x)
    # parameter twins must produce the identical tree AND identical values
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, params_f,
    )
    out_x = m_x.apply(params, x)
    out_f = m_f.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_x), atol=2e-5
    )
