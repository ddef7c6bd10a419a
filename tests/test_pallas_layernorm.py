"""Fused LayerNorm kernel: parity + grads vs the XLA LayerNorm (interpret on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from alpro_tpu.ops.layers import LayerNorm
from alpro_tpu.ops.pallas_layernorm import fused_layernorm


def _ref_ln(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, -1, keepdims=True) - mean * mean, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y * scale + bias


def test_fused_ln_matches_reference():
    rng = np.random.RandomState(0)
    for shape in [(7, 16), (3, 5, 32), (300, 64)]:
        x = jnp.asarray(rng.randn(*shape).astype(np.float32) * 3 + 1)
        s = jnp.asarray(rng.randn(shape[-1]).astype(np.float32))
        b = jnp.asarray(rng.randn(shape[-1]).astype(np.float32))
        want = _ref_ln(x, s, b, 1e-6)
        got = fused_layernorm(x, s, b, 1e-6, jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_fused_ln_bf16_output():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(40, 32).astype(np.float32), jnp.bfloat16)
    s = jnp.ones(32)
    b = jnp.zeros(32)
    got = fused_layernorm(x, s, b, 1e-6, jnp.bfloat16)
    assert got.dtype == jnp.bfloat16
    want = _ref_ln(x, s, b, 1e-6).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2
    )


def test_fused_ln_gradients_match():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(20, 16).astype(np.float32))
    s = jnp.asarray(rng.randn(16).astype(np.float32))
    b = jnp.asarray(rng.randn(16).astype(np.float32))

    def loss_fused(x, s, b):
        return (fused_layernorm(x, s, b, 1e-6, jnp.float32) ** 2).sum()

    def loss_ref(x, s, b):
        return (_ref_ln(x, s, b, 1e-6) ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, s, b)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, s, b)
    for a, w in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(w), atol=1e-4, rtol=1e-4)


def test_layernorm_module_pallas_impl_matches_xla_impl():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(6, 9, 24).astype(np.float32))
    ln_x = LayerNorm(1e-6, impl="xla")
    ln_p = LayerNorm(1e-6, impl="pallas")
    params = ln_x.init(jax.random.PRNGKey(0), x)
    a = ln_x.apply(params, x)
    bb = ln_p.apply(params, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-5, rtol=1e-5)
