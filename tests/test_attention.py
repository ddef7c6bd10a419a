"""Attention op tests: XLA path vs fused Pallas kernel (interpret on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alpro_tpu.ops.attention import multi_head_attention
from alpro_tpu.ops.pallas_attn import fused_attention


def _mk(B=2, H=3, Sq=17, Sk=23, D=8, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, H, Sq, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, Sk, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, Sk, D).astype(np.float32))
    return q, k, v


def test_pallas_matches_xla_unmasked():
    q, k, v = _mk()
    want = multi_head_attention(q, k, v, impl="xla")
    got = fused_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pallas_matches_xla_masked():
    q, k, v = _mk(seed=1)
    mask = np.ones((2, 23), np.int32)
    mask[0, 10:] = 0
    mask[1, 5:] = 0
    want = multi_head_attention(q, k, v, key_mask=jnp.asarray(mask), impl="xla")
    got = fused_attention(q, k, v, key_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pallas_gradients_match_xla():
    q, k, v = _mk(B=1, H=2, Sq=9, Sk=9, D=4, seed=2)
    mask = jnp.asarray(np.ones((1, 9), np.int32).at if False else np.ones((1, 9), np.int32))

    def loss_pallas(q, k, v):
        return jnp.sum(fused_attention(q, k, v, key_mask=mask) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(multi_head_attention(q, k, v, key_mask=mask, impl="xla") ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_xla_softmax_rows_sum_to_one_property():
    # output of attention with v=identity-ish must stay within value range
    q, k, v = _mk(seed=3)
    out = multi_head_attention(q, k, v, impl="xla")
    assert float(jnp.max(jnp.abs(out))) <= float(jnp.max(jnp.abs(v))) * v.shape[2]


def test_auto_dispatch_cpu_is_xla():
    # on CPU, auto must not pick pallas (compiled pallas is TPU-only)
    q, k, v = _mk(Sq=128, Sk=128)
    out = multi_head_attention(q, k, v, impl="auto")
    want = multi_head_attention(q, k, v, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-6)
