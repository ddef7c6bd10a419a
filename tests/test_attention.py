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


# ---- bshd-native kernel (head slices via BlockSpec, no transposes) --------
def _mk_bshd(B=2, H=3, Sq=17, Sk=23, hd=8, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, Sq, H * hd).astype(np.float32))
    k = jnp.asarray(rng.randn(B, Sk, H * hd).astype(np.float32))
    v = jnp.asarray(rng.randn(B, Sk, H * hd).astype(np.float32))
    return q, k, v


def _bshd_reference(q, k, v, H, mask=None):
    B, Sq, D = q.shape
    Sk = k.shape[1]
    hd = D // H
    out = multi_head_attention(
        jnp.moveaxis(q.reshape(B, Sq, H, hd), 1, 2),
        jnp.moveaxis(k.reshape(B, Sk, H, hd), 1, 2),
        jnp.moveaxis(v.reshape(B, Sk, H, hd), 1, 2),
        key_mask=mask, impl="xla",
    )
    return jnp.moveaxis(out, 1, 2).reshape(B, Sq, D)


def test_bshd_kernel_matches_xla():
    from alpro_tpu.ops.pallas_attn import fused_attention_bshd

    q, k, v = _mk_bshd()
    want = _bshd_reference(q, k, v, 3)
    got = fused_attention_bshd(q, k, v, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_bshd_kernel_matches_xla_masked():
    from alpro_tpu.ops.pallas_attn import fused_attention_bshd

    q, k, v = _mk_bshd(seed=2)
    mask = np.ones((2, 23), np.int32)
    mask[0, 10:] = 0
    mask[1, 5:] = 0
    want = _bshd_reference(q, k, v, 3, jnp.asarray(mask))
    got = fused_attention_bshd(q, k, v, 3, key_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_bshd_kernel_gradients():
    from alpro_tpu.ops.pallas_attn import fused_attention_bshd

    q, k, v = _mk_bshd(B=1, H=2, Sq=9, Sk=11, hd=4, seed=3)
    mask = jnp.asarray(np.array([[1] * 7 + [0] * 4], np.int32))

    def loss_pallas(q, k, v):
        return (fused_attention_bshd(q, k, v, 2, key_mask=mask) ** 2).sum()

    def loss_ref(q, k, v):
        return (_bshd_reference(q, k, v, 2, mask) ** 2).sum()

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_mha_bshd_pallas_branch_matches_xla_branch():
    from alpro_tpu.ops.attention import multi_head_attention_bshd

    rng = np.random.RandomState(5)
    B, S, H, hd = 2, 19, 3, 8
    q = jnp.asarray(rng.randn(B, S, H, hd).astype(np.float32))
    k = jnp.asarray(rng.randn(B, S, H, hd).astype(np.float32))
    v = jnp.asarray(rng.randn(B, S, H, hd).astype(np.float32))
    a = multi_head_attention_bshd(q, k, v, impl="xla")
    b = multi_head_attention_bshd(q, k, v, impl="pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_bf16_branch_matches_fp32_within_bf16_tol():
    """The bf16 fast path (scale folded into q, bf16 dot output) must agree
    with the fp32 reference to bf16 rounding, masked and unmasked, for both
    (B,H,S,D) and (B,S,H,D) entry points."""
    from alpro_tpu.ops.attention import multi_head_attention_bshd

    q, k, v = _mk(B=2, H=3, Sq=17, Sk=23, D=8, seed=4)
    mask = np.ones((2, 23), np.int32)
    mask[0, 9:] = 0
    for km in (None, jnp.asarray(mask)):
        want = multi_head_attention(q, k, v, key_mask=km, impl="xla")
        got = multi_head_attention(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16), key_mask=km, impl="xla",
        )
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want), atol=0.08
        )
        qb = jnp.moveaxis(q, 1, 2)
        want_b = multi_head_attention_bshd(
            qb, jnp.moveaxis(k, 1, 2), jnp.moveaxis(v, 1, 2),
            key_mask=km, impl="xla",
        )
        got_b = multi_head_attention_bshd(
            qb.astype(jnp.bfloat16),
            jnp.moveaxis(k, 1, 2).astype(jnp.bfloat16),
            jnp.moveaxis(v, 1, 2).astype(jnp.bfloat16),
            key_mask=km, impl="xla",
        )
        assert got_b.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got_b, np.float32), np.asarray(want_b), atol=0.08
        )
