"""Fused attention block kernel vs XLA reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from alpro_tpu.ops.pallas_block_attn import (
    _xla_reference,
    fused_attention_block,
)


def _mk(B=2, S=17, D=32, H=4, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, S, D).astype(np.float32))
    qkv_k = jnp.asarray(rng.randn(D, 3 * D).astype(np.float32) * 0.1)
    qkv_b = jnp.asarray(rng.randn(3 * D).astype(np.float32) * 0.01)
    proj_k = jnp.asarray(rng.randn(D, D).astype(np.float32) * 0.1)
    proj_b = jnp.asarray(rng.randn(D).astype(np.float32) * 0.01)
    return x, qkv_k, qkv_b, proj_k, proj_b, H


def test_matches_xla_unmasked():
    x, qkv_k, qkv_b, proj_k, proj_b, H = _mk()
    want = _xla_reference(x, qkv_k, qkv_b, proj_k, proj_b, H, None)
    got = fused_attention_block(x, qkv_k, qkv_b, proj_k, proj_b, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_matches_xla_masked():
    x, qkv_k, qkv_b, proj_k, proj_b, H = _mk(seed=1)
    mask = np.ones((2, 17), np.int32)
    mask[0, 9:] = 0
    mask[1, 4:] = 0
    want = _xla_reference(x, qkv_k, qkv_b, proj_k, proj_b, H, jnp.asarray(mask))
    got = fused_attention_block(
        x, qkv_k, qkv_b, proj_k, proj_b, H, jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_gradients_match_xla():
    x, qkv_k, qkv_b, proj_k, proj_b, H = _mk(B=1, S=9, D=16, H=2, seed=2)

    def loss_fused(x, qk, qb, pk, pb):
        return jnp.sum(fused_attention_block(x, qk, qb, pk, pb, H) ** 2)

    def loss_xla(x, qk, qb, pk, pb):
        return jnp.sum(_xla_reference(x, qk, qb, pk, pb, H, None) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, qkv_k, qkv_b, proj_k, proj_b)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(x, qkv_k, qkv_b, proj_k, proj_b)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_matches_vit_attention_module():
    """Same math as VitAttention with its checkpoint weight layout."""
    from alpro_tpu.models.timesformer import VitAttention

    rng = np.random.RandomState(3)
    B, S, D, H = 2, 11, 24, 4
    x = jnp.asarray(rng.randn(B, S, D).astype(np.float32))
    attn = VitAttention(H, attn_impl="xla")
    params = attn.init(jax.random.PRNGKey(0), x)
    want = attn.apply(params, x)

    p = params["params"]
    got = fused_attention_block(
        x, p["qkv"]["kernel"], p["qkv"]["bias"],
        p["proj"]["kernel"], p["proj"]["bias"], H,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
