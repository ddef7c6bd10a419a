"""Sequence-parallel temporal attention == unsharded attention on an
8-device mesh with the frame axis sharded."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from alpro_tpu.core.mesh import make_mesh
from alpro_tpu.ops.attention import multi_head_attention
from alpro_tpu.parallel.seq_parallel import sharded_temporal_attention


def test_sharded_temporal_attention_matches_unsharded():
    mesh = make_mesh()
    rng = np.random.RandomState(0)
    BN, T, D, H = 4, 16, 32, 4  # T sharded 8-way → 2 frames/device
    x = rng.randn(BN, T, D).astype(np.float32)
    qkv_k = rng.randn(D, 3 * D).astype(np.float32) * 0.1
    qkv_b = rng.randn(3 * D).astype(np.float32) * 0.01
    proj_k = rng.randn(D, D).astype(np.float32) * 0.1
    proj_b = rng.randn(D).astype(np.float32) * 0.01

    # unsharded reference
    hd = D // H
    qkv = x @ qkv_k + qkv_b
    qkv = qkv.reshape(BN, T, 3, H, hd)
    q = np.moveaxis(qkv[:, :, 0], 1, 2)
    k = np.moveaxis(qkv[:, :, 1], 1, 2)
    v = np.moveaxis(qkv[:, :, 2], 1, 2)
    attn = np.asarray(
        multi_head_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), impl="xla"
        )
    )
    want = np.moveaxis(attn, 1, 2).reshape(BN, T, D) @ proj_k + proj_b

    x_sharded = jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, P(None, "dp", None))
    )
    got = sharded_temporal_attention(
        x_sharded, jnp.asarray(qkv_k), jnp.asarray(qkv_b),
        jnp.asarray(proj_k), jnp.asarray(proj_b), H, mesh,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


def test_sharded_temporal_attention_grads_flow():
    mesh = make_mesh()
    rng = np.random.RandomState(1)
    BN, T, D, H = 2, 8, 16, 2
    x = jnp.asarray(rng.randn(BN, T, D).astype(np.float32))
    qkv_k = jnp.asarray(rng.randn(D, 3 * D).astype(np.float32) * 0.1)
    qkv_b = jnp.zeros(3 * D)
    proj_k = jnp.asarray(rng.randn(D, D).astype(np.float32) * 0.1)
    proj_b = jnp.zeros(D)

    def loss(qkv_k):
        out = sharded_temporal_attention(
            x, qkv_k, qkv_b, proj_k, proj_b, H, mesh
        )
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(qkv_k)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
