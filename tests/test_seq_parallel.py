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


def test_axis_names_for_shape():
    from alpro_tpu.core.mesh import axis_names_for_shape

    assert axis_names_for_shape([8]) == ("dp",)
    assert axis_names_for_shape([4, 2]) == ("dp", "sp")
    with np.testing.assert_raises(ValueError):
        axis_names_for_shape([2, 2, 2])


def test_sp_train_step_e2e_t32():
    """The `--mesh_shape 4 2` CLI layout end-to-end: a retrieval train step
    on a long-T (32-frame) model with `sp_axis='sp'` over a 2D dp=4 × sp=2
    mesh (the mesh context activated around the jitted call, as
    `cli/common.py::setup_training` does). The GSPMD constraint only
    re-lays-out the math — loss and updated params must equal the
    single-device run, and without an ambient sp mesh the constraint is a
    no-op (same model object serves both)."""
    from jax.sharding import Mesh

    from alpro_tpu.core.mesh import replicate, shard_batch
    from alpro_tpu.models import BertConfig, TimeSformerConfig, build_retrieval_model
    from alpro_tpu.train import TrainState, build_optimizer, get_lr_schedule
    from alpro_tpu.train.step import make_retrieval_train_step, shard_step

    vis = TimeSformerConfig(
        img_size=32, patch_size=16, num_frames=32, embed_dim=16, depth=2,
        num_heads=2, drop_path_rate=0.0, sp_axis="sp",
    )
    bert = BertConfig(
        vocab_size=64, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32, fusion_layer=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    model = build_retrieval_model(bert, vis)
    rng = np.random.RandomState(0)
    B, T = 8, 32
    batch = {
        "visual_inputs": jnp.asarray(rng.rand(B, T, 32, 32, 3).astype(np.float32)),
        "text_input_ids": jnp.asarray(rng.randint(0, 64, (B, 6))),
        "text_input_mask": jnp.asarray(np.ones((B, 6), np.int32)),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        batch["visual_inputs"][:1], batch["text_input_ids"][:1],
        batch["text_input_mask"][:1],
    )
    tx = build_optimizer(get_lr_schedule("constant", 1e-3, 100), grad_norm=5.0)
    step = make_retrieval_train_step(model, tx)
    rngk = jax.random.PRNGKey(42)

    # single device, no ambient mesh: sp_axis constraint is a no-op
    state1 = TrainState.create(params, tx)
    state1, m1 = jax.jit(step)(state1, batch, rngk)

    # 2D dp×sp mesh with the mesh context active (the CLI wiring)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("dp", "sp"))
    state2 = replicate(mesh, TrainState.create(params, tx))
    sstep = shard_step(step, mesh, donate_state=False)
    with jax.set_mesh(mesh):
        state2, m2 = sstep(state2, shard_batch(mesh, batch), rngk)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(state1.params),
        jax.tree_util.tree_leaves(state2.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
