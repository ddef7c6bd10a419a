"""Block-local VTM negatives: the sharded step with num_local_blocks=8 must
match the single-device run exactly (same global batch, same rng → identical
masked categorical draws → identical parameters)."""

import numpy as np
import jax
import jax.numpy as jnp

from alpro_tpu.core.mesh import make_mesh, replicate, shard_batch
from alpro_tpu.models import BertConfig, TimeSformerConfig, build_retrieval_model
from alpro_tpu.train import TrainState, build_optimizer, get_lr_schedule
from alpro_tpu.train.step import make_retrieval_train_step, shard_step


def test_block_local_vtm_sharded_equals_single():
    vis = TimeSformerConfig(
        img_size=32, patch_size=16, num_frames=2, embed_dim=16, depth=1,
        num_heads=2, drop_path_rate=0.0,
    )
    bert = BertConfig(
        vocab_size=64, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32, fusion_layer=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    model = build_retrieval_model(bert, vis)
    rng = np.random.RandomState(0)
    B = 16  # 2 per device on the 8-way mesh
    batch = {
        "visual_inputs": jnp.asarray(rng.rand(B, 2, 32, 32, 3).astype(np.float32)),
        "text_input_ids": jnp.asarray(rng.randint(0, 64, (B, 6))),
        "text_input_mask": jnp.ones((B, 6), jnp.int32),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        batch["visual_inputs"][:1], batch["text_input_ids"][:1],
        batch["text_input_mask"][:1],
    )
    tx = build_optimizer(get_lr_schedule("constant", 1e-3, 100), grad_norm=5.0)
    step = make_retrieval_train_step(model, tx, num_local_blocks=8)
    key = jax.random.PRNGKey(3)

    s1 = TrainState.create(params, tx)
    s1, m1 = jax.jit(step)(s1, batch, key)

    mesh = make_mesh()
    s8 = replicate(mesh, TrainState.create(params, tx))
    s8, m8 = shard_step(step, mesh, donate_state=False)(
        s8, shard_batch(mesh, batch), key
    )
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s8.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
