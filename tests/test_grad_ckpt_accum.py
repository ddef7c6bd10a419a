"""Activation rematerialization + gradient accumulation tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alpro_tpu.models import BertConfig, BertModel, TimeSformer, TimeSformerConfig
from alpro_tpu.models.alpro import AlproConfig, AlproModel
from alpro_tpu.train import TrainState, build_optimizer, get_lr_schedule
from alpro_tpu.train.step import make_retrieval_train_step
import dataclasses


from alpro_tpu.models.remat import REMAT_POLICIES


@pytest.mark.parametrize("policy", REMAT_POLICIES)
def test_remat_timesformer_same_output_and_grads(policy):
    cfg = TimeSformerConfig(
        img_size=32, patch_size=16, num_frames=2, embed_dim=16, depth=2,
        num_heads=2, drop_path_rate=0.0,
    )
    cfg_r = dataclasses.replace(
        cfg, gradient_checkpointing=True, remat_policy=policy
    )
    pixels = jnp.asarray(np.random.RandomState(0).rand(2, 2, 32, 32, 3).astype(np.float32))
    m = TimeSformer(cfg)
    mr = TimeSformer(cfg_r)
    params = m.init({"params": jax.random.PRNGKey(0)}, pixels)

    out = m.apply(params, pixels)
    out_r = mr.apply(params, pixels)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-6)

    g = jax.grad(lambda p: jnp.sum(m.apply(p, pixels) ** 2))(params)
    gr = jax.grad(lambda p: jnp.sum(mr.apply(p, pixels) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("policy", REMAT_POLICIES)
def test_remat_bert_same_output_and_grads(policy):
    cfg = BertConfig(
        vocab_size=50, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32, fusion_layer=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    cfg_r = dataclasses.replace(
        cfg, gradient_checkpointing=True, remat_policy=policy
    )
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 50, (2, 7)))
    mask = jnp.ones((2, 7), jnp.int32)
    m = BertModel(cfg)
    mr = BertModel(cfg_r)
    params = m.init(jax.random.PRNGKey(0), input_ids=ids, attention_mask=mask)

    out = m.apply(params, input_ids=ids, attention_mask=mask)
    out_r = mr.apply(params, input_ids=ids, attention_mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-6)

    g = jax.grad(lambda p: jnp.sum(m.apply(p, input_ids=ids, attention_mask=mask) ** 2))(params)
    gr = jax.grad(lambda p: jnp.sum(mr.apply(p, input_ids=ids, attention_mask=mask) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_gradient_accumulation_equals_full_step():
    from alpro_tpu.models import build_retrieval_model

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
    batch = {
        "visual_inputs": jnp.asarray(rng.rand(4, 2, 32, 32, 3).astype(np.float32)),
        "text_input_ids": jnp.asarray(rng.randint(0, 64, (4, 6))),
        "text_input_mask": jnp.ones((4, 6), jnp.int32),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        batch["visual_inputs"][:1], batch["text_input_ids"][:1],
        batch["text_input_mask"][:1],
    )
    sched = get_lr_schedule("constant", 1e-3, 100)

    tx1 = build_optimizer(sched, accum_steps=1)
    tx2 = build_optimizer(sched, accum_steps=2)
    step1 = jax.jit(make_retrieval_train_step(model, tx1))
    step2 = jax.jit(make_retrieval_train_step(model, tx2))
    key = jax.random.PRNGKey(7)

    s1 = TrainState.create(params, tx1)
    s1, _ = step1(s1, batch, key)

    s2 = TrainState.create(params, tx2)
    s2, _ = step2(s2, batch, key)
    # after 1 micro-step the params must be untouched
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(s2.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # second micro-step with the SAME batch and rng → must equal the full step.
    # step folds state.step into the rng, so force the same fold as step 0
    # by replaying with step counter reset
    s2 = TrainState(step=jnp.zeros((), jnp.int32), params=s2.params,
                    opt_state=s2.opt_state)
    s2, _ = step2(s2, batch, key)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
