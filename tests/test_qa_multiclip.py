"""Train-time multi-clip QA parity.

Reference (`/root/reference/src/tasks/run_video_qa.py:461-489`): the train
loop splits (B, n_clips*num_frm) frames into n_clips per-clip forwards and
backprops ONLY the last clip's loss (the in-loop `loss = outputs['loss']`
overwrite before the single backward). These tests pin that semantics:

1. an n_clips=2 step updates params exactly like an n_clips=1 step fed only
   the final clip (dropout off, so RNG streams don't matter);
2. the all-clip metrics equal the per-clip losses computed independently;
3. the n_clips=1 graph is unchanged (same builder defaults as before).
"""

import numpy as np
import jax
import jax.numpy as jnp

from alpro_tpu.models import BertConfig, TimeSformerConfig, build_qa_model
from alpro_tpu.train import TrainState, build_optimizer, get_lr_schedule
from alpro_tpu.train.step import make_qa_train_step

B, T = 3, 2  # frames per clip
N_CLIPS = 2


def _mk_model_batch(seed=0):
    rng = np.random.RandomState(seed)
    batch = {
        "visual_inputs": (rng.rand(B, N_CLIPS * T, 32, 32, 3) * 255).astype(np.uint8),
        "text_input_ids": rng.randint(0, 50, (B, 6)).astype(np.int32),
        "text_input_mask": np.ones((B, 6), np.int32),
        "labels": rng.randint(0, 4, (B,)).astype(np.int32),
    }
    vis = TimeSformerConfig(
        img_size=32, patch_size=16, num_frames=T, embed_dim=16, depth=1,
        num_heads=2, drop_path_rate=0.0, drop_rate=0.0, attn_drop_rate=0.0,
    )
    bert = BertConfig(
        vocab_size=50, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32, fusion_layer=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    model = build_qa_model(bert, vis, num_labels=4, num_frm=T)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(batch["visual_inputs"][:1, :T]),
        jnp.asarray(batch["text_input_ids"][:1]),
        jnp.asarray(batch["text_input_mask"][:1]),
    )
    return model, params, batch


def test_multiclip_grad_is_last_clip_only():
    model, params, batch = _mk_model_batch()
    tx = build_optimizer(get_lr_schedule("constant", 1e-2, 100))
    state0 = TrainState.create(params, tx)

    step_mc = jax.jit(make_qa_train_step(model, tx, n_clips=N_CLIPS, num_frm=T))
    state_mc, m_mc = step_mc(state0, batch, jax.random.PRNGKey(7))

    last_clip = dict(batch)
    last_clip["visual_inputs"] = batch["visual_inputs"][:, T:]
    step_sc = jax.jit(make_qa_train_step(model, tx))
    state_sc, m_sc = step_sc(state0, last_clip, jax.random.PRNGKey(7))

    # loss reported = last clip's loss; params move identically
    np.testing.assert_allclose(float(m_mc["loss"]), float(m_sc["loss"]), rtol=1e-6)
    flat_mc = jax.tree_util.tree_leaves(state_mc.params)
    flat_sc = jax.tree_util.tree_leaves(state_sc.params)
    for a, b in zip(flat_mc, flat_sc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_multiclip_metrics_cover_all_clips():
    model, params, batch = _mk_model_batch(seed=1)
    tx = build_optimizer(get_lr_schedule("constant", 1e-2, 100))
    state0 = TrainState.create(params, tx)
    step_mc = jax.jit(make_qa_train_step(model, tx, n_clips=N_CLIPS, num_frm=T))
    _, m = step_mc(state0, batch, jax.random.PRNGKey(3))

    # independent per-clip losses via the single-clip step's metrics
    step_sc = jax.jit(make_qa_train_step(model, tx))
    per_clip = []
    for c in range(N_CLIPS):
        sub = dict(batch)
        sub["visual_inputs"] = batch["visual_inputs"][:, c * T:(c + 1) * T]
        _, m_c = step_sc(state0, sub, jax.random.PRNGKey(3))
        per_clip.append(float(m_c["loss"]))
    np.testing.assert_allclose(
        float(m["loss_all_clips"]), np.mean(per_clip), rtol=1e-6
    )
    assert "acc_all_clips" in m


def test_single_clip_path_unchanged():
    """n_clips=1 must route through the original loss_fn (no extra metric
    keys, no rng fold) so existing graphs/checkpoints are untouched."""
    model, params, batch = _mk_model_batch(seed=2)
    sub = dict(batch)
    sub["visual_inputs"] = batch["visual_inputs"][:, :T]
    tx = build_optimizer(get_lr_schedule("constant", 1e-2, 100))
    state0 = TrainState.create(params, tx)
    step_default = jax.jit(make_qa_train_step(model, tx))
    step_explicit = jax.jit(make_qa_train_step(model, tx, n_clips=1, num_frm=T))
    s1, m1 = step_default(state0, sub, jax.random.PRNGKey(5))
    s2, m2 = step_explicit(state0, sub, jax.random.PRNGKey(5))
    assert set(m1.keys()) == set(m2.keys()) == {"loss", "acc"}
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=0)
