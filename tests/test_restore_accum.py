"""Preemption resume with gradient accumulation: the MultiSteps optimizer
state (incl. the gradient accumulator pytree) must round-trip through the
restorer and continue exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from alpro_tpu.checkpoint.orbax_io import TrainingRestorer
from alpro_tpu.models import BertConfig, TimeSformerConfig, build_retrieval_model
from alpro_tpu.train import TrainState, build_optimizer, get_lr_schedule
from alpro_tpu.train.step import make_retrieval_train_step


def test_resume_mid_accumulation(tmp_path):
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
    tx = build_optimizer(get_lr_schedule("constant", 1e-3, 100), accum_steps=2)
    step = jax.jit(make_retrieval_train_step(model, tx))
    key = jax.random.PRNGKey(0)

    # run 3 micro-steps (mid-accumulation), save, run 1 more
    state = TrainState.create(params, tx)
    for _ in range(3):
        state, _ = step(state, batch, key)
    restorer = TrainingRestorer(str(tmp_path), save_steps=1)
    restorer.save(jax.device_get(state))
    state_cont, _ = step(state, batch, key)

    # restore and run the same micro-step → identical params
    template = jax.device_get(TrainState.create(params, tx))
    restored = restorer.restore(template)
    assert restored is not None
    assert int(np.asarray(restored.step)) == 3
    state_rest, _ = step(restored, batch, key)
    for a, b in zip(
        jax.tree_util.tree_leaves(state_cont.params),
        jax.tree_util.tree_leaves(state_rest.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_resume_bf16_moments(tmp_path):
    """bf16 optimizer moments (--adam_mu_dtype/--adam_nu_dtype) must
    round-trip through the restorer with their dtype intact and continue
    the exact trajectory — orbax restores to the template's dtypes, so a
    template built from the same optimizer config is required."""
    import optax

    tx = build_optimizer(
        get_lr_schedule("constant", 1e-2, 100), grad_norm=1.0,
        mu_dtype="bfloat16", nu_dtype="bfloat16",
    )
    params = {"w": jnp.linspace(-1.0, 1.0, 8)}

    @jax.jit
    def step(state):
        grads = jax.grad(lambda p: jnp.sum(p["w"] ** 2))(state.params)
        upd, opt = tx.update(grads, state.opt_state, state.params)
        return state.replace(
            params=optax.apply_updates(state.params, upd),
            opt_state=opt, step=state.step + 1,
        )

    state = TrainState.create(params, tx)
    for _ in range(3):
        state = step(state)
    restorer = TrainingRestorer(str(tmp_path), save_steps=1, async_save=False)
    restorer.save(jax.device_get(state))
    cont = step(state)

    template = jax.device_get(TrainState.create(params, tx))
    restored = restorer.restore(template)
    bf = [
        leaf for leaf in jax.tree_util.tree_leaves(restored.opt_state)
        if hasattr(leaf, "dtype") and leaf.dtype == jnp.bfloat16
    ]
    assert len(bf) >= 2, "restored moments lost their bf16 dtype"
    rest = step(restored)
    np.testing.assert_array_equal(
        np.asarray(cont.params["w"]), np.asarray(rest.params["w"])
    )


def _tiny_state(step_val: int):
    import optax

    params = {"w": np.arange(4, dtype=np.float32) + step_val}
    tx = optax.sgd(1e-2)
    st = TrainState.create(params, tx)
    return st.replace(step=jnp.asarray(step_val, jnp.int32))


def test_async_save_newest_wins(tmp_path):
    """Async saves commit in the background; the .done marker appears only
    after the orbax commit, and alternating a/b slots restore newest-wins."""
    restorer = TrainingRestorer(str(tmp_path), save_steps=1, async_save=True)
    assert restorer.async_save  # orbax is baked into this environment
    restorer.save(jax.device_get(_tiny_state(1)))
    restorer.save(jax.device_get(_tiny_state(2)))  # joins the in-flight save
    restorer.wait_until_finished()
    assert restorer.latest_slot() == "b"
    template = jax.device_get(_tiny_state(0))
    restored = restorer.restore(template)
    assert int(np.asarray(restored.step)) == 2
    np.testing.assert_array_equal(
        np.asarray(restored.params["w"]), np.arange(4, dtype=np.float32) + 2
    )
    # third save overwrites slot a; restore (which joins pending) sees it
    restorer.save(jax.device_get(_tiny_state(3)))
    restored = restorer.restore(template)
    assert int(np.asarray(restored.step)) == 3


def test_sync_save_opt_out(tmp_path):
    """async_save=False restores the blocking reference-style save path."""
    restorer = TrainingRestorer(str(tmp_path), save_steps=1, async_save=False)
    restorer.save(jax.device_get(_tiny_state(7)))
    # marker must exist immediately after the synchronous save returns
    assert restorer.latest_slot() == "a"
    restored = restorer.restore(jax.device_get(_tiny_state(0)))
    assert int(np.asarray(restored.step)) == 7


def test_post_restore_save_preserves_double_buffer(tmp_path):
    """After a preemption + restore, the NEXT save must overwrite the OLDER
    slot, and an interrupted overwrite must leave no stale .done marker —
    otherwise a second preemption could restore partial data."""
    import os

    r1 = TrainingRestorer(str(tmp_path), save_steps=1, async_save=False)
    r1.save(jax.device_get(_tiny_state(500)))   # slot a
    r1.save(jax.device_get(_tiny_state(1000)))  # slot b
    r1.save(jax.device_get(_tiny_state(1500)))  # slot a (newest)

    # fresh process: restore -> next save must target slot b (older)
    r2 = TrainingRestorer(str(tmp_path), save_steps=1, async_save=False)
    restored = r2.restore(jax.device_get(_tiny_state(0)))
    assert int(np.asarray(restored.step)) == 1500
    r2.save(jax.device_get(_tiny_state(1600)))
    assert r2.latest_slot() == "b"
    assert int(open(os.path.join(r2.dir, "a.done")).read()) == 1500
    # and the marker of a slot being overwritten disappears first: simulate
    # by checking save() removed + rewrote b.done (content is now 1600)
    assert int(open(os.path.join(r2.dir, "b.done")).read()) == 1600
    # restore sees the newest
    restored = r2.restore(jax.device_get(_tiny_state(0)))
    assert int(np.asarray(restored.step)) == 1600
