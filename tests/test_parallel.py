"""Multi-device tests on the 8-device virtual CPU mesh.

Checks the claims the sharding design rests on (SURVEY.md §2.9/§7):
  * global-math VTC under GSPMD == reference-semantics explicit
    all_gather + global-axis-offset targets (the local_rank bug fix);
  * the jitted train step produces identical losses and parameters whether
    the batch lives on 1 device or is sharded over 8.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alpro_tpu.core.mesh import make_mesh, shard_batch, replicate
from alpro_tpu.models import BertConfig, TimeSformerConfig, build_retrieval_model
from alpro_tpu.objectives import vtc_loss
from alpro_tpu.parallel import vtc_loss_explicit
from alpro_tpu.train import TrainState, build_optimizer, get_lr_schedule
from alpro_tpu.train.step import make_retrieval_train_step, shard_step


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_vtc_global_equals_explicit_allgather():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    rng = np.random.RandomState(0)
    vf = jnp.asarray(_norm(rng.randn(16, 8)).astype(np.float32))
    tf = jnp.asarray(_norm(rng.randn(16, 8)).astype(np.float32))
    temp = jnp.asarray(0.07)

    global_loss, _, _ = vtc_loss(vf, tf, temp)

    vf_sharded = shard_batch(mesh, vf)
    tf_sharded = shard_batch(mesh, tf)
    explicit = vtc_loss_explicit(mesh, vf_sharded, tf_sharded, temp)
    np.testing.assert_allclose(float(global_loss), float(explicit), rtol=1e-5)


@pytest.fixture(scope="module")
def tiny_model():
    vis = TimeSformerConfig(
        img_size=32, patch_size=16, num_frames=2, embed_dim=16, depth=2,
        num_heads=2, drop_path_rate=0.0,
    )
    bert = BertConfig(
        vocab_size=64, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32, fusion_layer=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    model = build_retrieval_model(bert, vis)
    rng = np.random.RandomState(0)
    B = 8
    batch = {
        "visual_inputs": jnp.asarray(rng.rand(B, 2, 32, 32, 3).astype(np.float32)),
        "text_input_ids": jnp.asarray(rng.randint(0, 64, (B, 6))),
        "text_input_mask": jnp.asarray(np.ones((B, 6), np.int32)),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        batch["visual_inputs"][:1], batch["text_input_ids"][:1],
        batch["text_input_mask"][:1],
    )
    return model, params, batch


def test_sharded_step_matches_single_device(tiny_model):
    model, params, batch = tiny_model
    sched = get_lr_schedule("constant", 1e-3, 100)
    tx = build_optimizer(sched, grad_norm=5.0)

    step = make_retrieval_train_step(model, tx)
    rng = jax.random.PRNGKey(42)

    # single device
    state1 = TrainState.create(params, tx)
    state1, m1 = jax.jit(step)(state1, batch, rng)
    state1, m1b = jax.jit(step)(state1, batch, rng)

    # 8-device mesh
    mesh = make_mesh()
    state8 = TrainState.create(params, tx)
    state8 = replicate(mesh, state8)
    sbatch = shard_batch(mesh, batch)
    sstep = shard_step(step, mesh, donate_state=False)
    state8, m8 = sstep(state8, sbatch, rng)
    state8, m8b = sstep(state8, sbatch, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(m1b["loss"]), float(m8b["loss"]), rtol=1e-4)
    # parameters must agree after two updates
    flat1 = jax.tree_util.tree_leaves(state1.params)
    flat8 = jax.tree_util.tree_leaves(state8.params)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_compiler_options_plumbing(tiny_model):
    """--xla_compiler_options parses to a dict and shard_step compiles with
    it. Option names are validated per-backend at compile time (probed
    live: the CPU compiler rejects TPU-namespace names like
    xla_tpu_scoped_vmem_limit_kib with "No such compile option", the TPU
    remote compiler accepts them) — so the portable test uses a generic
    DebugOptions name, and a TPU-only name must fail LOUDLY here on CPU
    rather than be silently dropped."""
    from alpro_tpu.core.misc import parse_compiler_options

    assert parse_compiler_options("") is None
    assert parse_compiler_options(None) is None
    assert parse_compiler_options("a=1, b=True") == {"a": "1", "b": "True"}
    assert parse_compiler_options({"k": "v"}) == {"k": "v"}
    with pytest.raises(ValueError):
        parse_compiler_options("not_key_value")

    model, params, batch = tiny_model
    tx = build_optimizer(get_lr_schedule("constant", 1e-3, 100), grad_norm=5.0)
    step = make_retrieval_train_step(model, tx)
    mesh = make_mesh()
    state = replicate(mesh, TrainState.create(params, tx))
    sstep = shard_step(
        step, mesh, donate_state=False,
        compiler_options={"xla_embed_ir_in_executable": "True"},
    )
    _, m = sstep(state, shard_batch(mesh, batch), jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))

    bad = shard_step(
        step, mesh, donate_state=False,
        compiler_options={"xla_tpu_scoped_vmem_limit_kib": "65536"},
    )
    with pytest.raises(Exception, match="compile option|INVALID_ARGUMENT"):
        bad(state, shard_batch(mesh, batch), jax.random.PRNGKey(0))


def test_training_reduces_loss(tiny_model):
    model, params, batch = tiny_model
    sched = get_lr_schedule("constant", 5e-4, 1000)
    tx = build_optimizer(sched, grad_norm=5.0)
    step = jax.jit(make_retrieval_train_step(model, tx))
    state = TrainState.create(params, tx)
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(12):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 12


def test_temp_stays_clamped(tiny_model):
    model, params, batch = tiny_model
    sched = get_lr_schedule("constant", 0.5, 100)  # huge lr to push temp out
    tx = build_optimizer(sched)
    step = jax.jit(make_retrieval_train_step(model, tx))
    state = TrainState.create(params, tx)
    for i in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
        t = float(state.params["params"]["temp"])
        assert 0.001 <= t <= 0.5


def test_2d_mesh_dp_sp(tiny_model):
    """One 2D (dp=4, sp=2) mesh serves both parallelisms at once: the train
    step shards the batch over dp (sp replicated — GSPMD inserts the same
    psum/gather collectives as the 1D mesh) and sequence-parallel temporal
    attention shards the frame axis over sp of the SAME mesh. Validates the
    multi-axis layout `core/mesh.py` promises."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from alpro_tpu.parallel.seq_parallel import sharded_temporal_attention

    model, params, batch = tiny_model
    devices = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("dp", "sp"))

    sched = get_lr_schedule("constant", 1e-3, 100)
    tx = build_optimizer(sched, grad_norm=5.0)
    step = make_retrieval_train_step(model, tx)
    rng = jax.random.PRNGKey(42)

    # single-device ground truth
    state1 = TrainState.create(params, tx)
    state1, m1 = jax.jit(step)(state1, batch, rng)

    # dp-sharded step on the 2D mesh
    state2d = replicate(mesh, TrainState.create(params, tx))
    sbatch = shard_batch(mesh, batch)
    state2d, m2d = shard_step(step, mesh, donate_state=False)(state2d, sbatch, rng)
    np.testing.assert_allclose(float(m1["loss"]), float(m2d["loss"]), rtol=1e-4)

    # sp attention over the second axis of the same mesh
    rng2 = np.random.RandomState(3)
    BN, T, D, H = 4, 8, 16, 2  # T sharded 2-way over sp
    x = rng2.randn(BN, T, D).astype(np.float32)
    qkv_k = rng2.randn(D, 3 * D).astype(np.float32) * 0.1
    qkv_b = np.zeros(3 * D, np.float32)
    proj_k = rng2.randn(D, D).astype(np.float32) * 0.1
    proj_b = np.zeros(D, np.float32)
    x_sp = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(None, "sp", None)))
    got = sharded_temporal_attention(
        x_sp, jnp.asarray(qkv_k), jnp.asarray(qkv_b),
        jnp.asarray(proj_k), jnp.asarray(proj_b), H, mesh, axis="sp",
    )
    # unsharded reference on one device
    from alpro_tpu.ops.attention import multi_head_attention

    hd = D // H
    qkv = x @ qkv_k + qkv_b
    qkv = qkv.reshape(BN, T, 3, H, hd)
    q, k, v = (np.moveaxis(qkv[:, :, i], 1, 2) for i in range(3))
    attn = np.asarray(multi_head_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), impl="xla"))
    want = np.moveaxis(attn, 1, 2).reshape(BN, T, D) @ proj_k + proj_b
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)
