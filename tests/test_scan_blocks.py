"""Scanned (lax.scan) encoder stacks == unrolled loops, with param adapters.

The scanned layout compiles ONE block body instead of `depth` unrolled
copies (12× smaller HLO — required where the remote-compile relay caps
payload size, and faster compiles everywhere). These tests pin exact
equivalence through the stack/unstack adapters.
"""

import numpy as np
import jax
import jax.numpy as jnp

from alpro_tpu.models import BertConfig, TimeSformer, TimeSformerConfig, BertModel
from alpro_tpu.models.scan_utils import (
    stack_bert,
    stack_model_params,
    stack_timesformer,
    unstack_model_params,
)


def _vis_cfg(**kw):
    base = dict(
        img_size=32, patch_size=16, num_frames=4, embed_dim=48, depth=3,
        num_heads=4, drop_path_rate=0.0,
    )
    base.update(kw)
    return TimeSformerConfig(**base)


def test_timesformer_scanned_matches_unrolled():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 4, 32, 32, 3).astype(np.float32))
    m_unroll = TimeSformer(_vis_cfg())
    m_scan = TimeSformer(_vis_cfg(scan_blocks=True))
    params = m_unroll.init({"params": jax.random.PRNGKey(0)}, x)
    sparams = stack_model_params(params, None, _vis_cfg())
    a = m_unroll.apply(params, x)
    b = m_scan.apply(sparams, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6)


def test_timesformer_scanned_param_tree_matches_scan_init():
    """The adapter's stacked tree must be structurally identical to what the
    scanned model initializes natively."""
    x = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    m_unroll = TimeSformer(_vis_cfg())
    m_scan = TimeSformer(_vis_cfg(scan_blocks=True))
    p = m_unroll.init({"params": jax.random.PRNGKey(0)}, x)
    sp_native = m_scan.init({"params": jax.random.PRNGKey(0)}, x)
    sp_adapted = stack_model_params(p, None, _vis_cfg())
    assert jax.tree_util.tree_structure(sp_native) == jax.tree_util.tree_structure(sp_adapted)
    for (ka, va), (kb, vb) in zip(
        jax.tree_util.tree_leaves_with_path(sp_native),
        jax.tree_util.tree_leaves_with_path(sp_adapted),
    ):
        assert va.shape == vb.shape, (ka, va.shape, vb.shape)


def test_stack_unstack_roundtrip():
    x = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    m = TimeSformer(_vis_cfg())
    p = m.init({"params": jax.random.PRNGKey(1)}, x)
    back = unstack_model_params(
        stack_model_params(p, None, _vis_cfg()), None, _vis_cfg()
    )
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(p),
        jax.tree_util.tree_leaves_with_path(back),
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bert_scanned_matches_unrolled_all_modes():
    cfg = BertConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=64, fusion_layer=2,
    )
    cfg_s = BertConfig(**{**cfg.__dict__, "scan_blocks": True})
    m = BertModel(cfg)
    ms = BertModel(cfg_s)
    rng = np.random.RandomState(2)
    ids = jnp.asarray(rng.randint(0, 100, (2, 9)).astype(np.int32))
    mask = jnp.asarray((rng.rand(2, 9) > 0.2).astype(np.int32))
    params = m.init({"params": jax.random.PRNGKey(0)}, ids, mask)
    sp = {"params": stack_bert(dict(params["params"]), 4, 2)}
    for mode in ("text", "multi_modal"):
        a = m.apply(params, ids, mask, mode=mode)
        b = ms.apply(sp, ids, mask, mode=mode)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6, err_msg=mode
        )
    emb = jnp.asarray(rng.randn(2, 12, 32).astype(np.float32))
    emask = jnp.ones((2, 12), jnp.int32)
    a = m.apply(params, None, emask, encoder_embeds=emb, mode="fusion")
    b = ms.apply(sp, None, emask, encoder_embeds=emb, mode="fusion")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6)


def test_scanned_gradients_match_unrolled():
    vis = _vis_cfg(depth=2)
    vis_s = _vis_cfg(depth=2, scan_blocks=True)
    m = TimeSformer(vis)
    ms = TimeSformer(vis_s)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 4, 32, 32, 3).astype(np.float32))
    params = m.init({"params": jax.random.PRNGKey(0)}, x)

    g_unroll = jax.grad(lambda p: (m.apply(p, x) ** 2).sum())(params)
    g_scan = jax.grad(
        lambda p: (ms.apply(p, x) ** 2).sum()
    )(stack_model_params(params, None, vis_s))
    g_scan_unstacked = unstack_model_params(g_scan, None, vis_s)
    flat_a = jax.tree_util.tree_leaves_with_path(g_unroll)
    flat_b = {
        jax.tree_util.keystr(kp): v
        for kp, v in jax.tree_util.tree_leaves_with_path(g_scan_unstacked)
    }
    for kp, va in flat_a:
        vb = flat_b[jax.tree_util.keystr(kp)]
        # scan-backward accumulates in a different order than the unrolled
        # backward: tiny fp drift expected (observed rel ~5e-4)
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), atol=1e-4, rtol=2e-3,
            err_msg=jax.tree_util.keystr(kp),
        )


def test_scanned_droppath_runs():
    """Stochastic-depth under scan: traced per-block rates, droppath rng."""
    vis = _vis_cfg(depth=3, drop_path_rate=0.2, scan_blocks=True)
    m = TimeSformer(vis)
    x = jnp.zeros((2, 4, 32, 32, 3), jnp.float32)
    params = m.init({"params": jax.random.PRNGKey(0)}, x)
    out = m.apply(
        params, x, pooling="temporal", deterministic=False,
        rngs={"droppath": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
    )
    assert np.isfinite(np.asarray(out)).all()


def test_cli_scan_training_defaults_grad_ckpt(tmp_path):
    """Scanned training configs default per-block gradient checkpointing
    (scan stacks residuals; the un-rematted flagship backward exceeds HBM —
    docs/PERF.md), while inference and scan-off configs are untouched."""
    import json

    from alpro_tpu.cli.common import build_model_from_cfg
    from alpro_tpu.core.config import Config

    base = tmp_path / "base_model.json"
    base.write_text(json.dumps({
        "vocab_size": 100, "hidden_size": 16, "num_hidden_layers": 2,
        "num_attention_heads": 2, "intermediate_size": 32, "fusion_layer": 1,
    }))
    vis = tmp_path / "vis_model.json"
    vis.write_text(json.dumps({"embed_dim": 16, "depth": 2, "num_heads": 2}))

    def mk(**kw):
        return Config({
            "model_config": str(base), "visual_model_cfg": str(vis),
            "crop_img_size": 32, "num_frm": 2, **kw,
        })

    m = build_model_from_cfg(mk(), "retrieval")
    assert m.cfg.visual.gradient_checkpointing
    assert m.cfg.bert.gradient_checkpointing

    m = build_model_from_cfg(mk(do_inference=1), "retrieval")
    assert not m.cfg.visual.gradient_checkpointing

    m = build_model_from_cfg(mk(scan_blocks=0), "retrieval")
    assert not m.cfg.visual.gradient_checkpointing
