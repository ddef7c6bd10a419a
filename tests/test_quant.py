"""Int8 serving weights (`ops/quant.py`): numerics + serving-flag wiring.

The reference has no quantized path (fp16 apex O2 only); these tests bound
the int8 round-to-nearest error and check the `weights='int8'` serving flag
preserves retrieval rankings end-to-end.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alpro_tpu.data.tokenization import WordPieceTokenizer, make_test_vocab
from alpro_tpu.models import BertConfig, TimeSformerConfig, build_retrieval_model
from alpro_tpu.ops.quant import (
    QTensor,
    dequantize_tree,
    int8_dense,
    quantize_acts,
    quantize_tree,
    quantize_weight,
    wrap_dequant,
)
from alpro_tpu.serving import RetrievalIndex


def test_quantize_weight_error_bound():
    rng = np.random.RandomState(0)
    w = rng.randn(64, 48).astype(np.float32) * np.exp(rng.randn(1, 48))
    qt = quantize_weight(w, dtype=jnp.float32)
    assert qt.q.dtype == jnp.int8 and qt.scale.shape == (1, 48)
    err = np.abs(np.asarray(qt.dequant()) - w)
    # symmetric round-to-nearest: |err| <= scale/2 per output channel
    assert np.all(err <= np.asarray(qt.scale) / 2 + 1e-7)


def test_quantize_weight_zero_channels():
    """zero-init kernels (temporal_fc) must survive: scale 0, dequant 0."""
    qt = quantize_weight(np.zeros((32, 16), np.float32))
    assert np.all(np.asarray(qt.q) == 0)
    assert np.all(np.asarray(qt.dequant()) == 0.0)


def test_quantize_weight_scanned_kernel_per_layer_scales():
    rng = np.random.RandomState(1)
    w = rng.randn(3, 32, 16).astype(np.float32)
    w[1] *= 100.0  # layer 1 must not inflate layer 0/2 scales
    qt = quantize_weight(w, dtype=jnp.float32)
    assert qt.scale.shape == (3, 1, 16)
    err = np.abs(np.asarray(qt.dequant()) - w)
    assert np.all(err <= np.asarray(qt.scale) / 2 + 1e-6)


def test_qtensor_is_pytree():
    qt = quantize_weight(np.ones((8, 8), np.float32))
    leaves, treedef = jax.tree_util.tree_flatten(qt)
    assert len(leaves) == 2
    rt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(rt, QTensor) and rt.dtype == qt.dtype


def test_quantize_tree_selects_kernels_only():
    tree = {
        "params": {
            "mlp": {"kernel": jnp.ones((64, 128)), "bias": jnp.ones((128,))},
            "ln": {"scale": jnp.ones((64,)), "bias": jnp.zeros((64,))},
            "emb": {"embedding": jnp.ones((100, 64))},
            "tiny": {"kernel": jnp.ones((4, 4))},  # below min_elems
        }
    }
    qt = quantize_tree(tree, min_elems=1 << 12)
    p = qt["params"]
    assert isinstance(p["mlp"]["kernel"], QTensor)
    assert not isinstance(p["emb"]["embedding"], QTensor)
    assert not isinstance(p["ln"]["scale"], QTensor)
    assert not isinstance(p["tiny"]["kernel"], QTensor)
    # non-quantized fp32 leaves follow the serving bf16 policy
    assert p["mlp"]["bias"].dtype == jnp.bfloat16
    back = dequantize_tree(qt)
    assert back["params"]["mlp"]["kernel"].shape == (64, 128)
    assert back["params"]["mlp"]["kernel"].dtype == jnp.bfloat16


def test_int8_dense_matches_float_dense():
    rng = np.random.RandomState(2)
    x = rng.randn(4, 64).astype(np.float32)
    w = rng.randn(64, 32).astype(np.float32)
    b = rng.randn(32).astype(np.float32)
    qw = quantize_weight(w, dtype=jnp.float32)
    y = np.asarray(jax.jit(int8_dense)(jnp.asarray(x), qw, jnp.asarray(b)))
    # exactness: the s8×s8→s32 dot + fp32 rescale must equal the float dot
    # of the dequantized operands (int32 accumulation is lossless here)
    xq, xs = quantize_acts(jnp.asarray(x))
    ref_q = (np.asarray(xq, np.float32) * np.asarray(xs)) @ np.asarray(
        qw.dequant(), np.float32
    ) + b
    assert np.allclose(y, ref_q, atol=1e-4, rtol=1e-5)
    # envelope vs the true dense: RMS error ≈ √D·(|x|+|w|)/127 for D=64
    ref = x @ w + b
    assert np.max(np.abs(y - ref)) < 0.5
    assert np.sqrt(np.mean((y - ref) ** 2)) < 0.12


def test_quantize_acts_roundtrip():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(8, 64).astype(np.float32) * 10)
    q, s = quantize_acts(x)
    back = np.asarray(q, np.float32) * np.asarray(s)
    assert np.max(np.abs(back - np.asarray(x))) <= float(np.max(np.asarray(s))) / 2 + 1e-5


@pytest.fixture(scope="module")
def quant_model():
    """Hidden sizes chosen so every kernel clears the min_elems gate."""
    vis = TimeSformerConfig(
        img_size=32, patch_size=16, num_frames=2, embed_dim=64, depth=2,
        num_heads=2, drop_path_rate=0.0,
    )
    bert = BertConfig(
        vocab_size=100, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=128, fusion_layer=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    model = build_retrieval_model(bert, vis, img_size=32, num_frm=2)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 2, 32, 32, 3), jnp.float32),
        jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32),
    )
    return model, params


def test_wrap_dequant_forward_close(quant_model):
    """Full model forward through wrap_dequant stays within the int8
    envelope of the bf16 forward."""
    from alpro_tpu.train.step import make_video_embed_fn

    model, params = quant_model
    bf16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    qp = quantize_tree(params, min_elems=1 << 10)
    rng = np.random.RandomState(4)
    clips = jnp.asarray(rng.randint(0, 255, (2, 2, 32, 32, 3), np.uint8))
    embed = make_video_embed_fn(model)
    ref_emb, ref_feat = jax.jit(embed)(bf16, clips)
    q_emb, q_feat = jax.jit(wrap_dequant(embed))(qp, clips)
    assert np.allclose(
        np.asarray(ref_feat, np.float32), np.asarray(q_feat, np.float32),
        atol=0.08,
    )
    assert np.allclose(
        np.asarray(ref_emb, np.float32), np.asarray(q_emb, np.float32),
        atol=0.25,
    )


def test_retrieval_index_int8_flag(quant_model):
    model, params = quant_model
    tok = WordPieceTokenizer(make_test_vocab())
    rng = np.random.RandomState(5)
    clips = rng.randint(0, 255, (4, 2, 32, 32, 3), np.uint8)

    idx = RetrievalIndex(model, params, tok, max_txt_len=8, topk=4)
    idx8 = RetrievalIndex(model, params, tok, max_txt_len=8, topk=4,
                          weights="int8")
    idx.add_videos(clips, ids=["v0", "v1", "v2", "v3"])
    idx8.add_videos(clips, ids=["v0", "v1", "v2", "v3"])

    for q in ("a dog runs", "the cat jumps on the bed"):
        ref = idx.query(q)
        got = idx8.query(q)
        assert [r[0] for r in ref] == [g[0] for g in got]
        for (_, rp, rs), (_, gp, gs) in zip(ref, got):
            assert abs(rp - gp) < 0.05
            assert abs(rs - gs) < 0.05


def test_serving_weights_flag_validated(quant_model):
    model, params = quant_model
    tok = WordPieceTokenizer(make_test_vocab())
    with pytest.raises(ValueError):
        RetrievalIndex(model, params, tok, weights="fp8")
