"""Fused post-LN BERT layer kernels vs XLA references (interpret on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from alpro_tpu.ops.pallas_bert_block import (
    _bert_attn_xla_reference,
    _bert_mlp_xla_reference,
    fused_bert_attention_block,
    fused_bert_mlp_block,
)


def _mk(rng, *shape):
    return jnp.asarray(rng.randn(*shape).astype(np.float32))


def test_bert_attention_block_matches_reference():
    rng = np.random.RandomState(0)
    M, S, H, hd = 3, 7, 2, 8
    D = H * hd
    x = _mk(rng, M, S, D)
    mask = jnp.asarray((rng.rand(M, S) > 0.3).astype(np.float32))
    ws = [
        _mk(rng, D, D) * 0.2, _mk(rng, D) * 0.1,  # wq bq
        _mk(rng, D, D) * 0.2, _mk(rng, D) * 0.1,  # wk bk
        _mk(rng, D, D) * 0.2, _mk(rng, D) * 0.1,  # wv bv
        _mk(rng, D, D) * 0.2, _mk(rng, D) * 0.1,  # wproj bproj
        _mk(rng, D), _mk(rng, D),                 # ln scale bias
    ]
    got = fused_bert_attention_block(x, mask, *ws, H, eps=1e-12)
    mask_bias = (1.0 - mask) * -10000.0
    want = _bert_attn_xla_reference(x, mask_bias, *ws, 1e-12, hd ** -0.5, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_bert_mlp_block_matches_reference():
    rng = np.random.RandomState(1)
    R, D, Dh = 9, 16, 32
    x = _mk(rng, 2, R, D)
    args = (_mk(rng, D, Dh) * 0.2, _mk(rng, Dh) * 0.1,
            _mk(rng, Dh, D) * 0.2, _mk(rng, D) * 0.1, _mk(rng, D), _mk(rng, D))
    got = fused_bert_mlp_block(x, *args, eps=1e-12)
    want = _bert_mlp_xla_reference(x, *args, 1e-12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_bert_attention_gradients():
    rng = np.random.RandomState(2)
    M, S, H, hd = 2, 5, 2, 8
    D = H * hd
    x = _mk(rng, M, S, D)
    mask = jnp.ones((M, S), jnp.float32)
    ws = [
        _mk(rng, D, D) * 0.2, _mk(rng, D) * 0.1,
        _mk(rng, D, D) * 0.2, _mk(rng, D) * 0.1,
        _mk(rng, D, D) * 0.2, _mk(rng, D) * 0.1,
        _mk(rng, D, D) * 0.2, _mk(rng, D) * 0.1,
        _mk(rng, D), _mk(rng, D),
    ]
    mask_bias = (1.0 - mask) * -10000.0
    g1 = jax.grad(
        lambda x: jnp.sum(
            fused_bert_attention_block(x, mask, *ws, H, eps=1e-12) ** 2
        )
    )(x)
    g2 = jax.grad(
        lambda x: jnp.sum(
            _bert_attn_xla_reference(x, mask_bias, *ws, 1e-12, hd ** -0.5, H)
            ** 2
        )
    )(x)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-3
    )


def test_bert_model_fused_equals_xla():
    """BertModel with block_impl='fused' (interpret) == 'xla': text, fusion,
    and multi_modal modes, identical params, with padding masks."""
    from alpro_tpu.models.bert import BertConfig, BertModel

    kw = dict(
        vocab_size=100, hidden_size=16, num_hidden_layers=4,
        num_attention_heads=2, intermediate_size=32, fusion_layer=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    rng = np.random.RandomState(3)
    B, L = 2, 6
    ids = jnp.asarray(rng.randint(0, 100, (B, L)).astype(np.int32))
    mask = jnp.asarray(
        np.stack([np.ones(L), np.r_[np.ones(4), np.zeros(L - 4)]]).astype(
            np.int32
        )
    )
    m_x = BertModel(BertConfig(**kw, block_impl="xla"))
    m_f = BertModel(BertConfig(**kw, block_impl="fused"))
    params = m_x.init(
        jax.random.PRNGKey(0), input_ids=ids, attention_mask=mask,
        mode="multi_modal",
    )
    params_f = m_f.init(
        jax.random.PRNGKey(0), input_ids=ids, attention_mask=mask,
        mode="multi_modal",
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, params_f,
    )
    for mode in ("text", "multi_modal"):
        out_x = m_x.apply(params, input_ids=ids, attention_mask=mask, mode=mode)
        out_f = m_f.apply(params, input_ids=ids, attention_mask=mask, mode=mode)
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(out_x), atol=5e-5
        )
    emb = jnp.asarray(rng.randn(B, L, 16).astype(np.float32))
    out_x = m_x.apply(
        params, encoder_embeds=emb, attention_mask=mask, mode="fusion"
    )
    out_f = m_f.apply(
        params, encoder_embeds=emb, attention_mask=mask, mode="fusion"
    )
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x), atol=5e-5)
