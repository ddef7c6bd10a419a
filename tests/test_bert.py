"""BERT parity tests: numerics vs HF torch BertModel, and the text/fusion
layer-split invariant (`/root/reference/src/modeling/xbert.py:549-559`)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from transformers import BertConfig as HFBertConfig
from transformers.models.bert.modeling_bert import BertModel as HFBertModel

from alpro_tpu.checkpoint.torch_convert import convert_bert
from alpro_tpu.models.bert import BertConfig, BertMLMHead, BertModel


def make_hf(seed=0, layers=4, hidden=32, heads=4, vocab=211):
    torch.manual_seed(seed)
    hf_cfg = HFBertConfig(
        vocab_size=vocab,
        hidden_size=hidden,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        intermediate_size=hidden * 4,
        max_position_embeddings=64,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        attn_implementation="eager",
    )
    hf = HFBertModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = BertConfig(
        vocab_size=vocab,
        hidden_size=hidden,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        intermediate_size=hidden * 4,
        max_position_embeddings=64,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        fusion_layer=layers // 2,
    )
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = {"params": convert_bert(sd, prefix="", num_layers=layers)}
    return hf, BertModel(cfg), params, cfg


def test_full_stack_matches_hf():
    hf, model, params, _ = make_hf()
    rng = np.random.RandomState(0)
    ids = rng.randint(0, 211, size=(3, 11))
    mask = np.ones((3, 11), dtype=np.int64)
    mask[0, 7:] = 0
    mask[2, 4:] = 0

    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()

    got = np.asarray(
        model.apply(params, input_ids=jnp.asarray(ids),
                    attention_mask=jnp.asarray(mask), mode="multi_modal")
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_text_then_fusion_equals_full():
    """mode='text' then mode='fusion' on the produced embeds == multi_modal."""
    _, model, params, cfg = make_hf(seed=1)
    rng = np.random.RandomState(1)
    ids = jnp.asarray(rng.randint(0, 211, size=(2, 9)))
    mask = jnp.asarray(np.ones((2, 9), dtype=np.int64))

    full = model.apply(params, input_ids=ids, attention_mask=mask, mode="multi_modal")
    text = model.apply(params, input_ids=ids, attention_mask=mask, mode="text")
    fused = model.apply(
        params, encoder_embeds=text, attention_mask=mask, mode="fusion"
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(full), atol=1e-5)


def test_fusion_takes_concatenated_embeds():
    """Fusion over concat[text, video] must attend across both segments."""
    _, model, params, cfg = make_hf(seed=2)
    rng = np.random.RandomState(2)
    text = jnp.asarray(rng.randn(2, 5, 32).astype(np.float32))
    video = jnp.asarray(rng.randn(2, 7, 32).astype(np.float32))
    embeds = jnp.concatenate([text, video], axis=1)
    mask = jnp.ones((2, 12), dtype=jnp.int32)
    out = model.apply(params, encoder_embeds=embeds, attention_mask=mask, mode="fusion")
    assert out.shape == (2, 12, 32)

    # changing the video segment must change the text outputs (cross-modal)
    video2 = video.at[:, 0].add(1.0)
    out2 = model.apply(
        params,
        encoder_embeds=jnp.concatenate([text, video2], axis=1),
        attention_mask=mask,
        mode="fusion",
    )
    assert not np.allclose(np.asarray(out[:, :5]), np.asarray(out2[:, :5]))


def test_padding_mask_blocks_attention():
    _, model, params, _ = make_hf(seed=3)
    rng = np.random.RandomState(3)
    ids = rng.randint(0, 211, size=(1, 8))
    mask = np.ones((1, 8), dtype=np.int64)
    mask[0, 5:] = 0

    out1 = model.apply(
        params, input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask),
        mode="multi_modal",
    )
    ids2 = ids.copy()
    ids2[0, 5:] = 7  # change padded tokens only
    out2 = model.apply(
        params, input_ids=jnp.asarray(ids2), attention_mask=jnp.asarray(mask),
        mode="multi_modal",
    )
    np.testing.assert_allclose(
        np.asarray(out1[:, :5]), np.asarray(out2[:, :5]), atol=1e-5
    )


def test_mlm_head_shapes():
    cfg = BertConfig(
        vocab_size=97, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32, fusion_layer=1,
    )
    import jax

    head = BertMLMHead(cfg)
    x = jnp.zeros((2, 5, 16))
    params = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(params, x)
    assert out.shape == (2, 5, 97)
