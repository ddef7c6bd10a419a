"""Checkpoint conversion tests: resizing rules, imagenet init duplication,
full ALPRO state-dict conversion."""

import numpy as np
import jax
import jax.numpy as jnp

from alpro_tpu.checkpoint.torch_convert import (
    convert_imagenet_vit,
    convert_reference_state_dict,
    resize_spatial_embedding,
    resize_temporal_embedding,
)
from alpro_tpu.models import TimeSformer, TimeSformerConfig
from test_timesformer import SMALL, random_vit_state_dict


def test_resize_spatial_embedding_nearest():
    pe = np.arange(1 * 5 * 2, dtype=np.float32).reshape(1, 5, 2)  # cls + 4
    out = resize_spatial_embedding(pe, 8)
    assert out.shape == (1, 9, 2)
    np.testing.assert_array_equal(out[0, 0], pe[0, 0])  # cls preserved
    # nearest with idx = floor(i * 4/8): [0,0,1,1,2,2,3,3]
    want_idx = [0, 0, 1, 1, 2, 2, 3, 3]
    for i, wi in enumerate(want_idx):
        np.testing.assert_array_equal(out[0, 1 + i], pe[0, 1 + wi])


def test_resize_temporal_embedding_nearest():
    te = np.arange(1 * 4 * 3, dtype=np.float32).reshape(1, 4, 3)
    out = resize_temporal_embedding(te, 8)
    assert out.shape == (1, 8, 3)
    for i in range(8):
        np.testing.assert_array_equal(out[0, i], te[0, i // 2])


def test_imagenet_vit_duplication_rules():
    rng = np.random.RandomState(0)
    sd = random_vit_state_dict(SMALL, rng)
    # strip the timesformer-only keys to fake a plain ViT checkpoint
    vit_sd = {
        k: v for k, v in sd.items()
        if "temporal" not in k and k != "time_embed"
    }
    tree = convert_imagenet_vit(vit_sd, depth=SMALL.depth)

    for i in range(SMALL.depth):
        b = tree[f"blocks_{i}"]
        np.testing.assert_array_equal(
            b["temporal_attn"]["qkv"]["kernel"], b["attn"]["qkv"]["kernel"]
        )
        np.testing.assert_array_equal(
            b["temporal_norm1"]["scale"], b["norm1"]["scale"]
        )
        if i > 0:
            assert (b["temporal_fc"]["kernel"] == 0).all()
        else:
            assert "temporal_fc" not in b  # block 0 keeps random init

    # merged over a fresh init, the model must run
    from alpro_tpu.cli.common import merge_params

    model = TimeSformer(SMALL)
    pixels = jnp.zeros((1, SMALL.num_frames, SMALL.img_size, SMALL.img_size, 3))
    init = model.init({"params": jax.random.PRNGKey(0)}, pixels)
    merged = merge_params(init, {"params": tree})
    out = model.apply(merged, pixels)
    assert np.isfinite(np.asarray(out)).all()
    # time_embed must still be the zero init
    assert (np.asarray(merged["params"]["time_embed"]) == 0).all()


def test_full_alpro_state_dict_roundtrip():
    """Build a synthetic reference-style checkpoint with every head and
    convert; the resulting tree must load into the pretrain model."""
    from alpro_tpu.models import BertConfig, build_pretrain_model
    from alpro_tpu.cli.common import merge_params
    from test_bert import make_hf

    rng = np.random.RandomState(1)
    # visual embed dim must equal the bert hidden size (768 in the real model)
    vis_cfg = TimeSformerConfig(
        img_size=48, patch_size=16, num_frames=3, embed_dim=32, depth=2,
        num_heads=4,
    )
    vis_sd = {
        "visual_encoder.model." + k: v
        for k, v in random_vit_state_dict(vis_cfg, rng).items()
    }
    hf, _, _, _ = make_hf(seed=3)
    bert_sd = {
        "text_encoder.bert." + k: v.detach().numpy()
        for k, v in hf.state_dict().items()
    }
    D = 32  # hf hidden from make_hf
    heads = {
        "vision_proj.weight": rng.randn(256, 32).astype(np.float32),
        "vision_proj.bias": rng.randn(256).astype(np.float32),
        "text_proj.weight": rng.randn(256, D).astype(np.float32),
        "text_proj.bias": rng.randn(256).astype(np.float32),
        "itm_head.weight": rng.randn(2, D).astype(np.float32),
        "itm_head.bias": rng.randn(2).astype(np.float32),
        "temp": np.asarray(0.07, np.float32),
        "text_encoder.cls.predictions.transform.dense.weight": rng.randn(D, D).astype(np.float32),
        "text_encoder.cls.predictions.transform.dense.bias": rng.randn(D).astype(np.float32),
        "text_encoder.cls.predictions.transform.LayerNorm.weight": np.ones(D, np.float32),
        "text_encoder.cls.predictions.transform.LayerNorm.bias": np.zeros(D, np.float32),
        "text_encoder.cls.predictions.decoder.weight": rng.randn(211, D).astype(np.float32),
        "text_encoder.cls.predictions.decoder.bias": rng.randn(211).astype(np.float32),
        "mpm_head.0.weight": rng.randn(2 * D, D).astype(np.float32),
        "mpm_head.0.bias": rng.randn(2 * D).astype(np.float32),
        "mpm_head.2.weight": rng.randn(7, 2 * D).astype(np.float32),
        "mpm_head.2.bias": rng.randn(7).astype(np.float32),
    }
    sd = {**vis_sd, **bert_sd, **heads}
    tree = convert_reference_state_dict(
        sd, depth=vis_cfg.depth, num_bert_layers=4,
        num_patches=vis_cfg.num_patches, num_frames=vis_cfg.num_frames,
    )
    assert float(tree["params"]["temp"]) == np.float32(0.07)

    bert_cfg = BertConfig(
        vocab_size=211, hidden_size=32, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=128, fusion_layer=2,
    )
    model = build_pretrain_model(bert_cfg, vis_cfg, num_entities=7)
    pixels = jnp.zeros((1, vis_cfg.num_frames, vis_cfg.img_size, vis_cfg.img_size, 3))
    ids = jnp.ones((1, 5), jnp.int32)
    mask = jnp.ones((1, 5), jnp.int32)
    init = model.init({"params": jax.random.PRNGKey(0)}, pixels, ids, mask)
    merged = merge_params(init, tree)
    out = model.apply(merged, pixels, ids, mask)
    assert out["mlm_logits"].shape[-1] == 211
    assert out["mpm_logits"].shape[-1] == 7
    # converted weights actually landed (not silently skipped)
    np.testing.assert_allclose(
        np.asarray(merged["params"]["itm_head"]["kernel"]),
        heads["itm_head.weight"].T,
    )
