"""The cached-text fast eval path must score identically to the naive
1-video×N-texts forward (`alpro_models.py:874-914` protocol)."""

import numpy as np
import jax
import jax.numpy as jnp

from alpro_tpu.models import BertConfig, TimeSformerConfig, build_retrieval_model
from alpro_tpu.train.step import (
    make_fusion_score_fn,
    make_retrieval_inference_fn,
    make_text_encode_fn,
    make_video_embed_fn,
)


def test_fast_eval_equals_naive():
    vis = TimeSformerConfig(
        img_size=32, patch_size=16, num_frames=2, embed_dim=24, depth=2,
        num_heads=4, drop_path_rate=0.0,
    )
    bert = BertConfig(
        vocab_size=101, hidden_size=24, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=48, fusion_layer=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    model = build_retrieval_model(bert, vis)
    rng = np.random.RandomState(0)
    n_text = 5
    clip = jnp.asarray(rng.rand(1, 2, 32, 32, 3).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, 101, (n_text, 7)))
    mask = jnp.asarray((rng.rand(n_text, 7) > 0.2).astype(np.int32))
    mask = mask.at[:, 0].set(1)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, clip, ids[:1], mask[:1]
    )

    naive = make_retrieval_inference_fn(model)(
        params, {"visual_inputs": clip, "text_input_ids": ids,
                 "text_input_mask": mask}
    )

    text_embeds, tfeat = make_text_encode_fn(model)(
        params, {"text_input_ids": ids, "text_input_mask": mask}
    )
    video_embeds, vfeat = make_video_embed_fn(model)(params, clip)
    temp = float(np.clip(np.asarray(params["params"]["temp"]), 0.001, 0.5))
    sims = np.asarray(vfeat) @ np.asarray(tfeat).T / temp
    logits = make_fusion_score_fn(model)(params, text_embeds, mask, video_embeds)

    np.testing.assert_allclose(
        sims, np.asarray(naive["itc_scores"]), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(naive["logits"]), rtol=1e-4, atol=1e-5
    )

    # the batched V×C pair scorer (one dispatch for several videos — the
    # eval-loop default) must reproduce the per-video scorer exactly
    from alpro_tpu.train.step import make_fusion_score_pairs_fn

    clips3 = jnp.asarray(rng.rand(3, 2, 32, 32, 3).astype(np.float32))
    vemb3, _ = make_video_embed_fn(model)(params, clips3)
    pair_logits = make_fusion_score_pairs_fn(model)(
        params, text_embeds, mask, vemb3
    )
    assert pair_logits.shape == (3, n_text, 2)
    for vi in range(3):
        per_video = make_fusion_score_fn(model)(
            params, text_embeds, mask, vemb3[vi : vi + 1]
        )
        np.testing.assert_allclose(
            np.asarray(pair_logits[vi]), np.asarray(per_video),
            rtol=1e-5, atol=1e-5,
        )
