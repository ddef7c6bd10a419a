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

    # the bank-gather rerank scorer (--eval_rerank_topk dispatch unit) must
    # reproduce the V×C pair scorer at the gathered indices exactly
    from alpro_tpu.train.step import make_fusion_rerank_bank_fn

    tidx = jnp.asarray([0, 3, 4, 1], jnp.int32)
    vidx = jnp.asarray([2, 0, 1, 1], jnp.int32)
    bank_logits = make_fusion_rerank_bank_fn(model)(
        params, text_embeds, mask, vemb3, tidx, vidx
    )
    want = np.asarray(pair_logits)[np.asarray(vidx), np.asarray(tidx)]
    np.testing.assert_allclose(
        np.asarray(bank_logits), want, rtol=1e-5, atol=1e-5
    )


def _mk_eval_fixture(rng, n_videos=6, n_text=9):
    """Minimal eval_ds + model + tokenizer for driving inference_retrieval."""
    from alpro_tpu.data.tokenization import WordPieceTokenizer, make_test_vocab

    vis = TimeSformerConfig(
        img_size=32, patch_size=16, num_frames=2, embed_dim=24, depth=2,
        num_heads=4, drop_path_rate=0.0,
    )
    bert = BertConfig(
        vocab_size=100, hidden_size=24, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=48, fusion_layer=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    model = build_retrieval_model(bert, vis)
    params = model.init(
        {"params": jax.random.PRNGKey(1)},
        jnp.zeros((1, 2, 32, 32, 3), jnp.float32),
        jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32),
    )
    clips = rng.randint(0, 255, (n_videos, 2, 32, 32, 3), np.uint8)
    captions = ["a dog runs", "the red ball", "a person is playing",
                "rain on the window", "two cats sleep", "a car drives fast",
                "children play games", "the sun sets", "birds fly away"]

    class FakeEvalDS:
        texts = [{"caption": captions[j % len(captions)], "txt_id": f"t{j}"}
                 for j in range(n_text)]
        gt_txt_id2vid_id = {f"t{j}": f"v{j % n_videos}" for j in range(n_text)}

        def __len__(self):
            return n_videos

        def get_video(self, i):
            return {"clip": clips[i], "vid_id": f"v{i}"}

    return model, params, WordPieceTokenizer(make_test_vocab()), FakeEvalDS()


def test_eval_rerank_topk_full_k_matches_protocol():
    """K ≥ V reranks every pair → per-text video ranking and retrieval
    metrics must equal the exact protocol's; K=2 must agree on every
    text whose protocol winner sits in its VTC top-2."""
    from alpro_tpu.cli.run_video_retrieval import inference_retrieval
    from alpro_tpu.core.config import Config
    from alpro_tpu.evals.retrieval import eval_retrieval

    rng = np.random.RandomState(3)
    model, params, tok, eval_ds = _mk_eval_fixture(rng)
    base = dict(max_txt_len=8, inference_batch_size=4,
                eval_video_batch_size=4, eval_pair_batch_size=8)

    def ranking(results):
        by_txt = {}
        for r in results:
            by_txt.setdefault(r["txt_id"], []).append((-r["score"], r["vid_id"]))
        return {t: [v for _, v in sorted(rows)] for t, rows in by_txt.items()}

    full = inference_retrieval(model, params, eval_ds, tok, Config(base))
    topk = inference_retrieval(
        model, params, eval_ds, tok, Config(dict(base, eval_rerank_topk=64))
    )
    assert len(topk) == len(full) == 6 * 9
    assert ranking(topk) == ranking(full)
    gt = eval_ds.gt_txt_id2vid_id
    assert eval_retrieval(topk, gt) == eval_retrieval(full, gt)

    # small K: reranked candidates always outrank non-candidates, and any
    # text whose protocol top-1 is in its VTC top-2 keeps the same winner
    k2 = inference_retrieval(
        model, params, eval_ds, tok, Config(dict(base, eval_rerank_topk=2))
    )
    r_full, r_k2 = ranking(full), ranking(k2)
    sims = {(r["vid_id"], r["txt_id"]): r["sim"] for r in k2}
    scores = {(r["vid_id"], r["txt_id"]): r["score"] for r in k2}
    for t, vids in r_k2.items():
        cand = set(sorted(vids, key=lambda v: -sims[(v, t)])[:2])
        assert set(vids[:2]) == cand  # candidates first ...
        assert all(scores[(v, t)] > 1.0 for v in vids[:2])
        assert all(scores[(v, t)] < 1.0 for v in vids[2:])
        if r_full[t][0] in cand:
            assert r_k2[t][0] == r_full[t][0]


def test_eval_rerank_topk_empty_video_shard(monkeypatch):
    """A host whose video stripe is empty (process_count > n_videos, or
    debug's 5-video cap) must contribute an empty shard to the gather
    instead of crashing on argpartition over a (0, n_text) sims array."""
    from alpro_tpu.cli.run_video_retrieval import _inference_retrieval_topk
    from alpro_tpu.core.config import Config
    import alpro_tpu.parallel.host_sync as host_sync

    rng = np.random.RandomState(4)
    model, params, tok, eval_ds = _mk_eval_fixture(rng)
    # this host is rank 7 of 8 with only 6 videos → empty local stripe
    monkeypatch.setattr(jax, "process_index", lambda: 7)
    monkeypatch.setattr(jax, "process_count", lambda: 8)
    gathered = []
    monkeypatch.setattr(
        host_sync, "all_gather_list",
        lambda shard: gathered.append(shard) or [shard, [{"vid_id": "v0",
            "txt_id": "t0", "score": 1.5, "sim": 0.1}]],
    )
    cfg = Config(dict(max_txt_len=8, inference_batch_size=4,
                      eval_video_batch_size=4, eval_pair_batch_size=8))
    results = _inference_retrieval_topk(model, params, eval_ds, tok, cfg, K=2)
    assert gathered == [[]]            # joined the collective with an empty shard
    assert [r["vid_id"] for r in results] == ["v0"]  # peers' rows still merge
