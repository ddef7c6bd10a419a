"""RetrievalIndex serving path: build gallery, query, rank, persist."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alpro_tpu.data.tokenization import WordPieceTokenizer, make_test_vocab
from alpro_tpu.models import BertConfig, TimeSformerConfig, build_retrieval_model
from alpro_tpu.serving import RetrievalIndex


@pytest.fixture(scope="module")
def small_index():
    vis = TimeSformerConfig(
        img_size=32, patch_size=16, num_frames=2, embed_dim=16, depth=2,
        num_heads=2, drop_path_rate=0.0,
    )
    bert = BertConfig(
        vocab_size=100, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32, fusion_layer=1,
    )
    model = build_retrieval_model(bert, vis, img_size=32, num_frm=2)
    rng = np.random.RandomState(0)
    tok = WordPieceTokenizer(make_test_vocab())
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 2, 32, 32, 3), jnp.float32),
        jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32),
    )
    idx = RetrievalIndex(model, params, tok, max_txt_len=8, topk=3)
    clips = rng.randint(0, 255, (4, 2, 32, 32, 3), np.uint8)
    idx.add_videos(clips[:2], ids=["v0", "v1"])
    idx.add_videos(clips[2:], ids=["v2", "v3"])  # incremental add
    return idx, clips


def test_query_ranks_by_vtm_prob(small_index):
    idx, _ = small_index
    res = idx.query("a dog runs")
    assert len(res) == 3  # topk
    ids, probs, sims = zip(*res)
    assert set(ids) <= {"v0", "v1", "v2", "v3"}
    assert list(probs) == sorted(probs, reverse=True)
    assert all(0.0 <= p <= 1.0 for p in probs)


def test_query_topk_override_and_determinism(small_index):
    idx, _ = small_index
    r1 = idx.query("the cat jumps", topk=4)
    r2 = idx.query("the cat jumps", topk=4)
    assert r1 == r2
    assert len(r1) == 4


def test_candidates_are_vtc_topk(small_index):
    """The reranked set must equal the top-k of the VTC similarities."""
    idx, _ = small_index
    feats = np.concatenate(idx._feat_chunks, axis=0)
    ids_j, mask_j = idx._tokenize("a person is playing")
    _, tfeat = idx._encode_text(idx.params, {
        "text_input_ids": ids_j, "text_input_mask": mask_j,
    })
    sims = np.asarray(tfeat)[0] @ feats.T
    want = {idx.ids[i] for i in np.argsort(-sims)[:3]}
    got = {vid for vid, _, _ in idx.query("a person is playing")}
    assert got == want


def test_query_batch_matches_sequential(small_index):
    """RetrievalIndex.query_batch (one dispatch for B texts) == per-text
    query: same ids/ranking, probs and sims allclose (the batched fn fuses
    the whole query inside one jit, so reductions may reassociate)."""
    idx, _ = small_index
    texts = ["a dog runs", "the cat jumps", "hello"]
    batched = idx.query_batch(texts, topk=3)
    assert len(batched) == 3
    for t, got in zip(texts, batched):
        want = idx.query(t, topk=3)
        assert [g[0] for g in got] == [w[0] for w in want], (t, got, want)
        np.testing.assert_allclose(
            [g[1] for g in got], [w[1] for w in want], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            [g[2] for g in got], [w[2] for w in want], rtol=1e-4, atol=1e-5
        )
    assert idx.query_batch([], topk=3) == []


def test_save_load_round_trip(small_index, tmp_path):
    idx, _ = small_index
    path = str(tmp_path / "bank.npz")
    idx.save(path)

    fresh = RetrievalIndex(
        idx.model, idx.params, idx.tokenizer, max_txt_len=8, topk=3
    )
    fresh.load(path)
    assert fresh.ids == idx.ids
    assert fresh.query("the red ball") == idx.query("the red ball")


def test_qa_predictor_multiclip():
    from alpro_tpu.models import build_qa_model
    from alpro_tpu.serving.qa import VideoQAPredictor

    vis = TimeSformerConfig(
        img_size=32, patch_size=16, num_frames=2, embed_dim=16, depth=2,
        num_heads=2, drop_path_rate=0.0,
    )
    bert = BertConfig(
        vocab_size=100, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32, fusion_layer=1,
    )
    model = build_qa_model(bert, vis, num_labels=5, img_size=32, num_frm=2)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 2, 32, 32, 3), jnp.float32),
        jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32),
    )
    ans2label = {"cooking": 0, "running": 1, "eating": 2, "red": 3, "dog": 4}
    qa = VideoQAPredictor(
        model, params, WordPieceTokenizer(make_test_vocab()), ans2label,
        max_txt_len=8,
    )
    clips = np.random.RandomState(1).randint(0, 255, (3, 2, 32, 32, 3), np.uint8)
    res = qa.predict(clips, "what is the man doing", topk=3)
    assert len(res) == 3
    answers, probs = zip(*res)
    assert set(answers) <= set(ans2label)
    assert list(probs) == sorted(probs, reverse=True)
    # pooled prediction must equal hand-pooling the per-clip logits
    import alpro_tpu.evals.qa as qa_evals

    logits = np.asarray(qa._infer(params, {
        "visual_inputs": jnp.asarray(clips),
        "text_input_ids": jnp.asarray(qa.tokenizer(
            ["what is the man doing"] * 3, max_length=8)["input_ids"]),
        "text_input_mask": jnp.asarray(qa.tokenizer(
            ["what is the man doing"] * 3, max_length=8)["attention_mask"]),
    }))
    want = int(np.argmax(qa_evals.pool_clip_logits(logits[:, None, :])[0]))
    assert res[0][0] == qa.label2ans[want]


def test_qa_predictor_cached_video_path():
    """encode_video + predict(feats) ≡ predict(clips): the cached fast path
    must be bit-identical to the full forward (same jitted tower, reused)."""
    from alpro_tpu.models import build_qa_model
    from alpro_tpu.serving.qa import VideoQAPredictor

    vis = TimeSformerConfig(
        img_size=32, patch_size=16, num_frames=2, embed_dim=16, depth=2,
        num_heads=2, drop_path_rate=0.0,
    )
    bert = BertConfig(
        vocab_size=100, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32, fusion_layer=1,
    )
    model = build_qa_model(bert, vis, num_labels=5, img_size=32, num_frm=2)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 2, 32, 32, 3), jnp.float32),
        jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32),
    )
    ans2label = {"cooking": 0, "running": 1, "eating": 2, "red": 3, "dog": 4}
    qa = VideoQAPredictor(
        model, params, WordPieceTokenizer(make_test_vocab()), ans2label,
        max_txt_len=8,
    )
    clips = np.random.RandomState(7).randint(0, 255, (2, 2, 32, 32, 3), np.uint8)
    feats = qa.encode_video(clips)
    assert feats.ndim == 3 and feats.shape[0] == 2
    for q in ("what is the man doing", "who is on the stage"):
        assert qa.predict(feats, q) == qa.predict(clips, q)


def test_qa_predict_batch_matches_sequential():
    """predict_batch (B questions, one dispatch) == per-question predict on
    both the pixel and the cached-feature input, for every pooling mode."""
    from alpro_tpu.models import build_qa_model
    from alpro_tpu.serving.qa import VideoQAPredictor

    vis = TimeSformerConfig(
        img_size=32, patch_size=16, num_frames=2, embed_dim=16, depth=2,
        num_heads=2, drop_path_rate=0.0,
    )
    bert = BertConfig(
        vocab_size=100, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32, fusion_layer=1,
    )
    model = build_qa_model(bert, vis, num_labels=5, img_size=32, num_frm=2)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 2, 32, 32, 3), jnp.float32),
        jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32),
    )
    ans2label = {"cooking": 0, "running": 1, "eating": 2, "red": 3, "dog": 4}
    qa = VideoQAPredictor(
        model, params, WordPieceTokenizer(make_test_vocab()), ans2label,
        max_txt_len=8,
    )
    clips = np.random.RandomState(3).randint(0, 255, (2, 2, 32, 32, 3), np.uint8)
    questions = ["what is the man doing", "who is on the stage", "dog"]

    feats = qa.encode_video(clips)
    for pool in ("mean", "max", "lse"):
        batched = qa.predict_batch(feats, questions, topk=5, pool=pool)
        assert len(batched) == len(questions)
        for q, got in zip(questions, batched):
            want = qa.predict(feats, q, topk=5, pool=pool)
            assert [g[0] for g in got] == [w[0] for w in want], (pool, q)
            np.testing.assert_allclose(
                [g[1] for g in got], [w[1] for w in want],
                rtol=1e-4, atol=1e-5,
            )
    # pixel input encodes the tower once, then matches the cached path
    from_pixels = qa.predict_batch(clips, questions[:2], topk=3)
    for got, q in zip(from_pixels, questions[:2]):
        want = qa.predict(feats, q, topk=3)
        assert [g[0] for g in got] == [w[0] for w in want]
        np.testing.assert_allclose(
            [g[1] for g in got], [w[1] for w in want], rtol=1e-4, atol=1e-5
        )
    assert qa.predict_batch(feats, []) == []


def test_sharded_index_matches_single_device(small_index):
    """ShardedRetrievalIndex over the 8-device mesh == RetrievalIndex:
    same ids, same ranking, same probs/sims — with a gallery size (6) that
    does NOT divide the mesh (pad rows must never surface)."""
    from alpro_tpu.core.mesh import make_mesh
    from alpro_tpu.serving import ShardedRetrievalIndex

    idx, clips = small_index
    mesh = make_mesh()
    sidx = ShardedRetrievalIndex(
        idx.model, idx.params, idx.tokenizer, mesh=mesh, max_txt_len=8, topk=3
    )
    more = np.concatenate([clips, clips[:2]])  # 6 videos: 8 ∤ 6
    ref = RetrievalIndex(idx.model, idx.params, idx.tokenizer,
                         max_txt_len=8, topk=3)
    for lo, hi, ids in ((0, 4, ["v0", "v1", "v2", "v3"]), (4, 6, ["v4", "v5"])):
        sidx.add_videos(more[lo:hi], ids=ids)
        ref.add_videos(more[lo:hi], ids=ids)

    for q, k in (("a dog runs", 3), ("the cat jumps", 5), ("hello", 6)):
        got = sidx.query(q, topk=k)
        want = ref.query(q, topk=k)
        assert [g[0] for g in got] == [w[0] for w in want], (q, got, want)
        np.testing.assert_allclose(
            [g[1] for g in got], [w[1] for w in want], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            [g[2] for g in got], [w[2] for w in want], rtol=1e-4, atol=1e-5
        )


def test_sharded_index_int8(small_index):
    """Sharded + int8 weight storage compose: ranking equals the unsharded
    int8 index (both dequantize the same QTensor tree)."""
    from alpro_tpu.core.mesh import make_mesh
    from alpro_tpu.serving import ShardedRetrievalIndex

    idx, clips = small_index
    # re-derive fp32 params from the fixture's (bf16-cast) tree
    params = idx.params
    mesh = make_mesh()
    sidx = ShardedRetrievalIndex(
        idx.model, params, idx.tokenizer, mesh=mesh, max_txt_len=8, topk=3,
        weights="int8",
    )
    ref = RetrievalIndex(idx.model, params, idx.tokenizer, max_txt_len=8,
                         topk=3, weights="int8")
    sidx.add_videos(clips, ids=["v0", "v1", "v2", "v3"])
    ref.add_videos(clips, ids=["v0", "v1", "v2", "v3"])
    got = sidx.query("a dog runs", topk=4)
    want = ref.query("a dog runs", topk=4)
    assert [g[0] for g in got] == [w[0] for w in want]
    np.testing.assert_allclose(
        [g[1] for g in got], [w[1] for w in want], rtol=1e-4, atol=1e-5
    )


def test_sharded_query_batch(small_index):
    """query_batch == per-query loop, one dispatch for B texts."""
    from alpro_tpu.core.mesh import make_mesh
    from alpro_tpu.serving import ShardedRetrievalIndex

    idx, clips = small_index
    mesh = make_mesh()
    sidx = ShardedRetrievalIndex(
        idx.model, idx.params, idx.tokenizer, mesh=mesh, max_txt_len=8, topk=3
    )
    sidx.add_videos(clips, ids=["v0", "v1", "v2", "v3"])
    texts = ["a dog runs", "the cat jumps", "hello"]
    batched = sidx.query_batch(texts, topk=3)
    assert len(batched) == 3
    for t, got in zip(texts, batched):
        want = sidx.query(t, topk=3)
        assert [g[0] for g in got] == [w[0] for w in want]
        np.testing.assert_allclose(
            [g[1] for g in got], [w[1] for w in want], rtol=1e-4, atol=1e-5
        )
