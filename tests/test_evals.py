"""Retrieval + QA metric tests."""

import numpy as np

from alpro_tpu.evals import eval_retrieval, pool_clip_logits, retrieval_metrics_from_matrix
from alpro_tpu.evals.qa import evaluate_qa


def test_retrieval_metrics_perfect():
    score = np.eye(10, dtype=np.float32)
    m = retrieval_metrics_from_matrix(score, np.arange(10))
    assert m["r1"] == 100.0 and m["medianR"] == 1.0 and m["meanR"] == 1.0


def test_retrieval_metrics_known_ranks():
    # 4 queries; GT ranks: 1, 2, 6, 11
    num_c = 20
    score = np.zeros((4, num_c), dtype=np.float32)
    gt = np.array([3, 5, 7, 9])
    ranks = [1, 2, 6, 11]
    for i, (g, r) in enumerate(zip(gt, ranks)):
        score[i, g] = 5.0  # GT above the 0 default, below competitors
        # r-1 competitors above
        others = [c for c in range(num_c) if c != g][: r - 1]
        for o in others:
            score[i, o] = 20.0
    m = retrieval_metrics_from_matrix(score, gt)
    assert m["r1"] == 25.0
    assert m["r5"] == 50.0
    assert m["r10"] == 75.0
    assert m["medianR"] == 4.0
    assert m["meanR"] == 5.0


def test_eval_retrieval_contract():
    # 3 texts × 3 videos; VTM score ranks GT first for texts 0, 1; second for 2
    pairs = []
    gt = {0: "v0", 1: "v1", 2: "v2"}
    scores = {
        (0, "v0"): 0.9, (0, "v1"): 0.1, (0, "v2"): 0.2,
        (1, "v0"): 0.2, (1, "v1"): 0.8, (1, "v2"): 0.3,
        (2, "v0"): 0.7, (2, "v1"): 0.1, (2, "v2"): 0.6,
    }
    for (t, v), s in scores.items():
        pairs.append({"txt_id": t, "vid_id": v, "score": s, "sim": s})
    # duplicates must be dropped keeping first
    pairs.append({"txt_id": 0, "vid_id": "v0", "score": 0.0, "sim": 0.0})
    m = eval_retrieval(pairs, gt)
    np.testing.assert_allclose(m["text2video"]["r1"], 100 * 2 / 3, rtol=1e-6)
    assert m["video2text"]["r1"] > 0


def test_pool_clip_logits():
    rng = np.random.RandomState(0)
    logits = rng.randn(3, 4, 5).astype(np.float32)
    np.testing.assert_allclose(pool_clip_logits(logits, "mean"), logits.mean(0))
    np.testing.assert_allclose(pool_clip_logits(logits, "max"), logits.max(0))
    lse = pool_clip_logits(logits, "lse")
    want = np.log(np.exp(logits).sum(0))
    np.testing.assert_allclose(lse, want, rtol=1e-5)


def test_evaluate_qa_per_type():
    qid2data = {
        0: {"answer": "dog", "answer_type": "what"},
        1: {"answer": "cat", "answer_type": "what"},
        2: {"answer": "mary", "answer_type": "who"},
    }
    label2ans = {0: "dog", 1: "cat", 2: "mary"}
    results = [
        {"question_id": 0, "answer": 0},  # correct
        {"question_id": 1, "answer": 0},  # wrong
        {"question_id": 2, "answer": 2},  # correct
    ]
    m = evaluate_qa(results, qid2data, label2ans, task_type="msvd_qa")
    np.testing.assert_allclose(m["overall_acc"], 2 / 3)
    np.testing.assert_allclose(m["what_acc"], 0.5)
    np.testing.assert_allclose(m["who_acc"], 1.0)
    assert m["ratios"]["what_ratio"][1] == 2


def test_eval_retrieval_multi_caption_v2t_best_rank():
    """Multi-caption protocol (MSRVTT full split): a video's v2t rank is the
    BEST rank among its ground-truth captions; t2v is unchanged (each caption
    has one ground-truth video)."""
    from alpro_tpu.evals.retrieval import eval_retrieval

    # 2 videos, 3 captions: v0 has captions {t0, t1}, v1 has {t2}.
    # Scores: v0 ranks its captions [t1(0.8) > t2(0.5) > t0(0.3)] — best GT
    # rank 1; v1 ranks [t0(0.9) > t2(0.6) > t1(0.2)] — GT t2 at rank 2.
    results = [
        {"txt_id": "t0", "vid_id": "v0", "score": 0.3, "sim": 0.1},
        {"txt_id": "t1", "vid_id": "v0", "score": 0.8, "sim": 0.1},
        {"txt_id": "t2", "vid_id": "v0", "score": 0.5, "sim": 0.1},
        {"txt_id": "t0", "vid_id": "v1", "score": 0.9, "sim": 0.1},
        {"txt_id": "t1", "vid_id": "v1", "score": 0.2, "sim": 0.1},
        {"txt_id": "t2", "vid_id": "v1", "score": 0.6, "sim": 0.1},
    ]
    gt = {"t0": "v0", "t1": "v0", "t2": "v1"}
    m = eval_retrieval(results, gt)
    v2t = m["video2text"]
    assert v2t["r1"] == 50.0      # v0 rank 1, v1 rank 2
    assert v2t["r5"] == 100.0
    assert v2t["meanR"] == 1.5
    # t2v: t0 GT v0 scored (0.3 vs v1's 0.9) -> rank 2; t1 GT v0 (0.8 vs
    # 0.2) -> rank 1; t2 GT v1 (0.6 vs 0.5) -> rank 1
    t2v = m["text2video"]
    np.testing.assert_allclose(t2v["r1"], 100 * 2 / 3, rtol=1e-6)
    assert t2v["meanR"] == (2 + 1 + 1) / 3


def test_retrieval_metrics_multi_gt_reduces_to_single():
    """With exactly one GT column per row, multi-GT metrics equal the
    single-GT implementation on the same matrix."""
    from alpro_tpu.evals.retrieval import retrieval_metrics_multi_gt

    rng = np.random.RandomState(0)
    score = rng.rand(12, 9).astype(np.float32)
    gt = rng.randint(0, 9, size=12)
    a = retrieval_metrics_from_matrix(score, gt)
    b = retrieval_metrics_multi_gt(score, [[int(g)] for g in gt])
    assert a == b
