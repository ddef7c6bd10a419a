"""Text↔video retrieval evaluation protocol.

Reference: `/root/reference/src/tasks/run_video_retrieval.py:515-629`.
The ranking score for each (text, video) pair is the VTM head's P(match)
softmax probability (`:683`), with the VTC similarity carried alongside;
metrics are R@1/5/10, median rank and mean rank in both directions.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Sequence

import numpy as np


def retrieval_metrics_from_matrix(
    score_matrix: np.ndarray, gt_cols: np.ndarray
) -> Dict[str, float]:
    """score_matrix: (num_q, num_c); gt_cols[i] = ground-truth column of row i.

    Rank = position of the GT column when the row is sorted descending
    (1-indexed), exactly the bool-matrix construction of
    `run_video_retrieval.py:516-558`.
    """
    num_q = score_matrix.shape[0]
    order = np.argsort(-score_matrix, axis=1, kind="stable")
    ranks = np.empty(num_q, dtype=np.int64)
    for i in range(num_q):
        ranks[i] = int(np.where(order[i] == gt_cols[i])[0][0]) + 1
    return dict(
        r1=100.0 * float(np.mean(ranks <= 1)),
        r5=100.0 * float(np.mean(ranks <= 5)),
        r10=100.0 * float(np.mean(ranks <= 10)),
        medianR=float(np.median(ranks)),
        meanR=float(np.mean(ranks)),
    )


def eval_retrieval(
    vid_txt_score_dicts: Sequence[dict],
    gt_txt_id2vid_id: Dict,
    id2data: Dict = None,
) -> Dict[str, Dict[str, float]]:
    """Same I/O contract as the reference `eval_retrieval`
    (`run_video_retrieval.py:559-629`): a list of
    {vid_id, txt_id, score, sim} pair dicts → text2video + video2text metrics.
    Duplicate (txt, vid) pairs are dropped keeping the first occurrence."""
    by_txt: Dict = defaultdict(dict)
    for d in vid_txt_score_dicts:
        if d["vid_id"] not in by_txt[d["txt_id"]]:
            by_txt[d["txt_id"]][d["vid_id"]] = d

    txt_ids = list(by_txt.keys())
    any_txt = txt_ids[0]
    vid_ids = list(by_txt[any_txt].keys())
    num_vid = len(vid_ids)
    assert len(set(vid_ids)) == num_vid, "duplicate videos for a caption"
    for t, pairs in by_txt.items():
        assert len(pairs) == num_vid, "every caption must score every video"

    txt_id2idx = {t: i for i, t in enumerate(txt_ids)}
    vid_id2idx = {v: i for i, v in enumerate(vid_ids)}

    score = np.zeros((len(txt_ids), num_vid), dtype=np.float32)
    for t, pairs in by_txt.items():
        for v, d in pairs.items():
            score[txt_id2idx[t], vid_id2idx[v]] = d["score"]

    t2v_gt = np.asarray(
        [vid_id2idx[gt_txt_id2vid_id[t]] for t in txt_ids], dtype=np.int64
    )
    t2v = retrieval_metrics_from_matrix(score, t2v_gt)

    gt_vid2txt = {v: t for t, v in gt_txt_id2vid_id.items()}
    # the inversion keeps one caption per video — only valid for 1:1
    # protocols (MSRVTT-1k, DiDeMo paragraph retrieval). Multi-caption v2t
    # would need best-rank-over-captions; fail loudly instead of silently
    # scoring against an arbitrary caption.
    assert len(gt_vid2txt) == len(gt_txt_id2vid_id), (
        "video2text eval requires a 1:1 text<->video ground truth; got "
        f"{len(gt_txt_id2vid_id)} captions over {len(gt_vid2txt)} videos"
    )
    v2t_gt = np.asarray(
        [txt_id2idx[gt_vid2txt[v]] for v in vid_ids], dtype=np.int64
    )
    v2t = retrieval_metrics_from_matrix(score.T, v2t_gt)
    return dict(text2video=t2v, video2text=v2t)
