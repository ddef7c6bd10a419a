"""Text↔video retrieval: finetuning + inference.

CLI-compatible with the reference entry point
(`/root/reference/src/tasks/run_video_retrieval.py`):

    python -m alpro_tpu.cli.run_video_retrieval --config configs/msrvtt_ret.json \
        --output_dir out/ [--do_inference 1]
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List

import jax
import numpy as np

from alpro_tpu.cli import common
from alpro_tpu.core.config import Config, get_video_retrieval_args
from alpro_tpu.core.logging import LOGGER, TB_LOGGER
from alpro_tpu.data.datasets import (
    RetrievalCollator,
    RetrievalDataset,
    RetrievalEvalDataset,
    load_datalist,
)
from alpro_tpu.data.loader import BatchLoader, InfiniteIterator
from alpro_tpu.data.tokenization import build_tokenizer
from alpro_tpu.evals.retrieval import eval_retrieval
from alpro_tpu.train.step import make_retrieval_train_step


def _mk_datasets(cfg: Config, tokenizer):
    train_rows = load_datalist(cfg.train_datasets[0]["txt"])
    if cfg.get("data_ratio", 1.0) < 1.0:
        train_rows = train_rows[: max(1, int(len(train_rows) * cfg.data_ratio))]
    train_ds = RetrievalDataset(
        train_rows, cfg.train_datasets[0]["img"],
        num_frm=cfg.num_frm,
        frm_sampling_strategy=cfg.get("frm_sampling_strategy", "rand"),
        resize_size=cfg.resize_size, crop_size=cfg.crop_img_size,
        seed=cfg.get("seed", 42), fps=cfg.get("fps", -1),
    )
    collator = RetrievalCollator(tokenizer, cfg.max_txt_len)
    # per-host stripe of the dataset + 1/P of the global batch (the
    # reference's DistributedSampler, `run_video_retrieval.py:115-117`)
    from alpro_tpu.core.distributed import data_shards, local_batch_size

    num_shards, shard_id = data_shards()
    train_loader = BatchLoader(
        train_ds, collator, local_batch_size(cfg.train_batch_size),
        shuffle=True, seed=cfg.get("seed", 42),
        num_shards=num_shards, shard_id=shard_id,
        num_workers=int(cfg.get("n_workers", 4)),
    )
    val_rows = load_datalist(cfg.val_datasets[0]["txt"])
    eval_ds = RetrievalEvalDataset(
        val_rows, cfg.val_datasets[0]["img"], num_frm=cfg.num_frm,
        resize_size=cfg.resize_size, crop_size=cfg.crop_img_size,
        fps=cfg.get("fps", -1),
    )
    return train_loader, eval_ds, collator


# keyed by id(model) with the model pinned in the value: the pin keeps the
# id from being recycled after GC, and the identity check guards regardless
_INFER_CACHE: Dict[int, tuple] = {}


def _jit_eval_fns(model):
    key = id(model)
    cached = _INFER_CACHE.get(key)
    if cached is None or cached[0] is not model:
        from alpro_tpu.train.step import (
            make_fusion_rerank_bank_fn,
            make_fusion_score_pairs_fn,
            make_text_encode_fn,
            make_video_embed_fn,
        )

        _INFER_CACHE[key] = (
            model,
            (
                jax.jit(make_text_encode_fn(model)),
                jax.jit(make_video_embed_fn(model)),
                jax.jit(make_fusion_score_pairs_fn(model)),
                jax.jit(make_fusion_rerank_bank_fn(model)),
            ),
        )
    return _INFER_CACHE[key][1]


def inference_retrieval(model, params, eval_ds, tokenizer, cfg: Config) -> List[dict]:
    """Retrieval eval protocol (`run_video_retrieval.py:632-738`): every text
    scored against every video; ranking score = P(match) from the VTM head,
    VTC sim carried alongside.

    Faster-than-reference structure: the text tower runs ONCE per text (the
    reference re-encodes every text for every video); each video's tower runs
    once, and only the fusion half runs per (video, text-chunk) pair.
    """
    encode_text, embed_video, fusion_score, _ = _jit_eval_fns(model)
    eval_bsz = int(cfg.get("inference_batch_size", 64))
    rerank_topk = int(cfg.get("eval_rerank_topk", 0))
    if rerank_topk > 0 and not cfg.get("eval_vtc_only", False):
        return _inference_retrieval_topk(
            model, params, eval_ds, tokenizer, cfg, rerank_topk
        )

    texts = eval_ds.texts
    enc = tokenizer([t["caption"] for t in texts], max_length=cfg.max_txt_len)
    all_ids = np.asarray(enc["input_ids"], np.int32)
    all_mask = np.asarray(enc["attention_mask"], np.int32)
    n_text = len(texts)
    pad = (-n_text) % eval_bsz
    ids_p = np.concatenate([all_ids, np.zeros((pad, all_ids.shape[1]), np.int32)])
    mask_p = np.concatenate([all_mask, np.zeros((pad, all_mask.shape[1]), np.int32)])

    # 1) encode every text once, in fixed-size chunks (one compilation)
    text_embeds_chunks, text_feat_chunks = [], []
    for start in range(0, ids_p.shape[0], eval_bsz):
        te, tf = encode_text(params, {
            "text_input_ids": ids_p[start : start + eval_bsz],
            "text_input_mask": mask_p[start : start + eval_bsz],
        })
        text_embeds_chunks.append(te)
        text_feat_chunks.append(tf)
    text_feat_all = np.concatenate([np.asarray(t) for t in text_feat_chunks])[:n_text]

    temp = float(np.clip(np.asarray(params["params"]["temp"]), 0.001, 0.5))

    # 2) encode videos in batches (the reference embeds one video per forward;
    # batching keeps the MXU fed during the tower pass). Across hosts, videos
    # stripe by process index and results merge at the end — the multihost
    # version of the reference's tmp-JSON-per-rank join
    # (`run_video_retrieval.py:697-728`).
    # --eval_vtc_only 1: rank by the VTC similarity alone (skips the VTM
    # fusion pass — ~10x cheaper validation during training; final eval should
    # use the full protocol, whose ranking score is the VTM P(match))
    vtc_only = bool(cfg.get("eval_vtc_only", False))
    vid_bsz = int(cfg.get("eval_video_batch_size", 8))
    n_videos = len(eval_ds) if not cfg.get("debug") else min(5, len(eval_ds))
    try:
        proc, nproc = jax.process_index(), jax.process_count()
    except RuntimeError:
        proc, nproc = 0, 1
    my_videos = list(range(proc, n_videos, nproc))

    results = []
    st = time.time()
    for vstart in range(0, len(my_videos), vid_bsz):
        vend = min(vstart + vid_bsz, len(my_videos))
        videos = [eval_ds.get_video(my_videos[vi]) for vi in range(vstart, vend)]
        clips = np.stack([v["clip"] for v in videos])
        if clips.shape[0] < vid_bsz:  # pad to fixed shape → one compilation
            pad = vid_bsz - clips.shape[0]
            clips = np.concatenate([clips, np.repeat(clips[-1:], pad, 0)])
        video_embeds, vfeat = embed_video(params, clips)
        sims_block = np.asarray(vfeat) @ text_feat_all.T / temp  # (vb, n_text)
        if not vtc_only:
            # one dispatch scores ALL vid_bsz videos against a text chunk
            # (V×C pairs batched into the fusion forward) — vs the
            # reference's per-(video, chunk) loop,
            # `run_video_retrieval.py:644-670`
            probs_block = np.empty((len(videos), n_text), np.float32)
            for ci, start in enumerate(range(0, ids_p.shape[0], eval_bsz)):
                logits = fusion_score(
                    params, text_embeds_chunks[ci],
                    mask_p[start : start + eval_bsz],
                    video_embeds,
                )  # (vid_bsz, eval_bsz, 2)
                probs = np.asarray(jax.nn.softmax(logits, axis=-1))[..., 1]
                end = min(start + eval_bsz, n_text)
                probs_block[:, start:end] = probs[: len(videos), : end - start]
        for bi, video in enumerate(videos):
            sims = sims_block[bi]
            row = sims if vtc_only else probs_block[bi]
            for j in range(n_text):
                results.append(dict(
                    vid_id=video["vid_id"],
                    txt_id=texts[j]["txt_id"],
                    score=float(row[j]),
                    sim=float(sims[j]),
                ))
        if (vend % 50) < vid_bsz:
            LOGGER.info("scored %d/%d videos (%.1fs)", vend, len(my_videos),
                        time.time() - st)
    if nproc > 1:
        from alpro_tpu.parallel.host_sync import all_gather_list

        results = [r for shard in all_gather_list(results) for r in shard]
    return results


def _inference_retrieval_topk(model, params, eval_ds, tokenizer, cfg, K):
    """`--eval_rerank_topk K`: the serving-index candidate protocol applied
    to the eval gate. Towers run exactly as in the full protocol, but the
    VTM fusion reranks only each text's K best VTC candidates (vs all V —
    the dominant release-gate cost, docs/PERF.md round 4: 198.3 of 222.6 s
    at 1k×1k). Non-candidates keep a VTC-ordered score strictly below every
    reranked score (0.5 + atan(sim)/π ∈ (0, 1); reranked = 1 + P(match) ∈
    (1, 2)) — data-independent, so scores stay comparable across host
    shards. Ranking is identical to the full protocol whenever the
    protocol's own top ranks lie inside the VTC top-K (K ≥ V: provably
    identical; tested in tests/test_retrieval_inference.py). Under
    multihost video striping each host reranks its *local* top-K per text —
    a superset of that shard's members of the global top-K (the
    ShardedRetrievalIndex two-stage argument).

    Direction semantics of the combined score: the (1, 2) / (0, 1) band
    construction above is exact for text→video (each text's column ranks
    its own candidates first, VTC order below). evals/retrieval.py also
    ranks the transposed matrix for video→text, where a video's row mixes
    the two bands: texts that shortlisted this video rank by VTM prob,
    all other texts fall below by construction — a coarser approximation
    than t2v since a video's *own* VTC top texts need not have shortlisted
    it. K=0 (default) and K ≥ V remain exact in both directions; with
    0 < K < V treat video2text metrics as approximate (documented in
    docs/PARITY.md)."""
    encode_text, embed_video, _, rerank_bank = _jit_eval_fns(model)
    eval_bsz = int(cfg.get("inference_batch_size", 64))
    pair_bsz = int(cfg.get("eval_pair_batch_size", 512))

    texts = eval_ds.texts
    enc = tokenizer([t["caption"] for t in texts], max_length=cfg.max_txt_len)
    all_ids = np.asarray(enc["input_ids"], np.int32)
    all_mask = np.asarray(enc["attention_mask"], np.int32)
    n_text = len(texts)
    pad = (-n_text) % eval_bsz
    ids_p = np.concatenate([all_ids, np.zeros((pad, all_ids.shape[1]), np.int32)])
    mask_p = np.concatenate([all_mask, np.zeros((pad, all_mask.shape[1]), np.int32)])

    text_embeds_chunks, text_feat_chunks = [], []
    for start in range(0, ids_p.shape[0], eval_bsz):
        te, tf = encode_text(params, {
            "text_input_ids": ids_p[start : start + eval_bsz],
            "text_input_mask": mask_p[start : start + eval_bsz],
        })
        text_embeds_chunks.append(te)
        text_feat_chunks.append(tf)
    text_feat_all = np.concatenate(
        [np.asarray(t) for t in text_feat_chunks]
    )[:n_text]

    temp = float(np.clip(np.asarray(params["params"]["temp"]), 0.001, 0.5))
    vid_bsz = int(cfg.get("eval_video_batch_size", 8))
    n_videos = len(eval_ds) if not cfg.get("debug") else min(5, len(eval_ds))
    try:
        proc, nproc = jax.process_index(), jax.process_count()
    except RuntimeError:
        proc, nproc = 0, 1
    my_videos = list(range(proc, n_videos, nproc))

    st = time.time()
    # 1) video towers once; token embeds stay device-resident as the bank
    embed_blocks, vfeat_rows, vid_ids = [], [], []
    for vstart in range(0, len(my_videos), vid_bsz):
        vend = min(vstart + vid_bsz, len(my_videos))
        videos = [eval_ds.get_video(my_videos[vi]) for vi in range(vstart, vend)]
        clips = np.stack([v["clip"] for v in videos])
        if clips.shape[0] < vid_bsz:
            clips = np.concatenate(
                [clips, np.repeat(clips[-1:], vid_bsz - clips.shape[0], 0)]
            )
        video_embeds, vfeat = embed_video(params, clips)
        embed_blocks.append(video_embeds[: len(videos)])
        vfeat_rows.append(np.asarray(vfeat)[: len(videos)])
        vid_ids.extend(v["vid_id"] for v in videos)
    n_local = len(vid_ids)
    if n_local == 0:
        # empty local video shard (multihost striping with process_count >
        # n_videos, or debug's 5-video cap): nothing to rerank, but this
        # host must still join the collective gather so peers don't hang
        results = []
        if nproc > 1:
            from alpro_tpu.parallel.host_sync import all_gather_list

            results = [r for shard in all_gather_list(results) for r in shard]
        return results
    import jax.numpy as jnp

    bank = jnp.concatenate(embed_blocks, axis=0)  # (V_local, 1+N, D), device
    sims = np.concatenate(vfeat_rows) @ text_feat_all.T / temp  # (V_local, n_text)
    k = min(K, n_local)

    # 2) per text: VTC top-k local candidates → batched pair rerank.
    # cand_idx[j] = the k local video rows text j reranks
    cand_idx = np.argpartition(-sims, k - 1, axis=0)[:k].T  # (n_text, k)
    probs = np.zeros((n_text, k), np.float32)
    for ci, start in enumerate(range(0, ids_p.shape[0], eval_bsz)):
        end = min(start + eval_bsz, n_text)
        if end <= start:
            break
        ntc = end - start
        tidx = np.repeat(np.arange(ntc, dtype=np.int32), k)
        vidx = cand_idx[start:end].reshape(-1).astype(np.int32)
        npairs = tidx.shape[0]
        ppad = (-npairs) % pair_bsz
        tidx = np.concatenate([tidx, np.zeros(ppad, np.int32)])
        vidx = np.concatenate([vidx, np.zeros(ppad, np.int32)])
        chunk_probs = np.empty(npairs + ppad, np.float32)
        for ps in range(0, npairs + ppad, pair_bsz):
            logits = rerank_bank(
                params, text_embeds_chunks[ci], mask_p[start : start + eval_bsz],
                bank, tidx[ps : ps + pair_bsz], vidx[ps : ps + pair_bsz],
            )
            chunk_probs[ps : ps + pair_bsz] = np.asarray(
                jax.nn.softmax(logits, axis=-1)
            )[:, 1]
        probs[start:end] = chunk_probs[:npairs].reshape(ntc, k)
        if (end % (eval_bsz * 4)) < eval_bsz:
            LOGGER.info("reranked %d/%d texts (%.1fs)", end, n_text,
                        time.time() - st)

    # 3) combined scores: candidates 1+P(match), the rest VTC-ordered < 1
    scores = 0.5 + np.arctan(sims) / np.pi
    scores[cand_idx.T, np.arange(n_text)[None, :]] = 1.0 + probs.T

    results = []
    for bi in range(n_local):
        for j in range(n_text):
            results.append(dict(
                vid_id=vid_ids[bi],
                txt_id=texts[j]["txt_id"],
                score=float(scores[bi, j]),
                sim=float(sims[bi, j]),
            ))
    if nproc > 1:
        from alpro_tpu.parallel.host_sync import all_gather_list

        results = [r for shard in all_gather_list(results) for r in shard]
    return results


def validate(model, state, eval_ds, tokenizer, cfg, step):
    params = jax.device_get(state.params)
    results = inference_retrieval(model, params, eval_ds, tokenizer, cfg)
    vids_scored = {r["vid_id"] for r in results}
    results = [r for r in results]  # full protocol needs all videos; debug trims
    if cfg.get("debug"):
        keep_txt = {r["txt_id"] for r in results}
        gt = {t: v for t, v in eval_ds.gt_txt_id2vid_id.items()
              if t in keep_txt and v in vids_scored}
        results = [r for r in results if r["txt_id"] in gt]
    else:
        gt = eval_ds.gt_txt_id2vid_id
    try:
        metrics = eval_retrieval(results, gt)
    except (AssertionError, IndexError) as e:
        LOGGER.warning("retrieval eval skipped: %s", e)
        return {}
    LOGGER.info("step %s retrieval: %s", step, json.dumps(metrics))
    TB_LOGGER.log_scalar_dict(
        {f"t2v_{k}": v for k, v in metrics["text2video"].items()}, prefix="val"
    )
    return metrics


def start_training(cfg: Config):
    common.setup_environment(cfg)
    tokenizer = build_tokenizer(cfg.tokenizer_dir)
    model = common.build_model_from_cfg(cfg, "retrieval")
    train_loader, eval_ds, _ = _mk_datasets(cfg, tokenizer)

    mesh, step_fn, state, num_steps, restorer = common.setup_training(
        cfg, model,
        lambda m, tx: make_retrieval_train_step(
            m, tx, num_local_blocks=cfg.get("vtm_negative_blocks", 1)
        ),
        steps_per_epoch=len(train_loader),
    )
    LOGGER.info("training retrieval for %d steps on %s", num_steps, mesh)

    state = common.run_train_loop(
        cfg, mesh, step_fn, state, InfiniteIterator(train_loader), num_steps,
        restorer=restorer,
        validate_fn=lambda s, gs: validate(model, s, eval_ds, tokenizer, cfg, gs),
        save_model_fn=common.default_save_model_fn(cfg, model),
    )
    validate(model, state, eval_ds, tokenizer, cfg, "final")
    if cfg.get("output_dir"):
        common.default_save_model_fn(cfg, model)(
            state, int(np.asarray(jax.device_get(state.step)))
        )
    return state


def start_inference(cfg: Config):
    common.setup_environment(cfg)
    # reference behaviour: stored train args override all but *inference* keys
    # (`run_video_retrieval.py:766-770`). The eval-protocol knobs are
    # inference-tunable too — a stored train-time value must not clobber the
    # depth/protocol chosen for this eval run.
    stored = os.path.join(cfg.output_dir or "", "log", "args.json")
    if os.path.exists(stored):
        with open(stored) as f:
            train_args = json.load(f)
        keep = ("output_dir", "eval_rerank_topk", "eval_vtc_only")
        for k, v in train_args.items():
            if "inference" not in k and k not in keep:
                cfg[k] = Config._wrap(v)
    tokenizer = build_tokenizer(cfg.tokenizer_dir)
    model = common.build_model_from_cfg(cfg, "retrieval")
    params = common.load_inference_params(model, cfg)

    txt = cfg.inference_txt_db or cfg.val_datasets[0]["txt"]
    img = cfg.inference_img_db or cfg.val_datasets[0]["img"]
    eval_ds = RetrievalEvalDataset(
        load_datalist(txt), img, num_frm=cfg.num_frm,
        resize_size=cfg.resize_size, crop_size=cfg.crop_img_size,
        fps=cfg.get("fps", -1),
    )
    results = inference_retrieval(model, params, eval_ds, tokenizer, cfg)
    gt = eval_ds.gt_txt_id2vid_id
    if cfg.get("debug"):
        # debug caps the scored videos at 5 (`--debug`, config.py:45-48
        # parity) — restrict the protocol to the scored subset like
        # validate() does, instead of KeyError-ing on unscored gt videos
        vids_scored = {r["vid_id"] for r in results}
        gt = {t: v for t, v in gt.items() if v in vids_scored}
        results = [r for r in results if r["txt_id"] in gt]
    metrics = eval_retrieval(results, gt)
    LOGGER.info("inference retrieval: %s", json.dumps(metrics))
    from alpro_tpu.core.distributed import is_primary

    if cfg.get("output_dir") and is_primary():
        out = os.path.join(cfg.output_dir, "results.json")
        with open(out, "w") as f:
            json.dump({"metrics": metrics, "results": results}, f)
        LOGGER.info("wrote %s", out)
    return metrics


def main():
    cfg = get_video_retrieval_args()
    if cfg.get("do_inference"):
        start_inference(cfg)
    else:
        start_training(cfg)


if __name__ == "__main__":
    main()
