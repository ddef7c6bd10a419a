"""Full-protocol retrieval eval cost: the MSRVTT 1k×1k release gate.

Measures the complete `inference_retrieval` device work at flagship scale
(1000 videos × 1000 texts, VTM rerank over every pair — the protocol of
`/root/reference/src/tasks/run_video_retrieval.py:632-738`) on synthetic
inputs (cost is shape-dependent only):

  * text tower: 1000 texts encoded once (16 chunks of 64);
  * video tower: 1000 clips embedded (125 batches of 8);
  * rerank: every (video, chunk) pair through the 6 fusion layers + itm
    head — batched V×C pair dispatches (`make_fusion_score_pairs_fn`,
    8×64 = 512 pairs/dispatch, 2000 dispatches) vs the per-(video, chunk)
    loop the round-3 code used (16k dispatches; measured on a subset here).

Run: `timeout -s KILL 1800 python benchmarks/full_eval.py`.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_VIDEOS = 1000
N_TEXTS = 1000
T, S = 8, 224
L = 40
EVAL_BSZ = 64
VID_BSZ = 8
LOOP_SAMPLE_VIDEOS = 16  # per-video-loop style measured on this many videos


def main():
    import jax
    import jax.numpy as jnp

    from alpro_tpu.core.compile_cache import enable_compile_cache

    enable_compile_cache()

    from alpro_tpu.models import BertConfig, TimeSformerConfig, build_retrieval_model
    from alpro_tpu.train.step import (
        make_fusion_score_fn,
        make_fusion_score_pairs_fn,
        make_text_encode_fn,
        make_video_embed_fn,
    )

    vis = TimeSformerConfig(
        img_size=S, patch_size=16, num_frames=T, embed_dim=768, depth=12,
        num_heads=12, drop_path_rate=0.0, scan_blocks=True,
    )
    bert = BertConfig()
    model = build_retrieval_model(bert, vis, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, T, S, S, 3), jnp.bfloat16),
        jnp.zeros((1, L), jnp.int32), jnp.ones((1, L), jnp.int32),
    )
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    encode_text = jax.jit(make_text_encode_fn(model))
    embed_video = jax.jit(make_video_embed_fn(model))
    score_pairs = jax.jit(make_fusion_score_pairs_fn(model))
    score_one = jax.jit(make_fusion_score_fn(model))

    ids = rng.randint(100, 30000, (N_TEXTS, L)).astype(np.int32)
    mask = np.ones((N_TEXTS, L), np.int32)
    clips = [
        jax.device_put(
            rng.randint(0, 255, (VID_BSZ, T, S, S, 3), np.uint8)
        )
        for _ in range(4)
    ]

    out = {}

    # ---- text tower: 1000 texts once ----
    t0 = time.perf_counter()
    text_chunks = []
    for s0 in range(0, N_TEXTS, EVAL_BSZ):
        te, tf = encode_text(params, {
            "text_input_ids": ids[s0 : s0 + EVAL_BSZ],
            "text_input_mask": mask[s0 : s0 + EVAL_BSZ],
        })
        text_chunks.append((te, jnp.asarray(mask[s0 : s0 + EVAL_BSZ])))
    _ = float(text_chunks[-1][0].astype(jnp.float32).sum())  # close region
    out["text_tower_s"] = round(time.perf_counter() - t0, 2)

    # ---- video tower: 1000 clips ----
    t0 = time.perf_counter()
    vembeds = []
    for b in range(N_VIDEOS // VID_BSZ):
        ve, vf = embed_video(params, clips[b % len(clips)])
        vembeds.append(ve)
    _ = float(vembeds[-1].astype(jnp.float32).sum())
    out["video_tower_s"] = round(time.perf_counter() - t0, 2)

    # ---- rerank, batched V×C pair dispatches (the shipped eval loop) ----
    t0 = time.perf_counter()
    acc = None
    n_disp = 0
    for ve in vembeds:
        for te, tm in text_chunks:
            logits = score_pairs(params, te, tm, ve)  # (V, C, 2)
            r = logits.astype(jnp.float32).sum()
            acc = r if acc is None else acc + r
            n_disp += 1
    _ = float(acc)
    dt = time.perf_counter() - t0
    out["rerank_batched_s"] = round(dt, 2)
    out["rerank_dispatches"] = n_disp
    out["full_eval_1kx1k_s"] = round(
        out["text_tower_s"] + out["video_tower_s"] + dt, 2
    )

    # ---- rerank, --eval_rerank_topk 16 (serving-index candidate protocol:
    # each text reranks only its VTC top-16; device-resident token bank,
    # indices-only dispatches of 512 pairs) ----
    from alpro_tpu.train.step import make_fusion_rerank_bank_fn

    rerank_bank = jax.jit(make_fusion_rerank_bank_fn(model))
    K, PAIR_BSZ = 16, 512
    t0 = time.perf_counter()
    bank = jnp.concatenate(vembeds, axis=0)  # (1000, 1+N, D) device-resident
    cand = rng.randint(0, N_VIDEOS, (N_TEXTS, K)).astype(np.int32)
    acc = None
    n_disp_k = 0
    for ci, s0 in enumerate(range(0, N_TEXTS, EVAL_BSZ)):
        te, tm = text_chunks[ci]
        ntc = min(EVAL_BSZ, N_TEXTS - s0)
        tidx = np.repeat(np.arange(ntc, dtype=np.int32), K)
        vidx = cand[s0 : s0 + ntc].reshape(-1)
        ppad = (-tidx.shape[0]) % PAIR_BSZ
        tidx = np.concatenate([tidx, np.zeros(ppad, np.int32)])
        vidx = np.concatenate([vidx, np.zeros(ppad, np.int32)])
        for ps in range(0, tidx.shape[0], PAIR_BSZ):
            logits = rerank_bank(
                params, te, tm, bank,
                tidx[ps : ps + PAIR_BSZ], vidx[ps : ps + PAIR_BSZ],
            )
            r = logits.astype(jnp.float32).sum()
            acc = r if acc is None else acc + r
            n_disp_k += 1
    _ = float(acc)
    dtk = time.perf_counter() - t0
    out["rerank_topk16_s"] = round(dtk, 2)
    out["rerank_topk16_dispatches"] = n_disp_k
    out["full_eval_topk16_s"] = round(
        out["text_tower_s"] + out["video_tower_s"] + dtk, 2
    )

    # ---- rerank, per-(video, chunk) loop (round-3 style) on a subset ----
    t0 = time.perf_counter()
    acc = None
    for vi in range(LOOP_SAMPLE_VIDEOS):
        ve1 = vembeds[vi // VID_BSZ][vi % VID_BSZ : vi % VID_BSZ + 1]
        for te, tm in text_chunks:
            logits = score_one(params, te, tm, ve1)
            r = logits.astype(jnp.float32).sum()
            acc = r if acc is None else acc + r
    _ = float(acc)
    per_video_loop = (time.perf_counter() - t0) / LOOP_SAMPLE_VIDEOS
    out["rerank_loop_s_extrapolated_1k"] = round(per_video_loop * N_VIDEOS, 1)
    out["rerank_speedup_batched_vs_loop"] = round(
        per_video_loop * N_VIDEOS / dt, 2
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
