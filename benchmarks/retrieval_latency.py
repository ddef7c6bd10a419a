"""p50 per-query retrieval latency benchmark (BASELINE.json metric #3).

A "query" is one text arriving against an indexed gallery of videos whose
embeddings are precomputed (the serving shape of text→video retrieval):
  1. tokenize + text tower (layers 0..fusion) + projection;
  2. VTC similarity against the cached video feature bank → top-k candidates;
  3. VTM rerank: fusion half over [text, cached video tokens] for the top-k.

Usage: python benchmarks/retrieval_latency.py [--gallery 1000] [--topk 16]
Prints a JSON line with p50/p90 latency in ms.
Importable as `measure_latency(...)` (used by bench.py).
"""

import argparse
import json
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure_latency(gallery=1000, topk=16, n_queries=50, num_frm=8,
                    img_size=224, max_txt_len=40) -> dict:
    import jax
    import jax.numpy as jnp

    from alpro_tpu.models import BertConfig, TimeSformerConfig, build_retrieval_model
    from alpro_tpu.train.step import make_fusion_score_fn, make_text_encode_fn

    vis = TimeSformerConfig(
        img_size=img_size, patch_size=16, num_frames=num_frm,
        drop_path_rate=0.0, scan_blocks=True,
    )
    bert = BertConfig(scan_blocks=True)
    model = build_retrieval_model(bert, vis, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    L = max_txt_len
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, num_frm, img_size, img_size, 3), jnp.bfloat16),
        jnp.zeros((1, L), jnp.int32), jnp.ones((1, L), jnp.int32),
    )

    # cached gallery: video token banks would live in HBM in serving; the
    # latency path only touches the top-k slice of them
    N = vis.num_patches + 1
    video_feat_bank = jnp.asarray(rng.randn(gallery, 256).astype(np.float32))
    video_feat_bank = video_feat_bank / jnp.linalg.norm(
        video_feat_bank, axis=-1, keepdims=True
    )
    topk_tokens = jnp.asarray(
        rng.randn(topk, N, 768).astype(np.float32), jnp.bfloat16
    )

    encode_text = jax.jit(make_text_encode_fn(model))
    fusion_score = jax.jit(make_fusion_score_fn(model))

    @jax.jit
    def query(params, ids, mask, bank, topk_tokens):
        text_embeds, tfeat = encode_text(params, {
            "text_input_ids": ids, "text_input_mask": mask,
        })
        sims = (tfeat @ bank.T)[0]
        _top = jax.lax.top_k(sims, topk)
        te_rep = jnp.broadcast_to(
            text_embeds, (topk,) + text_embeds.shape[1:]
        )
        mask_rep = jnp.broadcast_to(mask, (topk,) + mask.shape[1:])
        logits = fusion_score(params, te_rep, mask_rep, topk_tokens)
        return sims, logits

    ids = jnp.asarray(rng.randint(0, 30522, (1, L)).astype(np.int32))
    mask = jnp.ones((1, L), jnp.int32)
    sims, logits = query(params, ids, mask, video_feat_bank, topk_tokens)
    _ = np.asarray(logits)  # compile + sync

    lat = []
    for i in range(n_queries):
        ids = jnp.asarray(rng.randint(0, 30522, (1, L)).astype(np.int32))
        t0 = time.perf_counter()
        sims, logits = query(params, ids, mask, video_feat_bank, topk_tokens)
        _ = np.asarray(logits)
        lat.append((time.perf_counter() - t0) * 1000)
    lat = np.asarray(lat)

    # device-side per-query cost: chain Q queries inside ONE jit (lax.scan
    # over pre-staged ids) and close with a scalar readback — amortizes the
    # per-dispatch host↔device floor (~33 ms on this tunnel, docs/PERF.md)
    # and excludes H2D, i.e. the number a production host's serving loop
    # would see per query once dispatches are pipelined.
    Q = 32
    all_ids = jnp.asarray(rng.randint(0, 30522, (Q, 1, L)).astype(np.int32))

    @jax.jit
    def chained(params, all_ids, mask, bank, topk_tokens):
        def body(acc, ids):
            sims, logits = query(params, ids, mask, bank, topk_tokens)
            return acc + logits.astype(jnp.float32).sum(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), all_ids)
        return acc

    _ = float(chained(params, all_ids, mask, video_feat_bank, topk_tokens))
    device_ms = np.inf
    for _trial in range(2):
        t0 = time.perf_counter()
        _ = float(chained(params, all_ids, mask, video_feat_bank, topk_tokens))
        device_ms = min(device_ms, (time.perf_counter() - t0) * 1000 / Q)

    return {
        "p50_ms": float(np.percentile(lat, 50)),
        "p90_ms": float(np.percentile(lat, 90)),
        "device_ms_per_query": float(device_ms),
    }


def measure_batched(gallery=1000, topk=16, batch_sizes=(8, 16), num_frm=8,
                    img_size=224, max_txt_len=40, n_chained=4) -> dict:
    """Batched-query serving THROUGHPUT through the shipped
    `RetrievalIndex._batched_query_fn` (the exact `query_batch` device
    path): B texts per dispatch — text tower + VTC top-k + (B·k)-pair VTM
    rerank in one jit. Device-side queries/s via `n_chained` scan-chained
    batches closed by a scalar readback (dispatch floor amortized), plus
    the tunnel-inclusive e2e ms per batch."""
    import jax
    import jax.numpy as jnp

    from alpro_tpu.core.compile_cache import enable_compile_cache

    enable_compile_cache()

    from alpro_tpu.models import (
        BertConfig,
        TimeSformerConfig,
        build_retrieval_model,
    )
    from alpro_tpu.serving import RetrievalIndex

    vis = TimeSformerConfig(
        img_size=img_size, patch_size=16, num_frames=num_frm,
        drop_path_rate=0.0, scan_blocks=True,
    )
    bert = BertConfig(scan_blocks=True)
    model = build_retrieval_model(bert, vis, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    L = max_txt_len
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, num_frm, img_size, img_size, 3), jnp.bfloat16),
        jnp.zeros((1, L), jnp.int32), jnp.ones((1, L), jnp.int32),
    )

    # index with injected synthetic banks (embedding 1000 real videos is
    # the embed benchmark's job; the query path only reads the banks)
    idx = RetrievalIndex(model, params, tokenizer=None,
                         max_txt_len=L, topk=topk)
    N = vis.num_patches + 1
    feats = rng.randn(gallery, 256).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    idx.ids = [f"v{i}" for i in range(gallery)]
    idx._feat_chunks = [feats]
    idx._token_chunks = [
        np.asarray(jnp.asarray(
            rng.randn(gallery, N, 768).astype(np.float32), jnp.bfloat16
        ))
    ]
    feats_d, tokens_d = idx._device_banks()

    out = {"gallery": gallery, "topk": topk}
    for B in batch_sizes:
        qfn = idx._batched_query_fn(topk)
        ids1 = jnp.asarray(rng.randint(0, 30522, (B, L)).astype(np.int32))
        mask = jnp.ones((B, L), jnp.int32)
        probs, sims, ti = qfn(idx.params, feats_d, tokens_d, ids1, mask)
        _ = np.asarray(probs)  # compile + sync

        e2e = []
        for _i in range(6):
            t0 = time.perf_counter()
            probs, sims, ti = qfn(idx.params, feats_d, tokens_d, ids1, mask)
            _ = np.asarray(probs)
            e2e.append((time.perf_counter() - t0) * 1e3)
        out[f"e2e_ms_per_batch_b{B}"] = float(np.median(e2e))

        all_ids = jnp.asarray(
            rng.randint(0, 30522, (n_chained, B, L)).astype(np.int32)
        )

        @jax.jit
        def chained(params, feats, tokens, all_ids, mask):
            def body(acc, ids):
                probs, _s, _i = qfn(params, feats, tokens, ids, mask)
                return acc + probs.astype(jnp.float32).sum(), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), all_ids)
            return acc

        _ = float(chained(idx.params, feats_d, tokens_d, all_ids, mask))
        best = np.inf
        for _trial in range(2):
            t0 = time.perf_counter()
            _ = float(chained(idx.params, feats_d, tokens_d, all_ids, mask))
            best = min(best, time.perf_counter() - t0)
        out[f"device_qps_b{B}"] = float(B * n_chained / best)
        out[f"device_ms_per_query_b{B}"] = float(
            best * 1e3 / (B * n_chained)
        )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gallery", type=int, default=1000)
    ap.add_argument("--topk", type=int, default=16)
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument("--num_frm", type=int, default=8)
    ap.add_argument("--img_size", type=int, default=224)
    ap.add_argument("--max_txt_len", type=int, default=40)
    ap.add_argument("--batched", action="store_true",
                    help="measure batched query_batch throughput instead "
                         "of per-query latency")
    ap.add_argument("--batch_sizes", type=int, nargs="+", default=[8, 16])
    args = ap.parse_args()
    if args.batched:
        r = measure_batched(
            gallery=args.gallery, topk=args.topk,
            batch_sizes=tuple(args.batch_sizes), num_frm=args.num_frm,
            img_size=args.img_size, max_txt_len=args.max_txt_len,
        )
        print(json.dumps({
            "metric": f"batched retrieval serving throughput "
                      f"(gallery={args.gallery}, topk={args.topk})",
            **{k: (round(v, 2) if isinstance(v, float) else v)
               for k, v in r.items()},
        }))
        return
    r = measure_latency(
        gallery=args.gallery, topk=args.topk, n_queries=args.queries,
        num_frm=args.num_frm, img_size=args.img_size,
        max_txt_len=args.max_txt_len,
    )
    print(json.dumps({
        "metric": f"p50 per-query retrieval latency (gallery={args.gallery}, topk={args.topk} VTM rerank)",
        "value": round(r["p50_ms"], 2),
        "unit": "ms",
        "p90_ms": round(r["p90_ms"], 2),
        "device_ms_per_query": round(r["device_ms_per_query"], 2),
    }))


if __name__ == "__main__":
    main()
