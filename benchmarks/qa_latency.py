"""p50 per-question video-QA latency (the serving shape of open-ended QA).

One "question" is: tokenize, then one jitted forward — video tower over the
already-decoded clip(s), text tower, fusion, classifier head — through
`serving.qa.VideoQAPredictor.predict` (the same multi-clip ensembling the
reference evaluates with, `/root/reference/src/tasks/run_video_qa.py:251-279`).
Flagship shapes: ViT-B/16, BERT-base, T=16 frames (the reference QA config,
`config_release/msrvtt_qa.json`), MSRVTT-QA's 1500 answer labels.

Usage: python benchmarks/qa_latency.py [--n_clips 1] [--queries 30]
Prints one JSON line with p50/p90 ms per question.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure_qa_latency(n_clips=1, queries=30, num_frm=16, img_size=224,
                       num_labels=1500, max_txt_len=25) -> dict:
    import jax
    import jax.numpy as jnp

    from alpro_tpu.core.compile_cache import enable_compile_cache

    enable_compile_cache()

    from alpro_tpu.data.tokenization import WordPieceTokenizer, make_test_vocab
    from alpro_tpu.models import BertConfig, TimeSformerConfig, build_qa_model
    from alpro_tpu.serving.qa import VideoQAPredictor

    vis = TimeSformerConfig(
        img_size=img_size, patch_size=16, num_frames=num_frm,
        drop_path_rate=0.0, scan_blocks=True,
    )
    bert = BertConfig(scan_blocks=True)
    model = build_qa_model(bert, vis, num_labels=num_labels,
                           img_size=img_size, num_frm=num_frm,
                           dtype=jnp.bfloat16)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, num_frm, img_size, img_size, 3), jnp.bfloat16),
        jnp.zeros((1, max_txt_len), jnp.int32),
        jnp.ones((1, max_txt_len), jnp.int32),
    )
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    ans2label = {f"answer_{i}": i for i in range(num_labels)}
    qa = VideoQAPredictor(
        model, params, WordPieceTokenizer(make_test_vocab()), ans2label,
        max_txt_len=max_txt_len,
    )
    rng = np.random.RandomState(0)
    clips = rng.randint(
        0, 255, (n_clips, num_frm, img_size, img_size, 3), np.uint8
    )

    t0 = time.perf_counter()
    qa.predict(clips, "what is the man doing")  # predict() reads back probs
    compile_s = time.perf_counter() - t0

    questions = ["what is the man doing", "who is on the stage",
                 "how many dogs are running", "where is the red car"]

    lat = []
    for i in range(queries):
        t0 = time.perf_counter()
        qa.predict(clips, questions[i % len(questions)])
        lat.append((time.perf_counter() - t0) * 1e3)
    lat.sort()

    # cached-video fast path: encode once, every question pays text+fusion+
    # head only (beyond-reference — the reference re-runs the tower per pair)
    feats = qa.encode_video(clips)
    qa.predict(feats, questions[0])  # compile the cached graph
    enc = []
    for _ in range(5):
        t0 = time.perf_counter()
        f = qa.encode_video(clips)
        f.block_until_ready()
        float(jnp.sum(f[..., 0]))  # tunnel-safe timing close (scalar readback)
        enc.append((time.perf_counter() - t0) * 1e3)
    cached = []
    for i in range(queries):
        t0 = time.perf_counter()
        qa.predict(feats, questions[i % len(questions)])
        cached.append((time.perf_counter() - t0) * 1e3)
    cached.sort()

    # H2D share of the per-question cost: device_put of one clip batch,
    # closed by a scalar readback
    h2d = []
    for _ in range(5):
        t0 = time.perf_counter()
        dev = jax.device_put(clips)
        float(jnp.sum(dev[..., 0, 0, 0].astype(jnp.int32)))
        h2d.append((time.perf_counter() - t0) * 1e3)

    # host↔device dispatch floor: one jitted scalar op + scalar readback —
    # the per-call latency no serving path can go below on this transport
    tiny = jax.jit(lambda s: s + 1.0)
    float(tiny(jnp.float32(0.0)))
    floor = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(tiny(jnp.float32(0.0)))
        floor.append((time.perf_counter() - t0) * 1e3)

    # device-side per-question cost: chain Q questions inside one jit
    # (lax.scan over pre-staged token ids) + scalar readback — dispatch
    # floor amortized, tunnel H2D excluded; the per-question number a
    # production serving loop sees. Measured for both the full path (video
    # tower re-runs per question) and the cached-video fast path.
    from alpro_tpu.train.step import make_qa_inference_fn

    infer = make_qa_inference_fn(model)
    Q = 8
    all_ids = jnp.asarray(
        rng.randint(0, 30522, (Q, n_clips, max_txt_len)).astype(np.int32)
    )
    qmask = jnp.ones((n_clips, max_txt_len), jnp.int32)
    clips_dev = jax.device_put(clips)

    @jax.jit
    def chained_full(params, clips, all_ids, mask):
        def body(acc, ids):
            logits = infer(params, {
                "visual_inputs": clips,
                "text_input_ids": ids, "text_input_mask": mask,
            })
            return acc + logits.astype(jnp.float32).sum(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), all_ids)
        return acc

    @jax.jit
    def chained_cached(params, feats, all_ids, mask):
        def body(acc, ids):
            logits = infer(params, {
                "video_embeds": feats,
                "text_input_ids": ids, "text_input_mask": mask,
            })
            return acc + logits.astype(jnp.float32).sum(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), all_ids)
        return acc

    _ = float(chained_full(qa.params, clips_dev, all_ids, qmask))
    dev_full = np.inf
    for _trial in range(2):
        t0 = time.perf_counter()
        _ = float(chained_full(qa.params, clips_dev, all_ids, qmask))
        dev_full = min(dev_full, (time.perf_counter() - t0) * 1e3 / Q)

    _ = float(chained_cached(qa.params, feats, all_ids, qmask))
    dev_cached = np.inf
    for _trial in range(2):
        t0 = time.perf_counter()
        _ = float(chained_cached(qa.params, feats, all_ids, qmask))
        dev_cached = min(dev_cached, (time.perf_counter() - t0) * 1e3 / Q)

    return {
        "device_ms_full": float(dev_full),
        "device_ms_cached": float(dev_cached),
        "p50_ms": lat[len(lat) // 2],
        "p90_ms": lat[int(len(lat) * 0.9)],
        "cached_p50_ms": cached[len(cached) // 2],
        "cached_p90_ms": cached[int(len(cached) * 0.9)],
        "encode_ms": sorted(enc)[len(enc) // 2],
        "h2d_ms": sorted(h2d)[len(h2d) // 2],
        "dispatch_floor_ms": sorted(floor)[len(floor) // 2],
        "compile_s": compile_s,
    }


def measure_qa_batched(n_clips=1, batch_sizes=(8, 16), num_frm=16,
                       img_size=224, num_labels=1500, max_txt_len=25,
                       n_chained=4) -> dict:
    """Batched-question QA THROUGHPUT against one cached video — the
    device path of `VideoQAPredictor.predict_batch` ((B·n_clips) question×
    clip pairs through text + fusion + head in one jit), scan-chained and
    closed by a scalar readback. The interactive-session shape: encode the
    video once, answer B questions per dispatch."""
    import jax
    import jax.numpy as jnp

    from alpro_tpu.core.compile_cache import enable_compile_cache

    enable_compile_cache()

    from alpro_tpu.models import BertConfig, TimeSformerConfig, build_qa_model
    from alpro_tpu.train.step import (
        make_qa_inference_fn,
        make_qa_video_encode_fn,
    )

    vis = TimeSformerConfig(
        img_size=img_size, patch_size=16, num_frames=num_frm,
        drop_path_rate=0.0, scan_blocks=True,
    )
    bert = BertConfig(scan_blocks=True)
    model = build_qa_model(bert, vis, num_labels=num_labels,
                           img_size=img_size, num_frm=num_frm,
                           dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    L = max_txt_len
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, num_frm, img_size, img_size, 3), jnp.bfloat16),
        jnp.zeros((1, L), jnp.int32), jnp.ones((1, L), jnp.int32),
    )
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    clips = rng.randint(
        0, 255, (n_clips, num_frm, img_size, img_size, 3), np.uint8
    )
    feats = jax.jit(make_qa_video_encode_fn(model))(params, clips)
    feats.block_until_ready()
    infer = make_qa_inference_fn(model)

    out = {"n_clips": n_clips, "num_labels": num_labels}
    for B in batch_sizes:
        pairs = B * n_clips
        all_ids = jnp.asarray(
            rng.randint(0, 30522, (n_chained, pairs, L)).astype(np.int32)
        )
        mask = jnp.ones((pairs, L), jnp.int32)
        feats_rep = jnp.tile(feats, (B, 1, 1))

        @jax.jit
        def chained(params, feats_rep, all_ids, mask):
            def body(acc, ids):
                logits = infer(params, {
                    "video_embeds": feats_rep,
                    "text_input_ids": ids, "text_input_mask": mask,
                })
                return acc + logits.astype(jnp.float32).sum(), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), all_ids)
            return acc

        _ = float(chained(params, feats_rep, all_ids, mask))
        best = np.inf
        for _trial in range(2):
            t0 = time.perf_counter()
            _ = float(chained(params, feats_rep, all_ids, mask))
            best = min(best, time.perf_counter() - t0)
        out[f"device_qps_b{B}"] = float(B * n_chained / best)
        out[f"device_ms_per_question_b{B}"] = float(
            best * 1e3 / (B * n_chained)
        )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_clips", type=int, default=1)
    ap.add_argument("--queries", type=int, default=30)
    ap.add_argument("--num_frm", type=int, default=16)
    ap.add_argument("--batched", action="store_true",
                    help="measure batched predict_batch throughput against "
                         "one cached video")
    ap.add_argument("--batch_sizes", type=int, nargs="+", default=[8, 16])
    args = ap.parse_args()
    if args.batched:
        r = measure_qa_batched(n_clips=args.n_clips, num_frm=args.num_frm,
                               batch_sizes=tuple(args.batch_sizes))
        print(json.dumps({
            "metric": f"batched video-QA serving throughput (ViT-B/16 "
                      f"T={args.num_frm}, {args.n_clips} cached clip(s), "
                      f"1500 labels)",
            **{k: (round(v, 2) if isinstance(v, float) else v)
               for k, v in r.items()},
        }), flush=True)
        return
    r = measure_qa_latency(n_clips=args.n_clips, queries=args.queries,
                           num_frm=args.num_frm)
    print(json.dumps({
        "metric": f"video-QA latency per question (ViT-B/16 T={args.num_frm}, "
                  f"{args.n_clips} clip(s), 1500 labels)",
        "p50_ms": round(r["p50_ms"], 1),
        "p90_ms": round(r["p90_ms"], 1),
        "cached_p50_ms": round(r["cached_p50_ms"], 1),
        "cached_p90_ms": round(r["cached_p90_ms"], 1),
        "encode_ms": round(r["encode_ms"], 1),
        "h2d_ms": round(r["h2d_ms"], 1),
        "dispatch_floor_ms": round(r["dispatch_floor_ms"], 1),
        "device_ms_full": round(r["device_ms_full"], 1),
        "device_ms_cached": round(r["device_ms_cached"], 1),
        "unit": "ms",
        "compile_s": round(r["compile_s"], 1),
    }), flush=True)


if __name__ == "__main__":
    main()
