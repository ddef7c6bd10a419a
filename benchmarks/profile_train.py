"""Profile the retrieval TRAIN step and print the device-op family breakdown.

Same trace-aggregation method as profile_embed.py, applied to the full
training step (VTC + hard-negative VTM, backward, AdamW) at the bench
configuration (B=8, unrolled blocks, remat=dots_ln, bf16 first moment) —
the data behind docs/PERF.md's training-throughput ladder: it shows where
the ~180 ms/step goes (matmul vs recompute glue vs optimizer traffic).

Run: `timeout -s KILL 1800 python benchmarks/profile_train.py
        [--remat_policy dots_ln] [--scan 0]`.
"""

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.profile_embed import family  # noqa: E402  (family collapser)

B, ITERS = 8, 6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--remat_policy", type=str, default="dots_ln")
    ap.add_argument("--scan", type=int, default=0)
    ap.add_argument("--mu_dtype", type=str, default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_default_prng_impl", "rbg")
    except Exception:
        pass
    from alpro_tpu.core.compile_cache import enable_compile_cache

    enable_compile_cache()

    from alpro_tpu.models import BertConfig, TimeSformerConfig, build_retrieval_model
    from alpro_tpu.train import TrainState, build_optimizer, get_lr_schedule
    from alpro_tpu.train.step import make_retrieval_train_step

    num_frm, img_size = 8, 224
    vis = TimeSformerConfig(
        img_size=img_size, patch_size=16, num_frames=num_frm, depth=12,
        drop_path_rate=0.1, scan_blocks=bool(args.scan),
        gradient_checkpointing=True, remat_policy=args.remat_policy,
    )
    bert = BertConfig(scan_blocks=bool(args.scan),
                      gradient_checkpointing=True,
                      remat_policy=args.remat_policy)
    model = build_retrieval_model(bert, vis, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    L = 40
    data = {
        "visual_inputs": jax.device_put(
            rng.randint(0, 255, (B, num_frm, img_size, img_size, 3), np.uint8)
        ),
        "text_input_ids": jnp.asarray(rng.randint(0, 30522, (B, L)).astype(np.int32)),
        "text_input_mask": jnp.ones((B, L), jnp.int32),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, num_frm, img_size, img_size, 3), jnp.bfloat16),
        data["text_input_ids"][:1], data["text_input_mask"][:1],
    )
    tx = build_optimizer(get_lr_schedule("linear", 1e-4, 1000), grad_norm=5.0,
                         mu_dtype=args.mu_dtype)
    step = jax.jit(make_retrieval_train_step(model, tx), donate_argnums=(0,))
    state = TrainState.create(params, tx)
    key = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    state, m = step(state, data, key)
    _ = float(m["loss"])
    print(f"compile {time.perf_counter() - t0:.0f}s", flush=True)

    tdir = tempfile.mkdtemp(prefix="alpro_prof_train_")
    with jax.profiler.trace(tdir):
        last = None
        for _ in range(ITERS):
            state, m = step(state, data, key)
            last = m["loss"]
        _ = float(last)

    traces = glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"), recursive=True)
    assert traces, f"no trace written under {tdir}"
    with gzip.open(traces[0], "rt") as f:
        tdata = json.load(f)

    names = {}
    for ev in tdata.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            names[ev["pid"]] = ev.get("args", {}).get("name", "")
    device_pids = {
        pid for pid, n in names.items()
        if "tpu" in n.lower() or "device" in n.lower() or "/device" in n.lower()
    }
    fam_us = defaultdict(float)
    fam_n = defaultdict(int)
    top_ops = defaultdict(float)
    total_us = 0.0
    for ev in tdata.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        name = ev.get("name", "")
        dur = float(ev.get("dur", 0.0))
        # skip umbrella events: the whole-step jit program and bare
        # iteration-counter markers (they'd double-count every leaf op)
        if name.startswith(("RunExecutable", "Thread", "Steal", "jit_")):
            continue
        if name.isdigit():
            continue
        # classify by the HLO long_name when present — XLA matmul fusions
        # are named `fusion.N` on the op lane and only the long_name
        # (`%fusion.N = ... dot(...)` / "kind=kCustom...") says what's inside
        args = ev.get("args", {}) or {}
        longname = str(args.get("long_name", "")) + " " + str(args.get("hlo_op", ""))
        fam = family(name if family(name) != "elementwise fusion" else
                     (longname if longname.strip() else name))
        if fam == "other" and longname.strip():
            fam = family(longname)
        fam_us[fam] += dur
        fam_n[fam] += 1
        top_ops[name] += dur
        total_us += dur

    print(f"lanes={sorted(names[p] for p in device_pids)}")
    print(f"{'family':34s} {'ms/step':>8s} {'calls/step':>11s}")
    for fam, us in sorted(fam_us.items(), key=lambda kv: -kv[1]):
        print(f"{fam:34s} {us / 1e3 / ITERS:8.2f} {fam_n[fam] / ITERS:11.1f}")
    print(f"{'TOTAL device time':34s} {total_us / 1e3 / ITERS:8.2f}")
    print("\ntop 25 individual ops (ms/step):")
    for name, us in sorted(top_ops.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {us / 1e3 / ITERS:8.2f}  {name[:100]}")


if __name__ == "__main__":
    main()
