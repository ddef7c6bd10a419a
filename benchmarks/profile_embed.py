"""Profile the serving embed (prepatch+fold) and print the device-op family
breakdown — the data behind docs/PERF.md's roofline/closure argument.

Runs ITERS embed steps under jax.profiler.trace, then aggregates the
TensorBoard trace's device-lane events by op-name family (ms per step).

Run: `timeout -s KILL 900 python benchmarks/profile_embed.py`.
"""

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

T, S, B = 8, 224, 16
ITERS = 8


def build():
    import jax
    import jax.numpy as jnp

    from alpro_tpu.core.compile_cache import enable_compile_cache

    enable_compile_cache()

    from alpro_tpu.models import TimeSformer, TimeSformerConfig

    cfg = TimeSformerConfig(
        img_size=S, patch_size=16, num_frames=T, embed_dim=768, depth=12,
        num_heads=12, drop_path_rate=0.0, scan_blocks=True,
        fold_uint8_norm="on",
    )
    model = TimeSformer(cfg, dtype=jnp.bfloat16)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, T, S, S, 3), jnp.bfloat16)
    )
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )

    @jax.jit
    def embed_checksum(params, x):
        return model.apply(params, x).astype(jnp.float32).sum()

    rng = np.random.RandomState(0)
    p = 16
    hp = S // p
    pre = [
        rng.randint(0, 255, size=(B, T, S, S, 3), dtype=np.uint8)
        .reshape(B, T, hp, p, hp, p, 3)
        .transpose(0, 1, 2, 4, 3, 5, 6)
        .reshape(B, T, hp * hp, p * p * 3)
        for _ in range(2)
    ]
    feeds = [jax.device_put(v) for v in pre]
    return embed_checksum, params, feeds


def family(name: str) -> str:
    """Collapse an XLA op name to a coarse family."""
    n = name.lower()
    for key in (
        "fused_temporal_attention", "fused_attention", "fused_ln_mlp",
        "fused_ln_matmul",
    ):
        if key in n:
            return key
    for key in ("convolution", "dot", "cumsum"):
        if key in n:
            return "matmul_fusion" if "fusion" in n else "matmul"
    for key in ("copy", "transpose"):
        if key in n:
            return "copy/transpose"
    for key in ("reduce", "convert"):
        if key in n:
            return "convert/reduce (LN stats)"
    if "pad" in n:
        return "pad"
    if "slice" in n:
        return "slice"
    if "fusion" in n:
        return "elementwise fusion"
    return "other"


def main():
    import jax

    embed_checksum, params, feeds = build()
    t0 = time.perf_counter()
    _ = float(embed_checksum(params, feeds[0]))
    print(f"compile {time.perf_counter() - t0:.0f}s", flush=True)

    tdir = tempfile.mkdtemp(prefix="alpro_prof_")
    with jax.profiler.trace(tdir):
        acc = None
        for i in range(ITERS):
            r = embed_checksum(params, feeds[i % len(feeds)])
            acc = r if acc is None else acc + r
        _ = float(acc)

    traces = glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"), recursive=True)
    assert traces, f"no trace written under {tdir}"
    with gzip.open(traces[0], "rt") as f:
        data = json.load(f)

    # device lanes: pid whose process_name mentions TPU/device; fall back to
    # lanes carrying XLA op events (args with 'long_name' / hlo)
    names = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            names[ev["pid"]] = ev.get("args", {}).get("name", "")
    device_pids = {
        pid for pid, n in names.items()
        if "tpu" in n.lower() or "device" in n.lower() or "/device" in n.lower()
    }
    fam_us = defaultdict(float)
    fam_n = defaultdict(int)
    total_us = 0.0
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        name = ev.get("name", "")
        dur = float(ev.get("dur", 0.0))
        # skip lane-aggregate markers
        if name.startswith(("RunExecutable", "Thread", "Steal")):
            continue
        fam_us[family(name)] += dur
        fam_n[family(name)] += 1
        total_us += dur

    print(f"lanes={sorted(names[p] for p in device_pids)}")
    print(f"{'family':34s} {'ms/step':>8s} {'calls/step':>11s}")
    for fam, us in sorted(fam_us.items(), key=lambda kv: -kv[1]):
        print(f"{fam:34s} {us / 1e3 / ITERS:8.2f} {fam_n[fam] / ITERS:11.1f}")
    print(f"{'TOTAL device time':34s} {total_us / 1e3 / ITERS:8.2f}")


if __name__ == "__main__":
    main()
