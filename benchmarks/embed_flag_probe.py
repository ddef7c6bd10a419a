"""Round-5 XLA compiler-flag probe on the serving-embed headline.

Same lever as benchmarks/train_flag_sweep.py (per-computation
`jax.jit(compiler_options=...)`, verifiably parsed by the axon remote
compiler), applied to the exact headline configuration bench.py measures:
TimeSformer-B/16 8×224 bf16, B=16, pre-patchified uint8 input with folded
normalize, scanned blocks, device-resident feeds.

Round 4 closed the ≥5× target at 261.9 clips/s against a 268 clips/s
zero-dispatch-gap ceiling (97% occupancy, docs/PERF.md) — the flags probed
here (scoped-VMEM budget, latency-hiding scheduler) are the only untried
knobs that could move the *device time* itself. Prints one JSON line per
config; baseline (no options) first, same-phase.

Usage: timeout -s KILL 5400 python benchmarks/embed_flag_probe.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 1)[0])

T, S, B = 8, 224, 16
ITERS = 16

CONFIGS = [
    ("baseline", None),
    ("vmem32", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem64", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("lhs", {"xla_tpu_enable_latency_hiding_scheduler": "True"}),
]


def main():
    import jax
    import jax.numpy as jnp

    from alpro_tpu.core.compile_cache import enable_compile_cache

    enable_compile_cache()

    from alpro_tpu.models import TimeSformer, TimeSformerConfig

    cfg = TimeSformerConfig(
        img_size=S, patch_size=16, num_frames=T, embed_dim=768, depth=12,
        num_heads=12, drop_path_rate=0.0, scan_blocks=True,
    )
    model = TimeSformer(cfg, dtype=jnp.bfloat16)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, T, S, S, 3), jnp.bfloat16)
    )
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    rng = np.random.RandomState(0)
    p, hp = 16, S // 16
    pre = [
        rng.randint(0, 255, size=(B, T, S, S, 3), dtype=np.uint8)
        .reshape(B, T, hp, p, hp, p, 3)
        .transpose(0, 1, 2, 4, 3, 5, 6)
        .reshape(B, T, hp * hp, p * p * 3)
        for _ in range(4)
    ]
    feeds = [jax.device_put(v) for v in pre]

    for name, copts in CONFIGS:
        t_cfg = time.perf_counter()
        try:
            fn = jax.jit(
                lambda params, x: model.apply(params, x)
                .astype(jnp.float32).sum(),
                compiler_options=copts,
            )
            t0 = time.perf_counter()
            first = float(fn(params, feeds[0]))
            compile_s = time.perf_counter() - t0
            assert np.isfinite(first)
            best = 0.0
            for _trial in range(2):
                t0 = time.perf_counter()
                acc = None
                for i in range(ITERS):
                    r = fn(params, feeds[i % len(feeds)])
                    acc = r if acc is None else acc + r
                _ = float(acc)  # readback closes the region
                best = max(best, B * ITERS / (time.perf_counter() - t0))
            out = {"config": name, "copts": copts,
                   "clips_per_sec": round(best, 2),
                   "ms_per_batch": round(B / best * 1e3, 2),
                   "compile_s": round(compile_s, 1)}
        except Exception as e:
            out = {"config": name, "copts": copts,
                   "error": f"{type(e).__name__}: {str(e)[:200]}"}
        out["wall_s"] = round(time.perf_counter() - t_cfg, 1)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
