"""Standalone T=16 temporal-attention lowering probe (QA-config shapes).

Round-4 closure measured the δ-band kernel losing to XLA at T=16 (8.39 vs
7.27 ms, B=16) because its cross-lane band reductions are VPU work scaling
with T². The seg variant (`_temporal_kernel_seg`) moves those reductions
onto the MXU; at T=8 it lost 10× in-model (docs/PERF.md round 3), but its
arithmetic-intensity tradeoff changes with T — this probe closes the
"re-tune seg for T=16" angle (STATUS_R4 known gaps) with a number.

Usage: python benchmarks/temporal_t16_probe.py [--T 16] [--B 16] [--iters 20]
Prints one JSON line: ms per call for xla / fused (δ-band, N-blocked) / seg,
plus seg-vs-xla max abs error.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn, x, iters, reps=3):
    """Per-call device time with the tunnel's ~30 ms dispatch floor
    amortized: queue `iters` async dispatches back-to-back (device executes
    them sequentially; host issue overlaps), close the region with ONE
    scalar readback, divide."""
    import jax.numpy as jnp

    float(jnp.sum(fn(x)[0, 0, 0, :8].astype(jnp.float32)))  # compile + sync
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(x)
        float(jnp.sum(out[0, 0, 0, :8].astype(jnp.float32)))
        best.append((time.perf_counter() - t0) * 1e3 / iters)
    return min(best)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--T", type=int, default=16)
    ap.add_argument("--B", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from alpro_tpu.core.compile_cache import enable_compile_cache

    enable_compile_cache()

    import alpro_tpu.ops.pallas_qkv_attn as qkv_mod

    B, T, N, D, H = args.B, args.T, 196, 768, 12
    qkv = jax.random.normal(
        jax.random.PRNGKey(0), (B, T, N, 3 * D), jnp.bfloat16
    )
    scale = (D // H) ** -0.5

    xla = jax.jit(
        lambda x: qkv_mod._temporal_xla_reference(x, H, scale)
    )
    fused = jax.jit(lambda x: qkv_mod._temporal_fwd_impl(x, H, scale))

    def seg_call(x):
        qkv_mod._TEMPORAL_SEG = True
        try:
            return qkv_mod._temporal_fwd_impl(x, H, scale)
        finally:
            qkv_mod._TEMPORAL_SEG = False

    res = {"metric": f"temporal attention lowering at T={T} (B={B}, N={N}, "
                     f"D={D})", "unit": "ms"}
    res["xla_ms"] = round(_time(xla, qkv, args.iters), 2)
    res["fused_ms"] = round(_time(fused, qkv, args.iters), 2)
    try:
        seg = jax.jit(seg_call)
        err = float(jnp.max(jnp.abs(
            seg(qkv).astype(jnp.float32) - xla(qkv).astype(jnp.float32)
        )))
        res["seg_ms"] = round(_time(seg, qkv, args.iters), 2)
        res["seg_max_err"] = round(err, 4)
    except Exception as e:  # Mosaic compile failures are a result, not a bug
        res["seg_error"] = f"{type(e).__name__}: {str(e)[:200]}"
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
