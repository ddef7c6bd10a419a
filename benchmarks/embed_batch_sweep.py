"""Embed-throughput batch sweep: is B=16 the right serving batch?

The bench headline measures the device-resident embed at B=16 (bench.py).
Larger batches amortize the per-step glue (scan carries, kernel grid
launch, readback sync) at the cost of latency; this sweeps B and reports
clips/s so the serving default is a measured choice.

Run: `timeout -s KILL 900 python benchmarks/embed_batch_sweep.py`.
"""

import time

import numpy as np

BATCHES = (8, 16, 32, 48)
T, S = 8, 224
ITERS = 12


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

    @jax.jit
    def embed_checksum(params, raw_uint8):
        return model.apply(params, raw_uint8).astype(jnp.float32).sum()

    rng = np.random.RandomState(0)
    for B in BATCHES:
        clips = [
            jax.device_put(
                rng.randint(0, 255, size=(B, T, S, S, 3), dtype=np.uint8)
            )
            for _ in range(2)
        ]
        t0 = time.perf_counter()
        _ = float(embed_checksum(params, clips[0]))
        compile_s = time.perf_counter() - t0
        best = 0.0
        for _trial in range(2):
            t0 = time.perf_counter()
            acc = None
            for i in range(ITERS):
                r = embed_checksum(params, clips[i % 2])
                acc = r if acc is None else acc + r
            _ = float(acc)
            best = max(best, B * ITERS / (time.perf_counter() - t0))
        print(f"B={B}: {best:.1f} clips/s ({B / best * 1e3:.1f} ms/batch, "
              f"compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
