"""Serving-embed input-path ladder: raw vs norm-folded vs pre-patchified.

Measures the flagship embed (TimeSformer-B/16, 8x224, bf16, B=16) across the
three device-side input paths, same-phase so tunnel drift can't fake a win:

  raw            raw uint8 (B,T,H,W,3), literal normalize → fp32 patchify
                 relayout → embed matmul (the round-3 benched default)
  raw+fold       raw uint8, normalize folded into the embed matmul
                 (fold_uint8_norm) — the patchify relayout moves 1-byte
                 uint8, the separate normalize pass disappears
  prepatch+fold  pre-patchified uint8 (B,T,N,768) from the host media lib
                 (`alpro_repack_patches`) — no on-device patchify relayout
                 at all; same bytes over PCIe as raw

Run: `timeout -s KILL 900 python benchmarks/embed_variants.py`.
`--sweep-batch` instead measures prepatch+fold at B=16/32/64 (clips/s/chip
is batch-free — serving embed picks its own batch; larger B amortizes
per-dispatch overhead and widens the VPU-bound temporal-attention tiles).
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T, S, B = 8, 224, 16
ITERS = 16


def measure_embed_variant(model, params, feeds, iters=ITERS, trials=2,
                          batch=B):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def embed_checksum(params, x):
        return model.apply(params, x).astype(jnp.float32).sum()

    t0 = time.perf_counter()
    first = float(embed_checksum(params, feeds[0]))
    compile_s = time.perf_counter() - t0
    assert np.isfinite(first)
    best = 0.0
    for _trial in range(trials):
        t0 = time.perf_counter()
        acc = None
        for i in range(iters):
            r = embed_checksum(params, feeds[i % len(feeds)])
            acc = r if acc is None else acc + r
        _ = float(acc)  # readback closes the region (tunnel: see PERF.md)
        best = max(best, batch * iters / (time.perf_counter() - t0))
    return best, compile_s, first


def main():
    import jax
    import jax.numpy as jnp

    from alpro_tpu.core.compile_cache import enable_compile_cache

    enable_compile_cache()

    from alpro_tpu.models import TimeSformer, TimeSformerConfig

    base = TimeSformerConfig(
        img_size=S, patch_size=16, num_frames=T, embed_dim=768, depth=12,
        num_heads=12, drop_path_rate=0.0, scan_blocks=True,
    )
    model_off = TimeSformer(
        dataclasses.replace(base, fold_uint8_norm="off"), dtype=jnp.bfloat16
    )
    model_on = TimeSformer(
        dataclasses.replace(base, fold_uint8_norm="on"), dtype=jnp.bfloat16
    )
    params = model_off.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, T, S, S, 3), jnp.bfloat16)
    )
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )

    rng = np.random.RandomState(0)
    raws = [rng.randint(0, 255, size=(B, T, S, S, 3), dtype=np.uint8)
            for _ in range(4)]
    p = 16
    hp = S // p
    pre = [
        r.reshape(B, T, hp, p, hp, p, 3)
        .transpose(0, 1, 2, 4, 3, 5, 6)
        .reshape(B, T, hp * hp, p * p * 3)
        for r in raws
    ]

    raw_dev = [jax.device_put(r) for r in raws]
    pre_dev = [jax.device_put(v) for v in pre]

    for name, model, feeds in (
        ("raw", model_off, raw_dev),
        ("raw+fold", model_on, raw_dev),
        ("prepatch+fold", model_on, pre_dev),
    ):
        cps, compile_s, chk = measure_embed_variant(model, params, feeds)
        print(
            f"{name:16s} {cps:7.1f} clips/s  ({B / cps * 1e3:5.1f} ms/batch, "
            f"compile {compile_s:.0f}s, checksum {chk:.1f})",
            flush=True,
        )


def scan_dispatch():
    """prepatch+fold with all ITERS batches device-resident and ONE dispatch:
    a lax.scan over the batch stack inside a single jit. Isolates per-dispatch
    host/tunnel overhead from chip throughput — a production server issues
    large device-side work per dispatch the same way."""
    import jax
    import jax.numpy as jnp

    from alpro_tpu.core.compile_cache import enable_compile_cache

    enable_compile_cache()

    from alpro_tpu.models import TimeSformer, TimeSformerConfig

    base = TimeSformerConfig(
        img_size=S, patch_size=16, num_frames=T, embed_dim=768, depth=12,
        num_heads=12, drop_path_rate=0.0, scan_blocks=True,
        fold_uint8_norm="on",
    )
    model = TimeSformer(base, dtype=jnp.bfloat16)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, T, S, S, 3), jnp.bfloat16)
    )
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    rng = np.random.RandomState(0)
    p = 16
    hp = S // p
    pre = np.stack([
        rng.randint(0, 255, size=(B, T, S, S, 3), dtype=np.uint8)
        .reshape(B, T, hp, p, hp, p, 3)
        .transpose(0, 1, 2, 4, 3, 5, 6)
        .reshape(B, T, hp * hp, p * p * 3)
        for _ in range(4)
    ])
    xs = jax.device_put(np.concatenate([pre] * (ITERS // 4)))  # (ITERS, B, T, N, K)

    @jax.jit
    def embed_scan(params, xs):
        def body(acc, x):
            return acc + model.apply(params, x).astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
        return acc

    t0 = time.perf_counter()
    first = float(embed_scan(params, xs))
    print(f"compile {time.perf_counter() - t0:.0f}s, checksum {first:.1f}",
          flush=True)
    assert np.isfinite(first)
    best = 0.0
    for _trial in range(3):
        t0 = time.perf_counter()
        chk = float(embed_scan(params, xs))
        best = max(best, B * ITERS / (time.perf_counter() - t0))
    print(
        f"scan-dispatch prepatch+fold {best:7.1f} clips/s  "
        f"({B * ITERS / best * 1e3 / ITERS:5.1f} ms/batch equivalent)",
        flush=True,
    )


def sweep_batch():
    """prepatch+fold at B=16/32/64, same-phase."""
    import jax
    import jax.numpy as jnp

    from alpro_tpu.core.compile_cache import enable_compile_cache

    enable_compile_cache()

    from alpro_tpu.models import TimeSformer, TimeSformerConfig

    base = TimeSformerConfig(
        img_size=S, patch_size=16, num_frames=T, embed_dim=768, depth=12,
        num_heads=12, drop_path_rate=0.0, scan_blocks=True,
        fold_uint8_norm="on",
    )
    model = TimeSformer(base, dtype=jnp.bfloat16)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, T, S, S, 3), jnp.bfloat16)
    )
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    rng = np.random.RandomState(0)
    p = 16
    hp = S // p
    for b in (16, 32, 64):
        pre = [
            rng.randint(0, 255, size=(b, T, S, S, 3), dtype=np.uint8)
            .reshape(b, T, hp, p, hp, p, 3)
            .transpose(0, 1, 2, 4, 3, 5, 6)
            .reshape(b, T, hp * hp, p * p * 3)
            for _ in range(2)
        ]
        feeds = [jax.device_put(v) for v in pre]
        iters = max(4, (16 * 16) // b)
        cps, compile_s, chk = measure_embed_variant(
            model, params, feeds, iters=iters, batch=b
        )
        print(
            f"B={b:<3d} prepatch+fold {cps:7.1f} clips/s  "
            f"({b / cps * 1e3:5.1f} ms/batch, compile {compile_s:.0f}s, "
            f"checksum {chk:.1f})",
            flush=True,
        )


if __name__ == "__main__":
    if "--sweep-batch" in sys.argv:
        sweep_batch()
    elif "--scan-dispatch" in sys.argv:
        scan_dispatch()
    else:
        main()
