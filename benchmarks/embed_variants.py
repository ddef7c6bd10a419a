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
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T, S, B = 8, 224, 16
ITERS = 16


def measure_embed_variant(model, params, feeds, iters=ITERS, trials=2):
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
        best = max(best, B * iters / (time.perf_counter() - t0))
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


if __name__ == "__main__":
    main()
