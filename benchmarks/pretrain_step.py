"""Pretraining-step throughput: the full 4-loss ALPRO step (VTC + hard-neg
VTM + MLM + MPM with a frozen Prompter teacher), flagship encoders, T=4
(the reference's pretrain config, `config_release/pretrain_alpro.json:57`;
hot loop `src/pretrain/run_pretrain_sparse.py:532-666`).

Usage: python benchmarks/pretrain_step.py [--batch 8] [--iters 6]
Importable as `measure_pretrain_step(...)`.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure_pretrain_step(batch=8, iters=6, num_frm=4, img_size=224,
                          use_mpm=True, remat_policy="nothing",
                          scan_blocks=True, mu_dtype=None, nu_dtype=None) -> dict:
    import jax
    import jax.numpy as jnp

    try:  # rbg PRNG: cheaper dropout mask generation (docs/PERF.md)
        jax.config.update("jax_default_prng_impl", "rbg")
    except Exception:
        pass
    from alpro_tpu.core.compile_cache import enable_compile_cache

    enable_compile_cache()

    from alpro_tpu.models import (
        BertConfig,
        TimeSformerConfig,
        build_pretrain_model,
        build_prompter_model,
    )
    from alpro_tpu.train import TrainState, build_optimizer, get_lr_schedule
    from alpro_tpu.train.step import make_pretrain_train_step

    vis = TimeSformerConfig(
        img_size=img_size, patch_size=16, num_frames=num_frm,
        drop_path_rate=0.1, scan_blocks=scan_blocks,
        gradient_checkpointing=True, remat_policy=remat_policy,
    )
    bert = BertConfig(scan_blocks=scan_blocks, gradient_checkpointing=True,
                      remat_policy=remat_policy)
    model = build_pretrain_model(
        bert, vis, img_size=img_size, num_frm=num_frm, dtype=jnp.bfloat16
    )
    teacher = None
    teacher_params = None
    bank = None
    if use_mpm:
        teacher = build_prompter_model(
            bert, vis, img_size=img_size, num_frm=num_frm, dtype=jnp.bfloat16
        )

    rng = np.random.RandomState(0)
    B, L = batch, 30
    n_patches = (img_size // 16) ** 2
    batch_data = {
        "visual_inputs": jax.device_put(
            rng.randint(0, 255, (B, num_frm, img_size, img_size, 3), np.uint8)
        ),
        "crop_visual_inputs": jax.device_put(
            rng.randint(0, 255, (B, num_frm, img_size, img_size, 3), np.uint8)
        ),
        "mpm_mask": jnp.asarray(
            (rng.rand(B, n_patches) > 0.6).astype(np.float32)
        ),
        "text_input_ids": jnp.asarray(
            rng.randint(0, 30522, (B, L)).astype(np.int32)
        ),
        "mlm_text_input_ids": jnp.asarray(
            rng.randint(0, 30522, (B, L)).astype(np.int32)
        ),
        "mlm_labels": jnp.asarray(
            np.where(rng.rand(B, L) < 0.15, rng.randint(0, 30522, (B, L)), -100
                     ).astype(np.int32)
        ),
        "text_input_mask": jnp.ones((B, L), jnp.int32),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, num_frm, img_size, img_size, 3), jnp.bfloat16),
        batch_data["text_input_ids"][:1], batch_data["text_input_mask"][:1],
    )
    if use_mpm:
        teacher_params = teacher.init(
            {"params": jax.random.PRNGKey(1)},
            jnp.zeros((1, num_frm, img_size, img_size, 3), jnp.bfloat16),
            batch_data["text_input_ids"][:1],
            batch_data["text_input_mask"][:1],
        )
        b = rng.randn(1000, 256).astype(np.float32)
        bank = jnp.asarray(b / np.linalg.norm(b, axis=-1, keepdims=True))

    tx = build_optimizer(get_lr_schedule("linear", 1e-4, 1000), grad_norm=5.0,
                         mu_dtype=mu_dtype, nu_dtype=nu_dtype)
    step = jax.jit(
        make_pretrain_train_step(model, tx, use_mpm=use_mpm, teacher=teacher),
        donate_argnums=(0,),
    )
    state = TrainState.create(params, tx)
    key = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    state, m = step(state, batch_data, key, teacher_params, bank)
    loss = float(m["loss"])
    compile_s = time.perf_counter() - t0

    # best-of-2 trials (tunnel-stall guard; runtime-only, cache-safe)
    dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        last = None
        for _ in range(iters):
            state, m = step(state, batch_data, key, teacher_params, bank)
            last = m["loss"]
        _ = float(last)
        dt = min(dt, (time.perf_counter() - t0) / iters)
    return {
        "clips_per_sec": B / dt,
        "ms_per_step": dt * 1000,
        "compile_s": compile_s,
        "loss": loss,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--num_frm", type=int, default=4)
    ap.add_argument("--use_mpm", type=int, default=1)
    ap.add_argument("--remat_policy", type=str, default="dots_ln",
                    choices=["nothing", "dots", "dots_all", "dots_names",
                             "names", "dots_rng", "dots_ln"])
    ap.add_argument("--scan", type=int, default=1,
                    help="scan_blocks (0 = unrolled block stack)")
    ap.add_argument("--mu_dtype", type=str, default=None,
                    help="AdamW first-moment dtype (e.g. bfloat16)")
    ap.add_argument("--nu_dtype", type=str, default=None,
                    help="AdamW second-moment dtype (e.g. bfloat16)")
    args = ap.parse_args()
    r = measure_pretrain_step(
        batch=args.batch, iters=args.iters, num_frm=args.num_frm,
        use_mpm=bool(args.use_mpm), remat_policy=args.remat_policy,
        scan_blocks=bool(args.scan), mu_dtype=args.mu_dtype,
        nu_dtype=args.nu_dtype,
    )
    print(json.dumps({
        "metric": f"pretrain clips/s (VTC+VTM+MLM{'+MPM' if args.use_mpm else ''}, B={args.batch}, T={args.num_frm}, bf16)",
        "value": round(r["clips_per_sec"], 2),
        "unit": "clips/s",
        "ms_per_step": round(r["ms_per_step"], 1),
        "compile_s": round(r["compile_s"], 1),
        "loss": round(r["loss"], 4),
    }))


if __name__ == "__main__":
    main()
