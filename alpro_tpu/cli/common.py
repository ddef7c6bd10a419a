"""Shared CLI machinery: model setup, mesh, training-loop scaffolding.

The equivalent of the reference's per-task `setup_model` / `setup_dataloaders`
/ train-loop skeleton (`/root/reference/src/tasks/run_video_retrieval.py:
194-241,302-512`), factored once.
"""

from __future__ import annotations

import math
import os
import time
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from alpro_tpu.checkpoint.orbax_io import TrainingRestorer, save_params
from alpro_tpu.checkpoint.torch_convert import load_reference_checkpoint
from alpro_tpu.core.config import Config, load_json_config
from alpro_tpu.core.logging import LOGGER, TB_LOGGER, RunningMeter, add_log_to_file
from alpro_tpu.core.mesh import make_mesh, replicate, shard_batch
from alpro_tpu.models import (
    AlproModel,
    BertConfig,
    TimeSformerConfig,
    build_prompter_model,
    build_pretrain_model,
    build_qa_model,
    build_retrieval_model,
)
from alpro_tpu.train import TrainState, build_optimizer, get_lr_schedule
from alpro_tpu.train.step import shard_step


def setup_environment(cfg: Config):
    from alpro_tpu.core.distributed import maybe_initialize
    from alpro_tpu.core.misc import save_training_meta, set_random_seed

    # multi-host: the reference's hvd.init() slot (`run_video_retrieval.py:
    # 818`). Env-gated (ALPRO_COORDINATOR / ALPRO_DISTRIBUTED) and must run
    # before anything touches devices — after this, jax.devices() is global.
    if maybe_initialize():
        LOGGER.info(
            "distributed runtime: process %d/%d, %d local of %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )

    # rbg PRNG: threefry bit generation for the per-step dropout/droppath
    # masks is a measurable chunk of the training elementwise time on TPU
    # (profiled; rbg: 35.6 → 38.1 clips/s, docs/PERF.md). Dropout draws
    # change — bit-exact RNG parity is not a reference behaviour anyone
    # depends on. Opt out with {"prng_impl": "threefry2x32"}.
    prng_impl = cfg.get("prng_impl", "rbg")
    if prng_impl not in ("rbg", "threefry2x32", "unsafe_rbg"):
        raise ValueError(
            f"prng_impl must be one of rbg/threefry2x32/unsafe_rbg, got "
            f"{prng_impl!r}"
        )
    try:
        jax.config.update("jax_default_prng_impl", prng_impl)
    except Exception as e:  # already-initialized backends on some versions
        import logging

        logging.getLogger("alpro").warning(
            "could not set prng_impl=%s (%r); continuing with the default",
            prng_impl, e,
        )
    set_random_seed(cfg.get("seed", 42))
    try:
        nonzero_host = jax.process_index() != 0
    except RuntimeError:
        nonzero_host = False  # backend not up yet; treat as primary host
    if nonzero_host:
        # non-zero hosts log warnings only (reference: NoOp logger on
        # ranks != 0, `run_video_retrieval.py:309-310`)
        import logging

        LOGGER.setLevel(logging.WARNING)
    if cfg.get("output_dir") and not nonzero_host:
        # primary host only: the reference installs NoOp TB/saver on
        # ranks != 0 (`run_video_retrieval.py:309-315`); on a shared
        # filesystem concurrent writers would collide
        os.makedirs(cfg.output_dir, exist_ok=True)
        add_log_to_file(os.path.join(cfg.output_dir, "log", "log.txt"))
        TB_LOGGER.create(os.path.join(cfg.output_dir, "log"))
        if not cfg.get("do_inference"):
            # training runs only: inference points output_dir at the train
            # run whose stored log/args.json drives the cfg re-merge
            # (`run_video_retrieval.py:766-770` keeps it read-only) —
            # re-snapshotting here would clobber the merge source with the
            # inference invocation's sparse flags
            save_training_meta(cfg.output_dir, cfg)


def compute_dtype(cfg: Config):
    if cfg.get("fp16"):
        # the reference's apex fp16 flag: TPU equivalent is bf16 (same
        # exponent range as fp32 — no loss scaling needed, SURVEY.md §2.9)
        LOGGER.info("fp16=1 requested: using bfloat16 compute on TPU")
        return jnp.bfloat16
    name = cfg.get("compute_dtype", "bfloat16")
    return jnp.bfloat16 if name == "bfloat16" else jnp.float32


def build_model_from_cfg(cfg: Config, task: str) -> AlproModel:
    bert_dict = dict(load_json_config(cfg.model_config))
    bert_dict.setdefault("attn_impl", cfg.get("attn_impl", "auto"))
    bert = BertConfig.from_json_dict(bert_dict)
    vis_dict = dict(load_json_config(cfg.visual_model_cfg))
    vis = TimeSformerConfig(
        img_size=cfg.crop_img_size,
        patch_size=vis_dict.get("patch_size", 16),
        num_frames=cfg.num_frm,
        embed_dim=vis_dict.get("embed_dim", 768),
        depth=vis_dict.get("depth", 12),
        num_heads=vis_dict.get("num_heads", 12),
        drop_rate=vis_dict.get("drop_rate", 0.0),
        attn_drop_rate=vis_dict.get("attn_drop_rate", 0.0),
        drop_path_rate=vis_dict.get("drop_path_rate", 0.1),
        attn_impl=cfg.get("attn_impl", "auto"),
        gradient_checkpointing=bool(vis_dict.get("gradient_checkpointing", False)),
        pixel_mean=tuple(cfg.get("img_pixel_mean") or (0.48145466, 0.4578275, 0.40821073)),
        pixel_std=tuple(cfg.get("img_pixel_std") or (0.26862954, 0.26130258, 0.27577711)),
        fused_patchify=cfg.get("fused_patchify", "auto"),
    )
    scan = bool(cfg.get("scan_blocks", True))
    import dataclasses

    bert = dataclasses.replace(bert, scan_blocks=scan)
    vis = dataclasses.replace(vis, scan_blocks=scan)
    if scan and not cfg.get("do_inference", False) and not vis.gradient_checkpointing:
        # scanned blocks stack per-block residuals (no cross-block remat), so
        # the flagship training backward exceeds HBM without per-block
        # checkpointing (measured 18.7G vs 15.75G, docs/PERF.md). The
        # reference enables grad ckpt for its larger configs the same way
        # (`config_release/*_gc.json`); here it is the scanned-train default.
        bert = dataclasses.replace(bert, gradient_checkpointing=True)
        vis = dataclasses.replace(vis, gradient_checkpointing=True)
    # selective remat: what the per-block checkpoint keeps (models/remat.py;
    # 'dots_ln' keeps non-batched matmul outputs plus the per-row LN
    # statistics — measured fastest on TPU in both scanned and unrolled
    # graphs, docs/PERF.md; 'nothing' = reference-equivalent full recompute)
    remat_policy = cfg.get("remat_policy", "dots_ln")
    bert = dataclasses.replace(bert, remat_policy=remat_policy)
    vis = dataclasses.replace(vis, remat_policy=remat_policy)
    mesh_shape = cfg.get("mesh_shape")
    if mesh_shape is not None and len(mesh_shape) == 2 and int(mesh_shape[1]) > 1:
        # 2D dp×sp mesh (`--mesh_shape DP SP`): long-video sequence
        # parallelism — the temporal attention's frame axis is sharded over
        # sp (models/timesformer.py sp_axis; setup_training activates the
        # mesh context around the train step)
        vis = dataclasses.replace(vis, sp_axis="sp")
    dtype = compute_dtype(cfg)
    if task == "retrieval":
        return build_retrieval_model(bert, vis, dtype=dtype)
    if task == "qa":
        return build_qa_model(
            bert, vis, num_labels=cfg.num_labels,
            cls_hidden_scale=cfg.get("cls_hidden_scale", 2), dtype=dtype,
        )
    if task == "pretrain":
        return build_pretrain_model(
            bert, vis, num_entities=cfg.get("num_entities", 1000), dtype=dtype
        )
    if task == "prompter":
        return build_prompter_model(bert, vis, dtype=dtype)
    raise ValueError(task)


def init_params(model: AlproModel, cfg: Config, seed: int = 0):
    """Init in the model's param layout. Scanned models initialize through
    their unrolled twin (preserving the reference's per-block init, e.g. the
    non-zero block-0 temporal_fc) and stack the tree."""
    from alpro_tpu.models.scan_utils import to_model_layout, unrolled_twin

    T = cfg.num_frm
    S = cfg.crop_img_size
    pixels = jnp.zeros((1, T, S, S, 3), jnp.float32)
    ids = jnp.zeros((1, cfg.max_txt_len), jnp.int32)
    mask = jnp.ones((1, cfg.max_txt_len), jnp.int32)
    params = unrolled_twin(model).init(
        {"params": jax.random.PRNGKey(seed)}, pixels, ids, mask
    )
    return to_model_layout(params, model)


def maybe_load_e2e_weights(params, cfg: Config, remove_text_encoder_prefix=False,
                           model: Optional[AlproModel] = None):
    """Merge a converted reference checkpoint over the init tree (missing keys
    keep their init values, like the reference's strict=False load).
    Converted checkpoints speak the unrolled layout; when `model` is scanned,
    the merge happens in unrolled space and the result is re-stacked."""
    path = cfg.get("e2e_weights_path")
    if not path:
        return params
    if not os.path.exists(path):
        LOGGER.warning("e2e_weights_path %s not found; training from init", path)
        return params
    num_patches = (cfg.crop_img_size // 16) ** 2
    loaded, _prompter_sd = load_reference_checkpoint(
        path, num_patches=num_patches, num_frames=cfg.num_frm,
        remove_text_encoder_prefix=remove_text_encoder_prefix,
        # ALBEF init: plain-ViT visual tower, temporal params keep their init
        # (`run_pretrain_contrastive_only.py:155-161` strict=not albef_init)
        albef=bool(cfg.get("albef_init", False)),
    )
    if model is not None:
        from alpro_tpu.models.scan_utils import to_model_layout, to_unrolled_layout

        return to_model_layout(
            merge_params(to_unrolled_layout(params, model), loaded), model
        )
    return merge_params(params, loaded)


def maybe_load_visual_weights(params, cfg: Config,
                              model: Optional[AlproModel] = None):
    """Visual-tower-only init when no e2e checkpoint is given — the
    reference's `load_separate_ckpt(visual_weights_path=...)` family
    (`run_pretrain_sparse.py:164-169`, `run_video_retrieval.py:229-233`,
    `alpro_models.py:45-48` → `vit.py:515-533` dispatch →
    `helpers.py:191-352`).

    Dispatch (reference: by checkpoint name, here also by key shape so it
    works on any local file):
      * 'CLIP_ViT' in path, or plain-ViT keys (no temporal_attn)
        → convert_imagenet_vit / convert_clip_vit: spatial attn duplicated
          into temporal attn, norm1 → temporal_norm1, temporal_fc zeroed for
          blocks > 0 (block 0 keeps its init — `vit.py:289-298`)
      * native TimeSformer keys (temporal_attn present)
        → convert_kinetics_timesformer: direct map + pos/time-embed resize
    """
    path = cfg.get("visual_weights_path")
    if not path:
        return params
    if not os.path.exists(path):
        # the reference resolves the magic name 'vit_base_patch16_224' by
        # downloading from the timm model zoo (`helpers.py:102-113`); in
        # offline/sandboxed runs only local files are supported
        LOGGER.warning(
            "visual_weights_path %s not found; visual tower keeps init", path
        )
        return params
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    for wrap in ("model", "state_dict", "module"):
        if isinstance(raw, dict) and wrap in raw and isinstance(raw[wrap], dict):
            raw = raw[wrap]
    sd = {
        k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
        for k, v in raw.items()
    }
    # strip a leading 'model.'/'module.' (the reference TimeSformer wrapper
    # nests the VisionTransformer under .model)
    for pfx in ("model.", "module."):
        if any(k.startswith(pfx + "patch_embed") for k in sd):
            sd = {k[len(pfx):] if k.startswith(pfx) else k: v for k, v in sd.items()}

    from alpro_tpu.checkpoint.torch_convert import (
        convert_imagenet_vit,
        convert_kinetics_timesformer,
    )

    num_patches = (cfg.crop_img_size // 16) ** 2
    native = any("temporal_attn" in k for k in sd)
    if native and "CLIP_ViT" not in os.path.basename(path):
        visual = convert_kinetics_timesformer(
            sd, prefix="", num_patches=num_patches, num_frames=cfg.num_frm
        )
        family = "kinetics-timesformer"
    else:
        visual = convert_imagenet_vit(sd, prefix="", num_patches=num_patches)
        family = "clip-vit" if "CLIP_ViT" in os.path.basename(path) else "imagenet-vit"
    LOGGER.info("visual init from %s (%s family)", path, family)
    loaded = {"params": {"visual_encoder": visual}}
    if model is not None:
        from alpro_tpu.models.scan_utils import to_model_layout, to_unrolled_layout

        return to_model_layout(
            merge_params(to_unrolled_layout(params, model), loaded), model
        )
    return merge_params(params, loaded)


def load_inference_params(model: AlproModel, cfg: Config,
                          remove_text_encoder_prefix: bool = False):
    """Inference-time parameter resolution, mirroring the reference
    (`run_video_retrieval.py:773-780`): `--inference_model_step N` loads the
    run's own `ckpt/model_step_N` (orbax); otherwise `--inference_model_ckpt`
    (direct path, golden gates) or `e2e_weights_path` (converted torch
    checkpoint); otherwise fresh init."""
    from alpro_tpu.models.scan_utils import to_model_layout, to_unrolled_layout

    params = init_params(model, cfg)
    step = str(cfg.get("inference_model_step", "") or "")
    if step and cfg.get("output_dir"):
        from alpro_tpu.checkpoint.orbax_io import load_params

        path = os.path.join(cfg.output_dir, "ckpt", f"model_step_{step}")
        # deploy checkpoints are stored in the unrolled layout
        target = to_unrolled_layout(jax.device_get(params), model)
        restored = load_params(path, target=target)
        LOGGER.info("loaded inference params from %s", path)
        return to_model_layout(restored, model)
    ckpt = cfg.get("inference_model_ckpt")
    if ckpt:
        if not os.path.exists(ckpt):
            raise FileNotFoundError(f"inference_model_ckpt not found: {ckpt}")
        cfg = Config(dict(cfg))
        cfg["e2e_weights_path"] = ckpt
    return maybe_load_e2e_weights(
        params, cfg, remove_text_encoder_prefix=remove_text_encoder_prefix,
        model=model,
    )


def merge_params(init_tree, loaded_tree):
    """Recursively overlay loaded leaves whose shapes match; report the rest."""
    skipped = []

    def merge(dst, src, path=""):
        if isinstance(dst, dict) and isinstance(src, dict):
            out = dict(dst)
            for k in src:
                if k in out:
                    out[k] = merge(out[k], src[k], f"{path}/{k}")
                else:
                    skipped.append(f"{path}/{k} (not in model)")
            return out
        if hasattr(dst, "shape") and hasattr(src, "shape"):
            if tuple(np.shape(dst)) == tuple(np.shape(src)):
                return jnp.asarray(np.asarray(src), dtype=dst.dtype)
            skipped.append(f"{path} (shape {np.shape(src)} vs {np.shape(dst)})")
            return dst
        return jnp.asarray(np.asarray(src)) if src is not None else dst

    merged = merge(init_tree, loaded_tree)
    if skipped:
        LOGGER.info("checkpoint merge skipped %d keys: %s", len(skipped), skipped[:20])
    return merged


def setup_training(cfg: Config, model: AlproModel, make_step: Callable,
                   steps_per_epoch: int, extra_repl_args: int = 0):
    """Returns (mesh, sharded_step, state, num_train_steps, restorer).

    `extra_repl_args` — number of additional replicated positional args the
    step takes after (state, batch, rng) (e.g. teacher params + prompt bank
    for pretraining)."""
    accum = int(cfg.get("gradient_accumulation_steps", 1))
    # the loop iterates micro-steps; the LR schedule and optimizer step on
    # accumulation boundaries
    num_train_steps = int(math.ceil(cfg.num_train_epochs * steps_per_epoch))
    num_opt_steps = int(math.ceil(num_train_steps / accum))
    if cfg.get("transformer_lr_mul", 1.0) != 1.0:
        # parsed for flag compatibility; the reference parses it too but no
        # code consumes it (`config.py:151`, grep: zero uses) — a single
        # param group gets `learning_rate` directly
        LOGGER.warning("transformer_lr_mul is accepted but has no effect "
                       "(unused in the reference as well)")
    sched = get_lr_schedule(
        cfg.get("decay", "linear"), cfg.learning_rate, num_opt_steps,
        warmup_ratio=cfg.get("warmup_ratio", 0.1),
        decay_epochs=cfg.get("step_decay_epochs") or (),
        steps_per_epoch=max(1, int(steps_per_epoch // accum)),
    )
    tx = build_optimizer(
        sched,
        betas=tuple(cfg.get("betas", (0.9, 0.98))),
        weight_decay=cfg.get("weight_decay", 0.0),
        apply_weight_decay=bool(cfg.get("apply_weight_decay", False)),
        grad_norm=cfg.get("grad_norm", None),
        accum_steps=accum,
        mu_dtype=cfg.get("adam_mu_dtype") or None,
        nu_dtype=cfg.get("adam_nu_dtype") or None,
    )

    params = init_params(model, cfg, seed=cfg.get("seed", 42))
    if cfg.get("e2e_weights_path"):
        params = maybe_load_e2e_weights(
            params, cfg,
            remove_text_encoder_prefix=bool(cfg.get("remove_text_encoder_prefix", False)),
            model=model,
        )
    else:
        # reference precedence: e2e checkpoint wins; otherwise the visual
        # tower may init from imagenet/CLIP/Kinetics weights
        # (`run_pretrain_sparse.py:155-169`)
        params = maybe_load_visual_weights(params, cfg, model=model)

    n_dev = len(jax.devices())
    n_proc = jax.process_count()
    shape = cfg.get("mesh_shape")
    if shape is None:
        # batch must divide over dp: use the largest divisor of the global
        # batch that fits the device count. Multi-process, dp must also be a
        # multiple of the process count so every host keeps mesh devices
        # (core.mesh.select_devices).
        bs = int(cfg.train_batch_size)
        n = n_dev
        while n > n_proc and (bs % n != 0 or n % n_proc != 0):
            n -= 1
        if bs % n != 0:
            raise ValueError(
                f"train_batch_size {bs} has no dp layout over {n_dev} devices"
                f" / {n_proc} processes"
            )
        if n != n_dev:
            LOGGER.warning(
                "train_batch_size %d not divisible by %d devices; using dp=%d",
                bs, n_dev, n,
            )
        shape = [n]
    from alpro_tpu.core.mesh import axis_names_for_shape, select_devices

    mesh = make_mesh(
        devices=select_devices(int(np.prod(shape))), shape=shape,
        axis_names=axis_names_for_shape(shape),
    )
    state = replicate(mesh, TrainState.create(params, tx))
    from alpro_tpu.core.misc import parse_compiler_options

    copts = parse_compiler_options(cfg.get("xla_compiler_options"))
    if extra_repl_args:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("dp"))
        step = jax.jit(
            make_step(model, tx),
            in_shardings=(repl, data, repl) + (repl,) * extra_repl_args,
            donate_argnums=(0,),
            compiler_options=copts,
        )
    else:
        step = shard_step(make_step(model, tx), mesh, compiler_options=copts)

    if "sp" in mesh.axis_names:
        # bare-PartitionSpec sharding constraints inside the model (sp_axis)
        # resolve against the ambient mesh at trace time — activate it
        # around every step call (first call traces/compiles)
        inner_step = step

        def step(*args):  # noqa: F811
            with jax.set_mesh(mesh):
                return inner_step(*args)

    save_steps = max(
        1, int(cfg.get("save_steps_ratio", 0.05) * num_train_steps)
    )
    restorer = TrainingRestorer(cfg.output_dir, save_steps) if cfg.get("output_dir") else None
    if restorer is not None:
        restored = restorer.restore(jax.device_get(state))
        if jax.process_count() > 1:
            # every host must resume from the same step — the reference
            # broadcasts params from rank 0 after restore
            # (`run_video_retrieval.py:326-327`); here the checkpoint lives
            # on a shared FS, so a mismatch means the FS is NOT shared and
            # the run must stop before silently diverging
            from alpro_tpu.parallel.host_sync import all_gather_list

            local_step = -1 if restored is None else int(np.asarray(restored.step))
            steps = all_gather_list(local_step)
            if len(set(steps)) != 1:
                raise RuntimeError(
                    f"inconsistent restore across hosts (steps={steps}); "
                    "output_dir must be a shared filesystem"
                )
        if restored is not None:
            state = replicate(mesh, restored)
            LOGGER.info("resumed from step %d", int(np.asarray(restored.step)))
    return mesh, step, state, num_train_steps, restorer


def run_train_loop(
    cfg: Config,
    mesh,
    step_fn: Callable,
    state: TrainState,
    train_iter,
    num_train_steps: int,
    restorer: Optional[TrainingRestorer] = None,
    validate_fn: Optional[Callable] = None,
    save_model_fn: Optional[Callable] = None,
    step_extra_args: Tuple = (),
):
    """Training loop. `train_iter` yields either batch dicts or
    (batch, extras) tuples; extras are passed to the step after rng
    (replicated args that vary per batch, e.g. the pretrain prompt bank).
    Batches are sharded onto the mesh by a background prefetch thread
    (`DevicePrefetcher`) so H2D transfer of batch k+1 overlaps step k — the
    reference's PrefetchLoader/CUDA-stream role (`dataloader.py:86-160`).
    Disable with --prefetch_depth 0."""
    from alpro_tpu.data.loader import DevicePrefetcher

    def _stage(item):
        batch, extras = item if isinstance(item, tuple) else (item, ())
        return shard_batch(mesh, _drop_non_arrays(batch)), extras

    prefetch_depth = int(cfg.get("prefetch_depth", 2))
    prefetcher = None
    if prefetch_depth > 0:
        prefetcher = DevicePrefetcher(train_iter, _stage, depth=prefetch_depth)
        staged_iter = prefetcher
    else:
        staged_iter = map(_stage, train_iter)

    rng = jax.random.PRNGKey(cfg.get("seed", 42))
    start_step = int(np.asarray(jax.device_get(state.step)))
    meters: Dict[str, RunningMeter] = {}
    log_interval = cfg.get("log_interval", 100)
    # reference formula (`run_video_retrieval.py:350-352`): validate ~num_valid
    # times, rounded up to a multiple of min_valid_steps
    min_valid = max(int(cfg.get("min_valid_steps", 1)), 1)
    valid_steps = (
        math.ceil(num_train_steps / max(cfg.get("num_valid", 10), 1) / min_valid)
        * min_valid
    )
    valid_steps = max(valid_steps, 1)
    debug = bool(cfg.get("debug", False))

    # --profile 1: trace steps [start+2, start+7) to TensorBoard format
    profiling = False
    t0 = time.time()
    try:
        for global_step in range(start_step, num_train_steps):
            if cfg.get("profile") and cfg.get("output_dir"):
                if global_step == start_step + 2 and not profiling:
                    trace_dir = os.path.join(cfg.output_dir, "profile")
                    os.makedirs(trace_dir, exist_ok=True)
                    jax.profiler.start_trace(trace_dir)
                    profiling = True
                elif global_step == start_step + 7 and profiling:
                    jax.profiler.stop_trace()
                    profiling = False
                    LOGGER.info("wrote profiler trace to %s/profile", cfg.output_dir)
            dbatch, extras = next(staged_iter)
            state, metrics = step_fn(state, dbatch, rng, *(extras or step_extra_args))
            # metrics stay on device; materializing them every step would force a
            # host sync per step (the reference's per-step loss.item() hazard,
            # SURVEY.md §3 hot-loop notes). Sample them at the log cadence.
            if (global_step + 1) % log_interval == 0 or debug:
                for k, v in metrics.items():
                    meters.setdefault(k, RunningMeter(k))(float(v))
            if (global_step + 1) % log_interval == 0:
                rate = (global_step + 1 - start_step) / (time.time() - t0)
                LOGGER.info(
                    "step %d/%d (%.2f it/s): %s",
                    global_step + 1, num_train_steps, rate,
                    "  ".join(str(m) for m in meters.values()),
                )
                TB_LOGGER.log_scalar_dict(
                    {m.name: m.val for m in meters.values()}, prefix="train"
                )
            if (global_step + 1) % valid_steps == 0 or debug:
                if validate_fn is not None:
                    validate_fn(state, global_step + 1)
                if save_model_fn is not None:
                    save_model_fn(state, global_step + 1)
            if restorer is not None and restorer.due(global_step + 1):
                # the device_get (full params + optimizer state) happens only on
                # save boundaries; doing it per-step would block async dispatch.
                # Multi-host: EVERY process calls save — orbax checkpointing is
                # collective (primary host writes, the rest join its barrier;
                # a rank-0-only call would deadlock the primary's barrier).
                restorer.save(jax.device_get(state))
            if debug and global_step - start_step >= 3:
                LOGGER.info("debug mode: stopping after %d steps", global_step + 1)
                break
        if profiling:
            jax.profiler.stop_trace()
        if restorer is not None:
            restorer.wait_until_finished()  # commit any in-flight async save
    finally:
        if prefetcher is not None:
            # unblock + drain the staging thread: abandoned prefetchers
            # pin `depth` device batches in HBM for the process lifetime
            prefetcher.close()
    return state


def _drop_non_arrays(batch: Dict) -> Dict:
    return {
        k: v
        for k, v in batch.items()
        if isinstance(v, (np.ndarray, jnp.ndarray))
        and v.dtype != object
    }


def default_save_model_fn(cfg: Config, model: AlproModel):
    """Deploy checkpoints are always written in the unrolled layout, so
    converters/exporters and non-scanned consumers read them unchanged."""
    from alpro_tpu.models.scan_utils import to_unrolled_layout

    def save(state, step):
        # multi-host: all processes call — orbax saves are collective
        # (primary host writes; see run_train_loop's restorer note)
        if cfg.get("output_dir"):
            save_params(
                cfg.output_dir, step,
                to_unrolled_layout(jax.device_get(state.params), model),
            )

    return save
