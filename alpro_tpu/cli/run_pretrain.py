"""ALPRO pretraining: VTC + VTM + MLM + PEM over WebVid-style video and
CC3M-style image datasets with MetaLoader task mixing.

CLI-compatible with `/root/reference/src/pretrain/run_pretrain_sparse.py`:

    python -m alpro_tpu.cli.run_pretrain --config configs/pretrain_alpro.json \
        --output_dir out/
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from alpro_tpu.cli import common
from alpro_tpu.cli.prompts import (
    IMAGE_TEMPLATES,
    VIDEO_TEMPLATES,
    build_prompt_strings,
    load_entities,
)
from alpro_tpu.core.config import Config, get_pretraining_args
from alpro_tpu.core.logging import LOGGER
from alpro_tpu.data.datasets import (
    PretrainCollator,
    PretrainImageDataset,
    PretrainVideoDataset,
    load_datalist,
)
from alpro_tpu.data.loader import BatchLoader, MetaLoader
from alpro_tpu.data.tokenization import build_tokenizer
from alpro_tpu.objectives.pem import build_prompt_bank
from alpro_tpu.train.step import make_pretrain_train_step


def setup_prompt_banks(cfg: Config, teacher, teacher_params, tokenizer):
    """One-time prompt-bank build (`run_pretrain_sparse.py:527-530` →
    `alpro_models.py:430-507`), jitted as a chunked lax.map."""
    entities = load_entities(cfg.entity_file_path, cfg.get("num_entities", 1000))

    def encode(ids, mask):
        text_embeds = teacher.apply(
            teacher_params, ids, mask, method=teacher.embed_text
        )
        return teacher.apply(teacher_params, text_embeds, method=teacher.text_feat)

    banks = {}
    for name, templates in (("video", VIDEO_TEMPLATES), ("image", IMAGE_TEMPLATES)):
        prompts = build_prompt_strings(entities, templates)
        enc = tokenizer(prompts, max_length=cfg.get("max_txt_len", 30))
        banks[name] = jax.jit(
            lambda i, m: build_prompt_bank(
                encode, i, m, len(entities),
                chunk_size=int(cfg.get("prompt_chunk_size", 512)),
            )
        )(jnp.asarray(enc["input_ids"]), jnp.asarray(enc["attention_mask"]))
        LOGGER.info("built %s prompt bank: %s", name, banks[name].shape)
    return banks


def build_pretrain_loaders(cfg: Config, tokenizer, use_mpm: bool):
    collator = PretrainCollator(
        tokenizer, cfg.get("max_txt_len", 30),
        mlm=bool(cfg.get("use_mlm", True)), mpm=use_mpm,
        patch_size=16, seed=cfg.get("seed", 42),
    )
    loaders = {}
    for spec in cfg.train_datasets:
        rows = load_datalist(spec.get("ann") or spec["txt"])
        if cfg.get("data_ratio", 1.0) < 1.0:
            rows = rows[: max(1, int(len(rows) * cfg.data_ratio))]
        if spec.get("type", "video") == "image":
            ds = PretrainImageDataset(
                rows, spec["img"], num_frm=cfg.num_frm,
                resize_size=cfg.resize_size, crop_size=cfg.crop_img_size,
                seed=cfg.get("seed", 42),
            )
        else:
            ds = PretrainVideoDataset(
                rows, spec["img"], num_frm=cfg.num_frm,
                frm_sampling_strategy=cfg.get("frm_sampling_strategy", "headtail"),
                resize_size=cfg.resize_size, crop_size=cfg.crop_img_size,
                seed=cfg.get("seed", 42),
            )
        from alpro_tpu.core.distributed import data_shards, local_batch_size

        num_shards, shard_id = data_shards()
        loaders[spec["name"]] = BatchLoader(
            ds, collator, local_batch_size(cfg.train_batch_size),
            seed=cfg.get("seed", 42),
            num_shards=num_shards, shard_id=shard_id,
            num_workers=int(cfg.get("n_workers", 4)),
        )
    return loaders


def start_training(cfg: Config):
    common.setup_environment(cfg)
    tokenizer = build_tokenizer(cfg.tokenizer_dir)
    model = common.build_model_from_cfg(cfg, "pretrain")
    use_mpm = bool(cfg.get("use_mpm", True))

    # frozen Prompter teacher + one-time prompt banks
    teacher = None
    teacher_params = None
    banks = {"video": None, "image": None}
    if use_mpm:
        teacher = common.build_model_from_cfg(cfg, "prompter")
        teacher_params = common.init_params(teacher, cfg)
        tw = cfg.get("teacher_weights_path")
        if tw and os.path.exists(tw):
            from alpro_tpu.checkpoint.torch_convert import load_reference_checkpoint

            loaded, _ = load_reference_checkpoint(
                tw, num_patches=(cfg.crop_img_size // 16) ** 2,
                num_frames=cfg.num_frm,
            )
            from alpro_tpu.models.scan_utils import (
                to_model_layout,
                to_unrolled_layout,
            )

            teacher_params = to_model_layout(
                common.merge_params(
                    to_unrolled_layout(teacher_params, teacher), loaded
                ),
                teacher,
            )
        else:
            LOGGER.warning("teacher_weights_path missing; teacher runs from init")
        banks = setup_prompt_banks(cfg, teacher, teacher_params, tokenizer)

    loaders = build_pretrain_loaders(cfg, tokenizer, use_mpm)
    meta = MetaLoader(
        loaders, accum_steps=cfg.get("gradient_accumulation_steps", 1),
        seed=cfg.get("seed", 42),
    )
    steps_per_epoch = sum(len(l) for l in loaders.values())

    def make_step(m, tx):
        return make_pretrain_train_step(
            m, tx,
            use_itc=bool(cfg.get("use_itc", True)),
            use_itm=bool(cfg.get("use_itm", True)),
            use_mlm=bool(cfg.get("use_mlm", True)),
            use_mpm=use_mpm,
            num_local_blocks=cfg.get("vtm_negative_blocks", 1),
            teacher=teacher,
        )

    mesh, step_fn, state, num_steps, restorer = common.setup_training(
        cfg, model, make_step, steps_per_epoch=steps_per_epoch,
        extra_repl_args=2 if use_mpm else 0,
    )
    LOGGER.info("pretraining for %d steps over %s", num_steps, list(loaders))

    # the prompt bank is replicated (not dp-sharded), so it rides alongside
    # the batch as per-item step extras — safe under the background prefetch
    # thread (a shared mutable cell would race ahead of consumption)
    class _MixIter:
        def __iter__(self):
            return self

        def __next__(self):
            _task, batch = next(meta)
            batch = dict(batch)
            bank = banks.get(batch.pop("type", "video"))
            if use_mpm:
                return batch, (teacher_params, bank)
            return batch

    # validation over the val datasets (reference `run_pretrain_sparse.py:
    # 240-330`): per-task losses + ITC/MLM accuracies on a few batches
    from alpro_tpu.train.step import make_pretrain_eval_fn

    eval_fn = jax.jit(make_pretrain_eval_fn(
        model,
        use_itc=bool(cfg.get("use_itc", True)),
        use_itm=bool(cfg.get("use_itm", True)),
        use_mlm=bool(cfg.get("use_mlm", True)),
        use_mpm=use_mpm,
        teacher=teacher,
        num_local_blocks=cfg.get("vtm_negative_blocks", 1),
    ))
    val_specs = cfg.get("val_datasets") or []
    val_cfg = dict(cfg)
    val_cfg["train_datasets"] = val_specs
    val_loaders = (
        build_pretrain_loaders(Config(val_cfg), tokenizer, use_mpm)
        if val_specs else {}
    )

    def validate(state, gs):
        if not val_loaders:
            return
        import numpy as np

        params = state.params
        agg = {}
        n = 0
        for name, loader in val_loaders.items():
            for bi, batch in enumerate(loader):
                if bi >= int(cfg.get("num_val_batches", 2)):
                    break
                batch = dict(batch)
                bank = banks.get(batch.pop("type", "video"))
                arrays = {
                    k: v for k, v in batch.items()
                    if hasattr(v, "dtype") and getattr(v, "dtype", None) != object
                }
                m = eval_fn(params, arrays, jax.random.PRNGKey(0),
                            teacher_params, bank)
                for k, v in m.items():
                    agg[k] = agg.get(k, 0.0) + float(v)
                n += 1
        if n:
            LOGGER.info(
                "step %s val: %s", gs,
                {k: round(v / n, 4) for k, v in sorted(agg.items())},
            )

    state = common.run_train_loop(
        cfg, mesh, step_fn, state, iter(_MixIter()), num_steps,
        restorer=restorer,
        validate_fn=validate,
        save_model_fn=common.default_save_model_fn(cfg, model),
    )
    return state


def main():
    cfg = get_pretraining_args()
    start_training(cfg)


if __name__ == "__main__":
    main()
