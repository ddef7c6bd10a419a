"""Prompter (teacher) pretraining — VTC only.

CLI-compatible with `/root/reference/src/pretrain/run_pretrain_contrastive_only.py`:

    python -m alpro_tpu.cli.run_prompter --config configs/pretrain_prompter.json \
        --output_dir out/
"""

from __future__ import annotations

from alpro_tpu.cli import common
from alpro_tpu.core.config import Config, get_pretraining_args
from alpro_tpu.core.logging import LOGGER
from alpro_tpu.data.datasets import PretrainCollator, PretrainVideoDataset, load_datalist
from alpro_tpu.data.loader import BatchLoader, InfiniteIterator
from alpro_tpu.data.tokenization import build_tokenizer
from alpro_tpu.train.step import make_prompter_train_step


def start_training(cfg: Config):
    # reference asserts VTC-only (`run_pretrain_contrastive_only.py:225,238`)
    assert bool(cfg.get("use_itc", True)), "prompter training requires use_itc"
    assert not bool(cfg.get("use_itm", 0)) and not bool(cfg.get("use_mlm", 0)), (
        "prompter training is contrastive-only"
    )
    common.setup_environment(cfg)
    tokenizer = build_tokenizer(cfg.tokenizer_dir)
    model = common.build_model_from_cfg(cfg, "prompter")

    spec = cfg.train_datasets[0]
    rows = load_datalist(spec.get("ann") or spec["txt"])
    if cfg.get("data_ratio", 1.0) < 1.0:
        rows = rows[: max(1, int(len(rows) * cfg.data_ratio))]
    ds = PretrainVideoDataset(
        rows, spec["img"], num_frm=cfg.num_frm,
        frm_sampling_strategy=cfg.get("frm_sampling_strategy", "headtail"),
        resize_size=cfg.resize_size, crop_size=cfg.crop_img_size,
        seed=cfg.get("seed", 42),
    )
    collator = PretrainCollator(
        tokenizer, cfg.get("max_txt_len", 30), mlm=False, mpm=False,
    )
    from alpro_tpu.core.distributed import data_shards, local_batch_size

    num_shards, shard_id = data_shards()
    loader = BatchLoader(ds, collator, local_batch_size(cfg.train_batch_size),
                         seed=cfg.get("seed", 42),
                         num_shards=num_shards, shard_id=shard_id,
                         num_workers=int(cfg.get("n_workers", 4)))

    mesh, step_fn, state, num_steps, restorer = common.setup_training(
        cfg, model, make_prompter_train_step, steps_per_epoch=len(loader),
    )
    LOGGER.info("training prompter (VTC only) for %d steps", num_steps)
    state = common.run_train_loop(
        cfg, mesh, step_fn, state, InfiniteIterator(loader), num_steps,
        restorer=restorer,
        save_model_fn=common.default_save_model_fn(cfg, model),
    )
    return state


def main():
    cfg = get_pretraining_args()
    start_training(cfg)


if __name__ == "__main__":
    main()
