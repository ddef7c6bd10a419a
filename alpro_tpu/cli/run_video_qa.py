"""Open-ended video QA: finetuning + inference.

CLI-compatible with `/root/reference/src/tasks/run_video_qa.py`:

    python -m alpro_tpu.cli.run_video_qa --config configs/msvd_qa.json \
        --output_dir out/ [--do_inference 1]
"""

from __future__ import annotations

import json
import os
from typing import List

import jax
import numpy as np

from alpro_tpu.cli import common
from alpro_tpu.core.config import Config, get_video_qa_args
from alpro_tpu.core.logging import LOGGER, TB_LOGGER
from alpro_tpu.data.datasets import QACollator, VideoQADataset, load_datalist, load_json
from alpro_tpu.data.loader import BatchLoader, InfiniteIterator
from alpro_tpu.evals.qa import pool_clip_logits
from alpro_tpu.train.step import make_qa_inference_fn, make_qa_train_step


def _mk_datasets(cfg: Config, tokenizer, split="train"):
    if split == "train":
        spec = cfg.train_datasets[0]
    elif cfg.get("do_inference") and cfg.get("inference_txt_db"):
        # inference over explicit dbs (reference `run_video_qa.py:570-585`:
        # inference builds its loader from inference_txt_db/inference_img_db).
        # Gated on do_inference: during TRAINING the val split must stay
        # cfg.val_datasets even when inference dbs are configured for later.
        spec = {
            "txt": cfg.inference_txt_db,
            "img": cfg.get("inference_img_db")
            or (cfg.val_datasets[0]["img"] if cfg.get("val_datasets") else None),
        }
    else:
        spec = cfg.val_datasets[0]
    txt = spec["txt"]
    if isinstance(txt, dict):
        txt = list(txt.values())[0]
    rows = load_datalist(txt)
    if split == "train" and cfg.get("data_ratio", 1.0) < 1.0:
        rows = rows[: max(1, int(len(rows) * cfg.data_ratio))]
    task = cfg.get("task", "msrvtt_qa")
    # multi-choice tasks carry their answers as option indices — no vocab
    ans2label = {} if _is_multi_choice(cfg) else load_json(cfg.ans2label_path)
    n_clips = cfg.get("train_n_clips", 1) if split == "train" else cfg.get("inference_n_clips", 1)
    ds = VideoQADataset(
        rows, spec["img"], ans2label,
        num_frm=cfg.num_frm * n_clips,
        frm_sampling_strategy=cfg.get("frm_sampling_strategy", "rand")
        if split == "train" else "uniform",
        resize_size=cfg.resize_size, crop_size=cfg.crop_img_size,
        is_train=(split == "train"), seed=cfg.get("seed", 42),
        # inference/val loaders skip labels like the reference's
        # mk_video_qa_dataloader at inference (`run_video_qa.py:570-585`) —
        # eval accuracy comes from evaluate_qa's string comparison, so
        # out-of-vocab val answers never crash label lookup
        return_label=(split == "train"), task_type=task,
        fps=cfg.get("fps", -1),
    )
    return ds


def _is_multi_choice(cfg: Config) -> bool:
    from alpro_tpu.data.datasets import MULTI_CHOICE_QA

    return cfg.get("task", "msrvtt_qa") in MULTI_CHOICE_QA


def _qa_collator(cfg: Config, tokenizer) -> QACollator:
    return QACollator(
        tokenizer, cfg.max_txt_len,
        task_type=cfg.get("task", "msrvtt_qa"),
        n_options=int(cfg.get("n_options", 5)),
    )


def _effective_n_options(cfg: Config) -> int:
    """1 for open-ended; n_options for action/transition. Multi-choice uses a
    single-logit classifier regrouped to (B, n_options) — force num_labels=1
    (the TGIF-QA protocol; see `train/step.py::_qa_logits`)."""
    if not _is_multi_choice(cfg):
        return 1
    if int(cfg.get("num_labels", 1)) != 1:
        LOGGER.info("multi-choice task %s: forcing num_labels=1 "
                    "(per-option scalar logits)", cfg.get("task"))
        cfg["num_labels"] = 1
    return int(cfg.get("n_options", 5))


# keyed by id(model) with the model pinned in the value: the pin keeps the
# id from being recycled after GC, and the identity check guards regardless
_INFER_CACHE = {}


def inference_qa(model, params, ds, tokenizer, cfg: Config) -> List[dict]:
    """Multi-clip eval: per-clip logits pooled with mean/max/lse
    (`run_video_qa.py:251-279`)."""
    n_options = _effective_n_options(cfg)
    key = (id(model), n_options)
    cached = _INFER_CACHE.get(key)
    if cached is None or cached[0] is not model:
        _INFER_CACHE[key] = (
            model, jax.jit(make_qa_inference_fn(model, n_options=n_options))
        )
    infer = _INFER_CACHE[key][1]
    col = _qa_collator(cfg, tokenizer)
    try:
        proc, nproc = jax.process_index(), jax.process_count()
    except RuntimeError:
        proc, nproc = 0, 1
    loader = BatchLoader(
        ds, col, cfg.get("inference_batch_size", cfg.val_batch_size),
        shuffle=False, drop_last=False, num_shards=nproc, shard_id=proc,
        num_workers=int(cfg.get("n_workers", 4)),
    )
    num_clips = int(cfg.get("inference_n_clips", 1))
    num_frm = cfg.num_frm
    results = []
    for batch in loader:
        vis = batch["visual_inputs"]
        B = vis.shape[0]
        vis = vis.reshape(B, num_clips, num_frm, *vis.shape[2:])
        clip_logits = []
        for c in range(num_clips):
            out = infer(params, {
                "visual_inputs": vis[:, c],
                "text_input_ids": batch["text_input_ids"],
                "text_input_mask": batch["text_input_mask"],
            })
            clip_logits.append(np.asarray(out))
        logits = pool_clip_logits(
            np.stack(clip_logits), cfg.get("score_agg_func", "mean")
        )
        preds = logits.argmax(-1)
        for qid, p in zip(batch["question_ids"], preds):
            results.append({"question_id": qid, "answer": int(p)})
        if cfg.get("debug") and len(results) >= 2 * B:
            break
    if nproc > 1:
        from alpro_tpu.parallel.host_sync import all_gather_list

        results = [r for shard in all_gather_list(results) for r in shard]
    return results


def validate(model, state, ds, tokenizer, cfg, step):
    params = jax.device_get(state.params)
    results = inference_qa(model, params, ds, tokenizer, cfg)
    metrics = ds.evaluate_qa(results)
    LOGGER.info("step %s qa: %s", step, json.dumps(metrics))
    TB_LOGGER.log_scalar_dict(
        {k: v for k, v in metrics.items() if isinstance(v, float)}, prefix="val"
    )
    return metrics


def start_training(cfg: Config):
    common.setup_environment(cfg)
    from alpro_tpu.data.tokenization import build_tokenizer

    tokenizer = build_tokenizer(cfg.tokenizer_dir)
    n_options = _effective_n_options(cfg)  # may force num_labels=1 (mc)
    model = common.build_model_from_cfg(cfg, "qa")
    train_ds = _mk_datasets(cfg, tokenizer, "train")
    val_ds = _mk_datasets(cfg, tokenizer, "val")
    col = _qa_collator(cfg, tokenizer)
    from alpro_tpu.core.distributed import data_shards, local_batch_size

    num_shards, shard_id = data_shards()
    train_loader = BatchLoader(
        train_ds, col, local_batch_size(cfg.train_batch_size),
        seed=cfg.get("seed", 42),
        num_shards=num_shards, shard_id=shard_id,
        num_workers=int(cfg.get("n_workers", 4)),
    )

    # QA finetunes from the pretrain ckpt with the text_encoder.bert prefix
    # stripped (`run_video_qa.py:189-195`)
    cfg["remove_text_encoder_prefix"] = True
    # train-time multi-clip: per-clip forwards, last-clip backward
    # (`run_video_qa.py:461-489`; see make_qa_train_step)
    train_n_clips = int(cfg.get("train_n_clips", 1))
    mesh, step_fn, state, num_steps, restorer = common.setup_training(
        cfg, model,
        lambda m, tx: make_qa_train_step(
            m, tx, n_options=n_options, n_clips=train_n_clips,
            num_frm=int(cfg.num_frm),
        ),
        steps_per_epoch=len(train_loader),
    )
    LOGGER.info("training qa for %d steps", num_steps)
    state = common.run_train_loop(
        cfg, mesh, step_fn, state, InfiniteIterator(train_loader), num_steps,
        restorer=restorer,
        validate_fn=lambda s, gs: validate(model, s, val_ds, tokenizer, cfg, gs),
        save_model_fn=common.default_save_model_fn(cfg, model),
    )
    validate(model, state, val_ds, tokenizer, cfg, "final")
    return state


def start_inference(cfg: Config):
    common.setup_environment(cfg)
    stored = os.path.join(cfg.output_dir or "", "log", "args.json")
    if os.path.exists(stored):
        with open(stored) as f:
            train_args = json.load(f)
        for k, v in train_args.items():
            if "inference" not in k and k != "output_dir":
                cfg[k] = Config._wrap(v)
    from alpro_tpu.data.tokenization import build_tokenizer

    tokenizer = build_tokenizer(cfg.tokenizer_dir)
    _effective_n_options(cfg)  # may force num_labels=1 before the model builds
    model = common.build_model_from_cfg(cfg, "qa")
    params = common.load_inference_params(model, cfg)
    ds = _mk_datasets(cfg, tokenizer, "val")
    results = inference_qa(model, params, ds, tokenizer, cfg)
    metrics = ds.evaluate_qa(results)
    LOGGER.info("inference qa: %s", json.dumps(metrics))
    from alpro_tpu.core.distributed import is_primary

    if cfg.get("output_dir") and is_primary():
        with open(os.path.join(cfg.output_dir, "qa_results.json"), "w") as f:
            json.dump({"metrics": metrics, "results": results}, f)
    return metrics


def main():
    cfg = get_video_qa_args()
    if cfg.get("do_inference"):
        start_inference(cfg)
    else:
        start_training(cfg)


if __name__ == "__main__":
    main()
