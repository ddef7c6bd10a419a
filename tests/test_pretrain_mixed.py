"""Pretraining with mixed video+image datasets and multi-clip QA eval."""

import json
import os

import numpy as np

from alpro_tpu.core.config import Config
from fixtures import write_image_dataset, write_qa_dataset, write_video_dataset
from test_cli_e2e import _base_cfg, _write_model_configs


def test_pretrain_video_plus_image_mix(tmp_path):
    root = str(tmp_path)
    bm, vm, vocab = _write_model_configs(root)
    v_ann, v_dir, _ = write_video_dataset(root, n_videos=6, t=4, h=48, w=48)
    i_ann, i_dir, _ = write_image_dataset(root, n=6, h=64, w=64)
    ents = os.path.join(root, "unigrams.txt")
    with open(ents, "w") as f:
        for w in ["dog", "cat", "ball"]:
            f.write(w + "\n")

    cfg = _base_cfg(root, bm, vm, vocab)
    cfg.train_datasets = [
        {"name": "syn_video", "ann": v_ann, "img": v_dir, "type": "video"},
        {"name": "syn_image", "ann": i_ann, "img": i_dir, "type": "image"},
    ]
    cfg.val_datasets = []  # per-step validation covered by the CLI drive
    cfg.use_itc = 1
    cfg.use_itm = 1
    cfg.use_mlm = 1
    cfg.use_mpm = 1
    cfg.num_entities = 3
    cfg.entity_file_path = ents
    cfg.teacher_weights_path = None
    cfg.e2e_weights_path = None
    cfg.prompt_chunk_size = 8
    cfg.max_txt_len = 10
    cfg.num_train_epochs = 1

    from alpro_tpu.cli.run_pretrain import start_training

    state = start_training(cfg)
    assert int(np.asarray(state.step)) >= 2


def test_pretrain_image_dataset_repeats_frames(tmp_path):
    from alpro_tpu.data.datasets import PretrainImageDataset, load_jsonl

    root = str(tmp_path)
    ann, img_dir, rows = write_image_dataset(root, n=3)
    ds = PretrainImageDataset(
        load_jsonl(ann), img_dir, num_frm=4, resize_size=48, crop_size=32,
    )
    ex = ds[0]
    assert ex["clip"].shape == (4, 32, 32, 3)
    assert ex["type"] == "image"
    # all frames identical (static image repeated; crop is shared)
    for t in range(1, 4):
        np.testing.assert_array_equal(ex["clip"][0], ex["clip"][t])


def test_qa_multiclip_inference(tmp_path):
    root = str(tmp_path)
    bm, vm, vocab = _write_model_configs(root)
    ann, vid_dir, rows, ans2label = write_qa_dataset(root, n=6, t=8, h=48, w=48)
    a2l = os.path.join(root, "a2l.json")
    with open(a2l, "w") as f:
        json.dump(ans2label, f)
    cfg = _base_cfg(root, bm, vm, vocab)
    cfg.train_datasets = [{"name": "q", "txt": ann, "img": vid_dir}]
    cfg.val_datasets = cfg.train_datasets
    cfg.ans2label_path = a2l
    cfg.num_labels = len(ans2label)
    cfg.task = "msvd_qa"
    cfg.cls_hidden_scale = 2
    cfg.score_agg_func = "lse"
    cfg.inference_n_clips = 2   # 2 clips × num_frm frames
    cfg.num_frm = 2
    cfg.e2e_weights_path = None

    import jax

    from alpro_tpu.cli import common
    from alpro_tpu.cli.run_video_qa import _mk_datasets, inference_qa
    from alpro_tpu.data.tokenization import build_tokenizer

    tokenizer = build_tokenizer(cfg.tokenizer_dir)
    model = common.build_model_from_cfg(cfg, "qa")
    params = common.init_params(model, cfg)
    ds = _mk_datasets(cfg, tokenizer, "val")
    results = inference_qa(model, params, ds, tokenizer, cfg)
    assert len(results) == 6
    metrics = ds.evaluate_qa(results)
    assert "overall_acc" in metrics
