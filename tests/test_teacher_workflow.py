"""Full reference workflow chain: train the Prompter teacher, export it to a
reference-format torch checkpoint, then run ALPRO pretraining loading that
checkpoint as the frozen teacher (the `teacher_weights_path` path,
`run_pretrain_sparse.py:164-169`)."""

import os

import numpy as np
import pytest

from alpro_tpu.core.config import Config
from fixtures import write_video_dataset
from test_cli_e2e import _base_cfg, _write_model_configs

torch = pytest.importorskip("torch")


def test_prompter_export_then_pretrain_teacher(tmp_path):
    root = str(tmp_path)
    bm, vm, vocab = _write_model_configs(root)
    ann, vid_dir, rows = write_video_dataset(root, n_videos=8, t=4, h=48, w=48)

    # 1) train the Prompter briefly
    cfg = _base_cfg(root, bm, vm, vocab)
    cfg.train_datasets = [{"name": "syn", "ann": ann, "img": vid_dir}]
    cfg.val_datasets = cfg.train_datasets
    cfg.use_itc = 1
    cfg.use_itm = 0
    cfg.use_mlm = 0
    cfg.e2e_weights_path = None
    cfg.output_dir = os.path.join(root, "prompter_out")

    from alpro_tpu.cli.run_prompter import start_training

    state = start_training(cfg)

    # 2) export to a reference-format .pt
    import jax

    from alpro_tpu.checkpoint.export_torch import save_torch_checkpoint

    ckpt_path = os.path.join(root, "prompter_pretrained.pt")
    save_torch_checkpoint(ckpt_path, jax.device_get(state.params))
    sd = torch.load(ckpt_path, weights_only=False)
    assert "visual_encoder.model.cls_token" in sd
    assert "text_proj.weight" in sd

    # 3) pretrain with the exported teacher
    ents = os.path.join(root, "unigrams.txt")
    with open(ents, "w") as f:
        for w in ["dog", "cat", "ball"]:
            f.write(w + "\n")
    cfg2 = _base_cfg(root, bm, vm, vocab)
    cfg2.train_datasets = [{"name": "syn", "ann": ann, "img": vid_dir, "type": "video"}]
    cfg2.val_datasets = cfg2.train_datasets
    cfg2.use_itc = 1
    cfg2.use_itm = 1
    cfg2.use_mlm = 1
    cfg2.use_mpm = 1
    cfg2.num_entities = 3
    cfg2.entity_file_path = ents
    cfg2.teacher_weights_path = ckpt_path
    cfg2.e2e_weights_path = None
    cfg2.prompt_chunk_size = 8
    cfg2.max_txt_len = 10
    cfg2.num_train_epochs = 1
    cfg2.output_dir = os.path.join(root, "pretrain_out")

    from alpro_tpu.cli.run_pretrain import start_training as pretrain

    state2 = pretrain(cfg2)
    assert int(np.asarray(state2.step)) >= 2

    # 4) the pretrain checkpoint must finetune into retrieval (e2e load path)
    import glob

    from alpro_tpu.checkpoint.orbax_io import load_params

    ckpts = sorted(glob.glob(os.path.join(root, "pretrain_out", "ckpt", "model_step_*")))
    assert ckpts
