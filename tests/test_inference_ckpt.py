"""--inference_model_step must load the run's own saved checkpoint."""

import os

import numpy as np

from alpro_tpu.core.config import Config
from fixtures import write_video_dataset
from test_cli_e2e import _base_cfg, _write_model_configs


def test_inference_from_trained_checkpoint(tmp_path):
    root = str(tmp_path)
    bm, vm, vocab = _write_model_configs(root)
    ann, vid_dir, rows = write_video_dataset(root, n_videos=6, t=4, h=48, w=48)
    cfg = _base_cfg(root, bm, vm, vocab)
    cfg.train_datasets = [{"name": "syn", "txt": ann, "img": vid_dir}]
    cfg.val_datasets = cfg.train_datasets
    cfg.e2e_weights_path = None
    cfg.inference_txt_db = None
    cfg.inference_img_db = None

    from alpro_tpu.cli.run_video_retrieval import start_inference, start_training

    state = start_training(cfg)
    step = int(np.asarray(state.step))
    assert os.path.isdir(os.path.join(root, "out", "ckpt", f"model_step_{step}"))

    cfg2 = Config(dict(cfg))
    cfg2.debug = False
    cfg2.inference_model_step = str(step)
    metrics = start_inference(cfg2)
    assert "text2video" in metrics

    # a bogus step must fail loudly, not silently fall back to init
    cfg3 = Config(dict(cfg))
    cfg3.inference_model_step = "999999"
    import pytest

    with pytest.raises(Exception):
        start_inference(cfg3)
