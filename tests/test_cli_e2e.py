"""End-to-end CLI tests: train + infer the three task runners on synthetic
data with tiny model configs (the reference's --debug smoke-test idiom,
`src/configs/config.py:45-48`, elevated into CI)."""

import json
import os

import numpy as np
import pytest

from alpro_tpu.core.config import Config
from fixtures import write_qa_dataset, write_video_dataset
from alpro_tpu.data.tokenization import make_test_vocab


def _write_model_configs(root):
    base = {
        "attention_probs_dropout_prob": 0.0,
        "hidden_dropout_prob": 0.0,
        "hidden_size": 32,
        "intermediate_size": 64,
        "num_attention_heads": 4,
        "num_hidden_layers": 4,
        "vocab_size": 200,
        "max_position_embeddings": 64,
        "fusion_layer": 2,
        "pad_token_id": 0,
    }
    vis = {
        "patch_size": 16,
        "embed_dim": 32,
        "depth": 2,
        "num_heads": 4,
        "drop_rate": 0,
        "attn_drop_rate": 0,
        "drop_path_rate": 0.0,
    }
    bm = os.path.join(root, "base_model.json")
    vm = os.path.join(root, "vis_model.json")
    with open(bm, "w") as f:
        json.dump(base, f)
    with open(vm, "w") as f:
        json.dump(vis, f)
    vocab = make_test_vocab()
    vocab_path = os.path.join(root, "vocab.txt")
    with open(vocab_path, "w") as f:
        for tok in vocab:
            f.write(tok + "\n")
    return bm, vm, vocab_path


def _base_cfg(root, bm, vm, vocab):
    return Config(
        model_config=bm,
        visual_model_cfg=vm,
        tokenizer_dir=vocab,  # file path → WordPieceTokenizer
        output_dir=os.path.join(root, "out"),
        max_txt_len=12,
        crop_img_size=32,
        resize_size=48,
        num_frm=2,
        train_batch_size=4,
        val_batch_size=4,
        inference_batch_size=4,
        gradient_accumulation_steps=1,
        num_train_epochs=2,
        num_valid=1,
        learning_rate=1e-4,
        decay="linear",
        betas=[0.9, 0.98],
        weight_decay=0.0,
        grad_norm=5.0,
        seed=42,
        debug=True,
        log_interval=2,
        compute_dtype="float32",
        save_steps_ratio=1.0,
        frm_sampling_strategy="rand",
        mesh_shape=None,
    )


def test_retrieval_train_and_inference(tmp_path):
    root = str(tmp_path)
    bm, vm, vocab = _write_model_configs(root)
    ann, vid_dir, rows = write_video_dataset(root, n_videos=8, t=4, h=48, w=48)
    cfg = _base_cfg(root, bm, vm, vocab)
    cfg.train_datasets = [{"name": "syn", "txt": ann, "img": vid_dir}]
    cfg.val_datasets = [{"name": "syn", "txt": ann, "img": vid_dir}]
    cfg.e2e_weights_path = None
    cfg.inference_txt_db = None
    cfg.inference_img_db = None

    from alpro_tpu.cli.run_video_retrieval import start_inference, start_training

    state = start_training(cfg)
    assert int(np.asarray(state.step)) >= 2
    # model checkpoint written
    ckpts = os.listdir(os.path.join(root, "out", "ckpt"))
    assert any(c.startswith("model_step_") for c in ckpts)

    cfg2 = Config(dict(cfg))
    cfg2.debug = False
    metrics = start_inference(cfg2)
    assert "text2video" in metrics
    assert 0 <= metrics["text2video"]["r1"] <= 100


def test_qa_train_and_inference(tmp_path):
    root = str(tmp_path)
    bm, vm, vocab = _write_model_configs(root)
    ann, vid_dir, rows, ans2label = write_qa_dataset(root, n=8, t=2, h=48, w=48)
    a2l_path = os.path.join(root, "ans2label.json")
    with open(a2l_path, "w") as f:
        json.dump(ans2label, f)

    cfg = _base_cfg(root, bm, vm, vocab)
    cfg.train_datasets = [{"name": "syn_qa", "txt": ann, "img": vid_dir}]
    cfg.val_datasets = [{"name": "syn_qa", "txt": ann, "img": vid_dir}]
    cfg.ans2label_path = a2l_path
    cfg.num_labels = len(ans2label)
    cfg.task = "msvd_qa"
    cfg.cls_hidden_scale = 2
    cfg.score_agg_func = "mean"
    cfg.inference_n_clips = 1
    cfg.train_n_clips = 1
    cfg.e2e_weights_path = None

    from alpro_tpu.cli.run_video_qa import start_inference, start_training

    state = start_training(cfg)
    assert int(np.asarray(state.step)) >= 2
    cfg2 = Config(dict(cfg))
    metrics = start_inference(cfg2)
    assert "overall_acc" in metrics and "what_acc" in metrics


def test_multichoice_qa_train_and_inference(tmp_path):
    """TGIF action/transition protocol: Q+option rows, per-option scalar
    logits regrouped to (B, n_options), accuracy = argmax-over-options vs the
    integer answer index (`dataset_video_qa.py:156-200`; working protocol —
    the reference's own collator built the rows but its model never consumed
    them)."""
    from fixtures import write_multichoice_qa_dataset

    root = str(tmp_path)
    bm, vm, vocab = _write_model_configs(root)
    ann, vid_dir, rows = write_multichoice_qa_dataset(
        root, n=6, t=2, h=48, w=48, n_options=3
    )

    cfg = _base_cfg(root, bm, vm, vocab)
    cfg.train_datasets = [{"name": "syn_mc", "txt": ann, "img": vid_dir}]
    cfg.val_datasets = [{"name": "syn_mc", "txt": ann, "img": vid_dir}]
    cfg.task = "action"
    cfg.n_options = 3
    cfg.num_labels = 1500  # CLI must force this to 1 for multi-choice
    cfg.cls_hidden_scale = 2
    cfg.score_agg_func = "mean"
    cfg.inference_n_clips = 1
    cfg.train_n_clips = 1
    cfg.e2e_weights_path = None
    cfg.train_batch_size = 3
    cfg.val_batch_size = 3
    cfg.inference_batch_size = 3

    from alpro_tpu.cli.run_video_qa import start_inference, start_training

    state = start_training(cfg)
    assert int(np.asarray(state.step)) >= 2
    assert cfg.num_labels == 1

    cfg2 = Config(dict(cfg))
    metrics = start_inference(cfg2)
    assert 0.0 <= metrics["overall_acc"] <= 1.0
    # results carry option indices in [0, n_options)
    with open(os.path.join(root, "out", "qa_results.json")) as f:
        results = json.load(f)["results"]
    assert len(results) == len(rows)
    assert all(0 <= r["answer"] < 3 for r in results)
    # accuracy recomputed per reference semantics (int compare)
    gt = {r["question_id"]: r["answer"] for r in rows}
    acc = np.mean([gt[r["question_id"]] == r["answer"] for r in results])
    np.testing.assert_allclose(metrics["overall_acc"], acc, atol=1e-6)


def test_pretrain_all_objectives(tmp_path):
    root = str(tmp_path)
    bm, vm, vocab = _write_model_configs(root)
    ann, vid_dir, rows = write_video_dataset(root, n_videos=8, t=4, h=48, w=48)
    ents = os.path.join(root, "unigrams.txt")
    with open(ents, "w") as f:
        for w in ["dog", "cat", "ball", "man", "woman"]:
            f.write(w + "\n")

    cfg = _base_cfg(root, bm, vm, vocab)
    cfg.train_datasets = [
        {"name": "syn_video", "ann": ann, "img": vid_dir, "type": "video"},
    ]
    cfg.val_datasets = []  # per-step validation covered by the CLI drive
    cfg.use_itc = 1
    cfg.use_itm = 1
    cfg.use_mlm = 1
    cfg.use_mpm = 1
    cfg.num_entities = 5
    cfg.entity_file_path = ents
    cfg.teacher_weights_path = None
    cfg.e2e_weights_path = None
    cfg.prompt_chunk_size = 16
    cfg.max_txt_len = 10

    from alpro_tpu.cli.run_pretrain import start_training

    state = start_training(cfg)
    assert int(np.asarray(state.step)) >= 2


def test_prompter_training(tmp_path):
    root = str(tmp_path)
    bm, vm, vocab = _write_model_configs(root)
    ann, vid_dir, rows = write_video_dataset(root, n_videos=8, t=4, h=48, w=48)
    cfg = _base_cfg(root, bm, vm, vocab)
    cfg.train_datasets = [{"name": "syn", "ann": ann, "img": vid_dir}]
    cfg.val_datasets = cfg.train_datasets
    cfg.use_itc = 1
    cfg.use_itm = 0
    cfg.use_mlm = 0
    cfg.e2e_weights_path = None

    from alpro_tpu.cli.run_prompter import start_training

    state = start_training(cfg)
    assert int(np.asarray(state.step)) >= 2


def test_resume_from_restorer(tmp_path):
    root = str(tmp_path)
    bm, vm, vocab = _write_model_configs(root)
    ann, vid_dir, rows = write_video_dataset(root, n_videos=8, t=4, h=48, w=48)
    cfg = _base_cfg(root, bm, vm, vocab)
    cfg.train_datasets = [{"name": "syn", "txt": ann, "img": vid_dir}]
    cfg.val_datasets = cfg.train_datasets
    cfg.e2e_weights_path = None
    cfg.save_steps_ratio = 0.5  # save restore state early

    from alpro_tpu.cli.run_video_retrieval import start_training

    state1 = start_training(cfg)
    step1 = int(np.asarray(state1.step))
    # second run must resume (not restart from 0): ends at the same step
    state2 = start_training(cfg)
    step2 = int(np.asarray(state2.step))
    assert step2 >= step1
