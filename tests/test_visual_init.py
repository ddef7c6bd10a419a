"""Visual-encoder init family wired into the CLIs (`--visual_weights_path`,
`--albef_init`).

Reference: when no e2e checkpoint is given, the pretrain/finetune runners
init the visual tower from imagenet-timm / CLIP / Kinetics weights
(`run_pretrain_sparse.py:155-169` → `alpro_models.py:45-48` →
`vit.py:515-533` → `helpers.py:191-352`); the Prompter additionally accepts
ALBEF checkpoints loaded non-strict (`run_pretrain_contrastive_only.py:
155-161`). These tests drive the real CLI setup path (`setup_training`) on
synthetic state dicts and assert the init rules survive to the scanned
param layout.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from fixtures import write_video_dataset
from alpro_tpu.core.config import Config
from alpro_tpu.data.tokenization import make_test_vocab
from alpro_tpu.models import TimeSformerConfig
from test_timesformer import random_vit_state_dict

DIM, DEPTH = 24, 2
IMG, T = 32, 2


def _timm_style_sd(rng, cfg: TimeSformerConfig):
    """Plain spatial ViT keys only (timm/imagenet or CLIP-in-ViT format)."""
    full = random_vit_state_dict(cfg, rng)
    return {
        k: v for k, v in full.items()
        if "temporal" not in k and k != "time_embed"
    }


def _write_cfg_files(root):
    base = {
        "hidden_size": DIM, "intermediate_size": 2 * DIM,
        "num_attention_heads": 4, "num_hidden_layers": 4, "vocab_size": 200,
        "max_position_embeddings": 64, "fusion_layer": 2, "pad_token_id": 0,
        "attention_probs_dropout_prob": 0.0, "hidden_dropout_prob": 0.0,
    }
    vis = {"patch_size": 16, "embed_dim": DIM, "depth": DEPTH, "num_heads": 4,
           "drop_rate": 0, "attn_drop_rate": 0, "drop_path_rate": 0.0}
    bm, vm = os.path.join(root, "bm.json"), os.path.join(root, "vm.json")
    json.dump(base, open(bm, "w"))
    json.dump(vis, open(vm, "w"))
    vocab = os.path.join(root, "vocab.txt")
    with open(vocab, "w") as f:
        for tok in make_test_vocab():
            f.write(tok + "\n")
    return bm, vm, vocab


def _base_cfg(root, bm, vm, vocab, ann, vid_dir):
    return Config({
        "model_config": bm, "visual_model_cfg": vm, "tokenizer_dir": vocab,
        "train_datasets": [{"name": "syn", "txt": ann, "ann": ann, "img": vid_dir}],
        "val_datasets": [],
        "output_dir": os.path.join(root, "out"),
        "num_frm": T, "crop_img_size": IMG, "resize_size": 40,
        "max_txt_len": 10, "train_batch_size": 4, "val_batch_size": 4,
        "num_train_epochs": 1, "learning_rate": 1e-4, "decay": "linear",
        "grad_norm": 5.0, "seed": 0, "compute_dtype": "float32",
        "use_itc": 1, "use_itm": 1, "use_mlm": 0, "use_mpm": 0,
        "debug": True, "save_steps_ratio": 1.0,
    })


def _unrolled_visual(state_or_params, model):
    from alpro_tpu.models.scan_utils import to_unrolled_layout

    params = getattr(state_or_params, "params", state_or_params)
    import jax

    tree = to_unrolled_layout(jax.device_get(params), model)
    return tree["params"]["visual_encoder"]


def test_visual_weights_path_imagenet_rules_reach_scanned_layout(tmp_path):
    """timm-style spatial ViT → spatial attn duplicated into temporal attn,
    norm1 → temporal_norm1, temporal_fc zeroed for blocks > 0 and left at
    (nonzero) init for block 0 (`helpers.py:262-313`, `vit.py:289-298`)."""
    root = str(tmp_path)
    bm, vm, vocab = _write_cfg_files(root)
    ann, vid_dir, _rows = write_video_dataset(root, n_videos=4, t=4, h=48, w=48)
    cfg = _base_cfg(root, bm, vm, vocab, ann, vid_dir)

    vit_cfg = TimeSformerConfig(
        img_size=IMG, patch_size=16, num_frames=T, embed_dim=DIM, depth=DEPTH,
        num_heads=4,
    )
    sd = _timm_style_sd(np.random.RandomState(3), vit_cfg)
    ckpt = os.path.join(root, "vit_base_patch16_224.pt")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, ckpt)
    cfg["visual_weights_path"] = ckpt
    cfg["e2e_weights_path"] = None

    from alpro_tpu.cli import common
    from alpro_tpu.train.step import make_retrieval_train_step

    model = common.build_model_from_cfg(cfg, "retrieval")
    _mesh, _step, state, _n, _r = common.setup_training(
        cfg, model, make_retrieval_train_step, steps_per_epoch=1
    )
    vis = _unrolled_visual(state, model)

    np.testing.assert_allclose(
        vis["patch_embed"]["kernel"],
        sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0).reshape(-1, DIM),
        atol=1e-6,
    )
    for i in range(DEPTH):
        blk = vis[f"blocks_{i}"]
        np.testing.assert_allclose(
            np.asarray(blk["temporal_attn"]["qkv"]["kernel"]),
            np.asarray(blk["attn"]["qkv"]["kernel"]), atol=1e-6,
            err_msg=f"block {i} temporal qkv not duplicated",
        )
        np.testing.assert_allclose(
            np.asarray(blk["temporal_norm1"]["scale"]),
            np.asarray(blk["norm1"]["scale"]), atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(blk["attn"]["qkv"]["kernel"]),
            sd[f"blocks.{i}.attn.qkv.weight"].T, atol=1e-6,
        )
        fc = np.asarray(blk["temporal_fc"]["kernel"])
        if i == 0:
            assert np.abs(fc).max() > 0, "block 0 temporal_fc must keep init"
        else:
            np.testing.assert_array_equal(fc, 0.0)


def test_visual_weights_path_kinetics_native_keys(tmp_path):
    """Native TimeSformer checkpoint (temporal keys present) → direct map
    with time-embed resize (`helpers.py:315-352`)."""
    root = str(tmp_path)
    bm, vm, vocab = _write_cfg_files(root)
    ann, vid_dir, _rows = write_video_dataset(root, n_videos=4, t=4, h=48, w=48)
    cfg = _base_cfg(root, bm, vm, vocab, ann, vid_dir)

    # trained at 4 frames; model runs T=2 → nearest resize must kick in
    vit_cfg = TimeSformerConfig(
        img_size=IMG, patch_size=16, num_frames=4, embed_dim=DIM, depth=DEPTH,
        num_heads=4,
    )
    sd = random_vit_state_dict(vit_cfg, np.random.RandomState(5))
    ckpt = os.path.join(root, "timesformer_k600.pt")
    # kinetics ckpts wrap the tree under 'model' with a 'model.' prefix
    torch.save(
        {"model": {"model." + k: torch.from_numpy(v) for k, v in sd.items()}},
        ckpt,
    )
    cfg["visual_weights_path"] = ckpt
    cfg["e2e_weights_path"] = None

    from alpro_tpu.cli import common
    from alpro_tpu.train.step import make_retrieval_train_step

    model = common.build_model_from_cfg(cfg, "retrieval")
    _mesh, _step, state, _n, _r = common.setup_training(
        cfg, model, make_retrieval_train_step, steps_per_epoch=1
    )
    vis = _unrolled_visual(state, model)
    np.testing.assert_allclose(
        np.asarray(vis["blocks_1"]["temporal_attn"]["qkv"]["kernel"]),
        sd["blocks.1.temporal_attn.qkv.weight"].T, atol=1e-6,
    )
    # time_embed resized 4 → 2 by nearest (idx floor([0,1]*4/2) = [0, 2])
    np.testing.assert_allclose(
        np.asarray(vis["time_embed"])[0],
        sd["time_embed"][0, [0, 2]], atol=1e-6,
    )


def test_albef_init_loads_spatial_keeps_temporal_init(tmp_path):
    """--albef_init: e2e ALBEF checkpoint (plain-ViT visual tower) loads the
    spatial keys; temporal params keep their fresh init — NOT duplicated
    (`run_pretrain_contrastive_only.py:155-161` strict=not albef_init)."""
    root = str(tmp_path)
    bm, vm, vocab = _write_cfg_files(root)
    ann, vid_dir, _rows = write_video_dataset(root, n_videos=4, t=4, h=48, w=48)
    cfg = _base_cfg(root, bm, vm, vocab, ann, vid_dir)

    vit_cfg = TimeSformerConfig(
        img_size=IMG, patch_size=16, num_frames=T, embed_dim=DIM, depth=DEPTH,
        num_heads=4,
    )
    spatial = _timm_style_sd(np.random.RandomState(7), vit_cfg)
    rng = np.random.RandomState(9)
    sd = {"visual_encoder." + k: torch.from_numpy(v) for k, v in spatial.items()}
    # minimal ALBEF-style text/proj keys so the converter finds them
    for name, shape in (
        ("vision_proj.weight", (256, DIM)), ("vision_proj.bias", (256,)),
        ("text_proj.weight", (256, DIM)), ("text_proj.bias", (256,)),
        ("itm_head.weight", (2, DIM)), ("itm_head.bias", (2,)),
    ):
        sd[name] = torch.from_numpy(rng.randn(*shape).astype(np.float32) * 0.05)
    sd["temp"] = torch.tensor(0.07)
    # bert half: layer count/shape-compatible random HF-style keys
    bl = {}
    for emb, shape in (
        ("word_embeddings.weight", (200, DIM)),
        ("position_embeddings.weight", (64, DIM)),
        ("token_type_embeddings.weight", (2, DIM)),
    ):
        bl[f"embeddings.{emb}"] = rng.randn(*shape).astype(np.float32) * 0.02
    bl["embeddings.LayerNorm.weight"] = np.ones(DIM, np.float32)
    bl["embeddings.LayerNorm.bias"] = np.zeros(DIM, np.float32)
    for i in range(4):
        lp = f"encoder.layer.{i}."
        for nm, shape in (
            ("attention.self.query", (DIM, DIM)), ("attention.self.key", (DIM, DIM)),
            ("attention.self.value", (DIM, DIM)), ("attention.output.dense", (DIM, DIM)),
            ("intermediate.dense", (2 * DIM, DIM)), ("output.dense", (DIM, 2 * DIM)),
        ):
            bl[lp + nm + ".weight"] = rng.randn(*shape).astype(np.float32) * 0.05
            bl[lp + nm + ".bias"] = rng.randn(shape[0]).astype(np.float32) * 0.01
        for ln in ("attention.output.LayerNorm", "output.LayerNorm"):
            bl[lp + ln + ".weight"] = np.ones(DIM, np.float32)
            bl[lp + ln + ".bias"] = np.zeros(DIM, np.float32)
    sd.update({
        "text_encoder.bert." + k: torch.from_numpy(v) for k, v in bl.items()
    })
    ckpt = os.path.join(root, "albef.pth")
    torch.save(sd, ckpt)

    cfg["e2e_weights_path"] = ckpt
    cfg["albef_init"] = 1

    from alpro_tpu.cli import common
    from alpro_tpu.train.step import make_retrieval_train_step

    model = common.build_model_from_cfg(cfg, "prompter")
    # fresh init for comparison of the untouched temporal params
    init = common.init_params(model, cfg, seed=cfg.get("seed", 42))
    init_vis = _unrolled_visual(init, model)

    _mesh, _step, state, _n, _r = common.setup_training(
        cfg, model, make_retrieval_train_step, steps_per_epoch=1
    )
    vis = _unrolled_visual(state, model)

    # spatial keys came from the checkpoint
    np.testing.assert_allclose(
        np.asarray(vis["blocks_0"]["attn"]["qkv"]["kernel"]),
        spatial["blocks.0.attn.qkv.weight"].T, atol=1e-6,
    )
    # temporal keys kept their init (not duplicated from spatial)
    for i in range(DEPTH):
        np.testing.assert_allclose(
            np.asarray(vis[f"blocks_{i}"]["temporal_attn"]["qkv"]["kernel"]),
            np.asarray(init_vis[f"blocks_{i}"]["temporal_attn"]["qkv"]["kernel"]),
            atol=1e-6, err_msg=f"block {i} temporal attn should keep init",
        )
        assert not np.allclose(
            np.asarray(vis[f"blocks_{i}"]["temporal_attn"]["qkv"]["kernel"]),
            spatial[f"blocks.{i}.attn.qkv.weight"].T,
        )
