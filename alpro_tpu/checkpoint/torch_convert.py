"""Convert reference (torch) ALPRO checkpoints into alpro_tpu param trees.

Covers the reference's shape-tolerant loader semantics
(`/root/reference/src/utils/load_save.py:73-136`):

  * spatial `pos_embed` nearest-interpolated (1D over flattened patches) when
    the patch count differs (`helpers.py:355-368`);
  * temporal `time_embed` nearest-interpolated when num_frames differs
    (`helpers.py:370-375`);
  * `text_encoder.bert.` prefix stripping when loading a pretrain checkpoint
    into the QA model (`load_save.py:96-101` — the QA text encoder is a bare
    BertModel);
  * unknown / shape-mismatched keys are skipped with a report (strict=False).

Weight-layout notes (torch → flax):
  * torch Linear stores (out, in); flax Dense kernels are (in, out) → transpose.
  * the patch-embed conv (D, C, p, p) becomes a (p·p·C, D) matmul kernel via
    transpose(2, 3, 1, 0): our patch vectors are flattened in (ph, pw, c)
    order (`models/timesformer.py`).
  * the fused qkv (3D, D) keeps torch's [q; k; v] row-chunk order, which
    matches our reshape(B, S, 3, H, hd) split.
"""

from __future__ import annotations

import types
from typing import Dict, Optional, Tuple

import numpy as np

from alpro_tpu.core.logging import LOGGER


def _t(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _nearest_1d(x: np.ndarray, new_len: int, axis: int = 1) -> np.ndarray:
    old_len = x.shape[axis]
    idx = np.floor(np.arange(new_len) * (old_len / new_len)).astype(np.int64)
    return np.take(x, idx, axis=axis)


def resize_spatial_embedding(pos_embed: np.ndarray, num_patches: int) -> np.ndarray:
    """(1, 1+P, D) → (1, 1+num_patches, D), CLS kept, 1D nearest on the rest
    (checkpoint-load path, `helpers.py:355-368`)."""
    cls, rest = pos_embed[:, :1], pos_embed[:, 1:]
    return np.concatenate([cls, _nearest_1d(rest, num_patches)], axis=1)


def resize_temporal_embedding(time_embed: np.ndarray, num_frames: int) -> np.ndarray:
    return _nearest_1d(time_embed, num_frames)


def _convert_vit_attention(sd: Dict[str, np.ndarray], pfx: str) -> dict:
    return {
        "qkv": {"kernel": _t(sd[pfx + "qkv.weight"]), "bias": sd[pfx + "qkv.bias"]},
        "proj": {"kernel": _t(sd[pfx + "proj.weight"]), "bias": sd[pfx + "proj.bias"]},
    }


def _ln(sd, pfx):
    return {"scale": sd[pfx + "weight"], "bias": sd[pfx + "bias"]}


def _dense(sd, pfx):
    return {"kernel": _t(sd[pfx + "weight"]), "bias": sd[pfx + "bias"]}


def _count_layers(sd, pattern: str) -> int:
    """Highest N for keys matching pattern.format(N) + 1 (0 if none)."""
    n = 0
    while pattern.format(n) in sd:
        n += 1
    return n


def convert_timesformer(
    sd: Dict[str, np.ndarray],
    prefix: str = "visual_encoder.model.",
    num_patches: Optional[int] = None,
    num_frames: Optional[int] = None,
    depth: Optional[int] = None,
) -> dict:
    p = prefix
    if depth is None:
        depth = _count_layers(sd, p + "blocks.{}.norm1.weight")
    pos_embed = sd[p + "pos_embed"]
    if num_patches is not None and pos_embed.shape[1] != num_patches + 1:
        pos_embed = resize_spatial_embedding(pos_embed, num_patches)
    time_embed = sd.get(p + "time_embed")
    if (
        time_embed is not None
        and num_frames is not None
        and time_embed.shape[1] != num_frames
    ):
        time_embed = resize_temporal_embedding(time_embed, num_frames)

    conv_w = sd[p + "patch_embed.proj.weight"]  # (D, C, ph, pw)
    patch_kernel = np.ascontiguousarray(
        conv_w.transpose(2, 3, 1, 0).reshape(-1, conv_w.shape[0])
    )

    out = {
        "cls_token": sd[p + "cls_token"],
        "pos_embed": pos_embed,
        "patch_embed": {
            "kernel": patch_kernel,
            "bias": sd[p + "patch_embed.proj.bias"],
        },
        "norm": _ln(sd, p + "norm."),
    }
    if time_embed is not None:
        out["time_embed"] = time_embed
    for i in range(depth):
        bp = f"{p}blocks.{i}."
        out[f"blocks_{i}"] = {
            "norm1": _ln(sd, bp + "norm1."),
            "norm2": _ln(sd, bp + "norm2."),
            "temporal_norm1": _ln(sd, bp + "temporal_norm1."),
            "attn": _convert_vit_attention(sd, bp + "attn."),
            "temporal_attn": _convert_vit_attention(sd, bp + "temporal_attn."),
            "temporal_fc": _dense(sd, bp + "temporal_fc."),
            "mlp": {
                "fc1": _dense(sd, bp + "mlp.fc1."),
                "fc2": _dense(sd, bp + "mlp.fc2."),
            },
        }
    return out


def convert_imagenet_vit(
    sd: Dict[str, np.ndarray],
    prefix: str = "",
    num_patches: Optional[int] = None,
    depth: Optional[int] = None,
) -> dict:
    """timm/imagenet ViT state dict → TimeSformer init (partial tree).

    Reference rules (`helpers.py:262-313` load_pretrained_imagenet +
    `vit.py:289-298` init): spatial attention weights are duplicated into the
    temporal attention, `norm1` into `temporal_norm1`, `temporal_fc` is zeroed
    for every block except block 0 (which keeps its random init — hence
    absent from the returned tree), and `time_embed` keeps its zero init.
    Merge the result over a freshly initialized model with
    `cli/common.py::merge_params`.
    """
    p = prefix
    if depth is None:
        depth = _count_layers(sd, p + "blocks.{}.norm1.weight")
    pos_embed = sd[p + "pos_embed"]
    if num_patches is not None and pos_embed.shape[1] != num_patches + 1:
        pos_embed = resize_spatial_embedding(pos_embed, num_patches)
    conv_w = sd[p + "patch_embed.proj.weight"]
    patch_kernel = np.ascontiguousarray(
        conv_w.transpose(2, 3, 1, 0).reshape(-1, conv_w.shape[0])
    )
    out = {
        "cls_token": sd[p + "cls_token"],
        "pos_embed": pos_embed,
        "patch_embed": {
            "kernel": patch_kernel,
            "bias": sd[p + "patch_embed.proj.bias"],
        },
        "norm": _ln(sd, p + "norm."),
    }
    D = conv_w.shape[0]
    for i in range(depth):
        bp = f"{p}blocks.{i}."
        attn = _convert_vit_attention(sd, bp + "attn.")
        block = {
            "norm1": _ln(sd, bp + "norm1."),
            "norm2": _ln(sd, bp + "norm2."),
            "temporal_norm1": _ln(sd, bp + "norm1."),
            "attn": attn,
            "temporal_attn": {k: dict(v) for k, v in attn.items()},
            "mlp": {
                "fc1": _dense(sd, bp + "mlp.fc1."),
                "fc2": _dense(sd, bp + "mlp.fc2."),
            },
        }
        if i > 0:
            block["temporal_fc"] = {
                "kernel": np.zeros((D, D), np.float32),
                "bias": np.zeros((D,), np.float32),
            }
        out[f"blocks_{i}"] = block
    return out


# The reference's three TimeSformer init families (`helpers.py:191-352`):
#   * imagenet timm ViT (`load_pretrained_imagenet`) → convert_imagenet_vit
#   * CLIP ViT-B/16 in ViT key format (`load_pretrained_CLIP_ViT`) — same
#     spatial→temporal duplication rule → convert_imagenet_vit
#   * Kinetics TimeSformer (`load_pretrained_kinetics`) — all keys native,
#     just pos/time-embed resizing → convert_timesformer
convert_clip_vit = convert_imagenet_vit
convert_kinetics_timesformer = convert_timesformer


def convert_albef_vit(
    sd: Dict[str, np.ndarray],
    prefix: str = "visual_encoder.",
    num_patches: Optional[int] = None,
    depth: Optional[int] = None,
) -> dict:
    """ALBEF plain-ViT visual encoder → partial TimeSformer tree.

    The reference loads ALBEF checkpoints with a plain non-strict
    `load_state_dict` (`run_pretrain_contrastive_only.py:155-161`,
    `load_save.py:73-136` with `strict=not cfg.albef_init`): spatial keys map
    1:1, every temporal key (`temporal_attn`, `temporal_norm1`,
    `temporal_fc`, `time_embed`) is simply MISSING and keeps its module
    init — no spatial→temporal duplication (that rule belongs to the
    imagenet/CLIP helpers only). This converter therefore emits spatial keys
    only; merge it over a fresh init.
    """
    p = prefix
    if depth is None:
        depth = _count_layers(sd, p + "blocks.{}.norm1.weight")
    pos_embed = sd[p + "pos_embed"]
    if num_patches is not None and pos_embed.shape[1] != num_patches + 1:
        pos_embed = resize_spatial_embedding(pos_embed, num_patches)
    conv_w = sd[p + "patch_embed.proj.weight"]
    patch_kernel = np.ascontiguousarray(
        conv_w.transpose(2, 3, 1, 0).reshape(-1, conv_w.shape[0])
    )
    out = {
        "cls_token": sd[p + "cls_token"],
        "pos_embed": pos_embed,
        "patch_embed": {
            "kernel": patch_kernel,
            "bias": sd[p + "patch_embed.proj.bias"],
        },
        "norm": _ln(sd, p + "norm."),
    }
    for i in range(depth):
        bp = f"{p}blocks.{i}."
        out[f"blocks_{i}"] = {
            "norm1": _ln(sd, bp + "norm1."),
            "norm2": _ln(sd, bp + "norm2."),
            "attn": _convert_vit_attention(sd, bp + "attn."),
            "mlp": {
                "fc1": _dense(sd, bp + "mlp.fc1."),
                "fc2": _dense(sd, bp + "mlp.fc2."),
            },
        }
    return out


def convert_bert(
    sd: Dict[str, np.ndarray],
    prefix: str = "text_encoder.bert.",
    num_layers: Optional[int] = None,
) -> dict:
    p = prefix
    if num_layers is None:
        num_layers = _count_layers(
            sd, p + "encoder.layer.{}.attention.self.query.weight"
        )
    out = {
        "embeddings": {
            "word_embeddings": {"embedding": sd[p + "embeddings.word_embeddings.weight"]},
            "position_embeddings": {"embedding": sd[p + "embeddings.position_embeddings.weight"]},
            "token_type_embeddings": {"embedding": sd[p + "embeddings.token_type_embeddings.weight"]},
            "LayerNorm": _ln(sd, p + "embeddings.LayerNorm."),
        }
    }
    for i in range(num_layers):
        lp = f"{p}encoder.layer.{i}."
        out[f"layer_{i}"] = {
            "attention": {
                "query": _dense(sd, lp + "attention.self.query."),
                "key": _dense(sd, lp + "attention.self.key."),
                "value": _dense(sd, lp + "attention.self.value."),
            },
            "attention_output": _dense(sd, lp + "attention.output.dense."),
            "attention_layernorm": _ln(sd, lp + "attention.output.LayerNorm."),
            "intermediate": _dense(sd, lp + "intermediate.dense."),
            "output": _dense(sd, lp + "output.dense."),
            "output_layernorm": _ln(sd, lp + "output.LayerNorm."),
        }
    return out


def convert_mlm_head(sd: Dict[str, np.ndarray], prefix: str = "text_encoder.cls.") -> dict:
    p = prefix + "predictions."
    decoder_bias = sd.get(p + "decoder.bias", sd.get(p + "bias"))
    return {
        "transform_dense": _dense(sd, p + "transform.dense."),
        "transform_layernorm": _ln(sd, p + "transform.LayerNorm."),
        "decoder": {"kernel": _t(sd[p + "decoder.weight"]), "bias": decoder_bias},
    }


def convert_reference_state_dict(
    sd: Dict[str, np.ndarray],
    *,
    num_patches: Optional[int] = None,
    num_frames: Optional[int] = None,
    depth: Optional[int] = None,
    num_bert_layers: Optional[int] = None,
    remove_text_encoder_prefix: bool = False,
    albef: bool = False,
) -> dict:
    """Full ALPRO checkpoint → {'params': ...} tree for AlproModel.

    `remove_text_encoder_prefix=True` mirrors the QA finetune load path: the
    source checkpoint stores `text_encoder.bert.*` but the target text encoder
    is unprefixed (`load_save.py:96-101`).

    `albef=True` (or auto-detected: no `visual_encoder.model.` keys but plain
    `visual_encoder.pos_embed`) handles ALBEF checkpoints — a plain ViT
    visual tower loaded non-strict, temporal params left at init
    (`run_pretrain_contrastive_only.py:155-161` `strict=not cfg.albef_init`).
    """
    # `sd` is read-only by contract — no defensive copy, so callers (e.g.
    # the key-manifest gate) can pass instrumented mappings. The proxy wrap
    # enforces it: any future in-place key normalization raises TypeError
    # instead of silently corrupting the caller's view. (mappingproxy
    # delegates lookups to the wrapped mapping, so instrumented overrides
    # like TrackingDict.__getitem__ still fire.)
    sd = types.MappingProxyType(sd)
    text_prefix = "text_encoder.bert."
    if not any(k.startswith(text_prefix) for k in sd):
        text_prefix = "text_encoder."
    if remove_text_encoder_prefix:
        text_prefix = "text_encoder.bert." if any(
            k.startswith("text_encoder.bert.") for k in sd
        ) else "text_encoder."

    if not albef and "visual_encoder.model.pos_embed" not in sd and \
            "visual_encoder.pos_embed" in sd:
        albef = True
    if albef:
        visual = convert_albef_vit(
            sd, "visual_encoder.", num_patches=num_patches, depth=depth
        )
    else:
        visual = convert_timesformer(
            sd, "visual_encoder.model.",
            num_patches=num_patches, num_frames=num_frames, depth=depth,
        )
    params: dict = {
        "visual_encoder": visual,
        "text_encoder": convert_bert(sd, text_prefix, num_bert_layers),
        "vision_proj": _dense(sd, "vision_proj."),
        "text_proj": _dense(sd, "text_proj."),
        "itm_head": _dense(sd, "itm_head."),
    }
    if "temp" in sd:
        params["temp"] = np.asarray(sd["temp"], dtype=np.float32).reshape(())
    if "text_encoder.cls.predictions.transform.dense.weight" in sd:
        params["mlm_head"] = convert_mlm_head(sd)
    if "classifier.0.weight" in sd:
        params["classifier_hidden"] = _dense(sd, "classifier.0.")
        params["classifier_out"] = _dense(sd, "classifier.2.")
    if "mpm_head.0.weight" in sd:
        params["mpm_hidden"] = _dense(sd, "mpm_head.0.")
        params["mpm_out"] = _dense(sd, "mpm_head.2.")
    return {"params": params}


def load_reference_checkpoint(
    path: str,
    *,
    num_patches: Optional[int] = None,
    num_frames: Optional[int] = None,
    remove_text_encoder_prefix: bool = False,
    albef: bool = False,
) -> Tuple[dict, Dict[str, np.ndarray]]:
    """Load a reference `.pt` file (torch CPU pickle) and convert.

    Returns (converted_params, prompter_state_dict_or_empty). The pretrain
    checkpoint embeds a `prompter.*` teacher (`alpro_models.py:63`); its
    sub-dict is returned for a separate conversion pass.
    """
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "model" in raw and isinstance(raw["model"], dict):
        raw = raw["model"]
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in raw.items()}

    prompter_sd = {
        k[len("prompter."):]: v for k, v in sd.items() if k.startswith("prompter.")
    }
    main_sd = {k: v for k, v in sd.items() if not k.startswith("prompter.")}
    params = convert_reference_state_dict(
        main_sd,
        num_patches=num_patches,
        num_frames=num_frames,
        remove_text_encoder_prefix=remove_text_encoder_prefix,
        albef=albef,
    )
    LOGGER.info(
        "Converted checkpoint %s (%d tensors, %d prompter tensors)",
        path, len(main_sd), len(prompter_sd),
    )
    return params, prompter_sd
