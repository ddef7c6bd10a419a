"""Export alpro_tpu params back to a reference-style torch state dict.

The inverse of `torch_convert.py`: lets checkpoints trained here be loaded by
reference-format consumers (`load_state_dict_with_pos_embed_resizing`), and
gives a lossless round-trip test target. Tensors come back as numpy arrays;
call `save_torch_checkpoint` to pickle them with torch.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def _put_dense(sd, pfx, tree):
    sd[pfx + "weight"] = _t(tree["kernel"])
    sd[pfx + "bias"] = np.asarray(tree["bias"])


def _put_ln(sd, pfx, tree):
    sd[pfx + "weight"] = np.asarray(tree["scale"])
    sd[pfx + "bias"] = np.asarray(tree["bias"])


def export_timesformer(tree: dict, prefix: str = "visual_encoder.model.") -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    p = prefix
    sd[p + "cls_token"] = np.asarray(tree["cls_token"])
    sd[p + "pos_embed"] = np.asarray(tree["pos_embed"])
    if "time_embed" in tree:
        sd[p + "time_embed"] = np.asarray(tree["time_embed"])
    # (p·p·C, D) matmul kernel → (D, C, p, p) conv weight
    k = np.asarray(tree["patch_embed"]["kernel"])
    D = k.shape[1]
    ppc = k.shape[0]
    # infer patch geometry: ppc = p*p*3
    ps = int(round((ppc / 3) ** 0.5))
    sd[p + "patch_embed.proj.weight"] = np.ascontiguousarray(
        k.reshape(ps, ps, 3, D).transpose(3, 2, 0, 1)
    )
    sd[p + "patch_embed.proj.bias"] = np.asarray(tree["patch_embed"]["bias"])
    _put_ln(sd, p + "norm.", tree["norm"])
    i = 0
    while f"blocks_{i}" in tree:
        b = tree[f"blocks_{i}"]
        bp = f"{p}blocks.{i}."
        _put_ln(sd, bp + "norm1.", b["norm1"])
        _put_ln(sd, bp + "norm2.", b["norm2"])
        _put_ln(sd, bp + "temporal_norm1.", b["temporal_norm1"])
        for attn in ("attn", "temporal_attn"):
            _put_dense(sd, bp + f"{attn}.qkv.", b[attn]["qkv"])
            _put_dense(sd, bp + f"{attn}.proj.", b[attn]["proj"])
        _put_dense(sd, bp + "temporal_fc.", b["temporal_fc"])
        _put_dense(sd, bp + "mlp.fc1.", b["mlp"]["fc1"])
        _put_dense(sd, bp + "mlp.fc2.", b["mlp"]["fc2"])
        i += 1
    return sd


def export_bert(tree: dict, prefix: str = "text_encoder.bert.") -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    p = prefix
    emb = tree["embeddings"]
    sd[p + "embeddings.word_embeddings.weight"] = np.asarray(
        emb["word_embeddings"]["embedding"]
    )
    sd[p + "embeddings.position_embeddings.weight"] = np.asarray(
        emb["position_embeddings"]["embedding"]
    )
    sd[p + "embeddings.token_type_embeddings.weight"] = np.asarray(
        emb["token_type_embeddings"]["embedding"]
    )
    _put_ln(sd, p + "embeddings.LayerNorm.", emb["LayerNorm"])
    i = 0
    while f"layer_{i}" in tree:
        l = tree[f"layer_{i}"]
        lp = f"{p}encoder.layer.{i}."
        _put_dense(sd, lp + "attention.self.query.", l["attention"]["query"])
        _put_dense(sd, lp + "attention.self.key.", l["attention"]["key"])
        _put_dense(sd, lp + "attention.self.value.", l["attention"]["value"])
        _put_dense(sd, lp + "attention.output.dense.", l["attention_output"])
        _put_ln(sd, lp + "attention.output.LayerNorm.", l["attention_layernorm"])
        _put_dense(sd, lp + "intermediate.dense.", l["intermediate"])
        _put_dense(sd, lp + "output.dense.", l["output"])
        _put_ln(sd, lp + "output.LayerNorm.", l["output_layernorm"])
        i += 1
    return sd


def export_reference_state_dict(params: dict) -> Dict[str, np.ndarray]:
    """Full AlproModel param tree ({'params': ...}) → reference key space."""
    tree = params["params"] if "params" in params else params
    sd: Dict[str, np.ndarray] = {}
    sd.update(export_timesformer(tree["visual_encoder"]))
    sd.update(export_bert(tree["text_encoder"]))
    for name in ("vision_proj", "text_proj", "itm_head"):
        _put_dense(sd, name + ".", tree[name])
    if "temp" in tree:
        sd["temp"] = np.asarray(tree["temp"])
    if "mlm_head" in tree:
        h = tree["mlm_head"]
        _put_dense(sd, "text_encoder.cls.predictions.transform.dense.", h["transform_dense"])
        _put_ln(sd, "text_encoder.cls.predictions.transform.LayerNorm.", h["transform_layernorm"])
        _put_dense(sd, "text_encoder.cls.predictions.decoder.", h["decoder"])
        sd["text_encoder.cls.predictions.bias"] = np.asarray(h["decoder"]["bias"])
    if "classifier_hidden" in tree:
        _put_dense(sd, "classifier.0.", tree["classifier_hidden"])
        _put_dense(sd, "classifier.2.", tree["classifier_out"])
    if "mpm_hidden" in tree:
        _put_dense(sd, "mpm_head.0.", tree["mpm_hidden"])
        _put_dense(sd, "mpm_head.2.", tree["mpm_out"])
    return sd


def save_torch_checkpoint(path: str, params: dict) -> None:
    import torch

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_reference_state_dict(params).items()
    }
    torch.save(sd, path)
