"""Param-tree adapters between unrolled (blocks_{i}/…, layer_{i}/…) and
scanned (blocks/block/… stacked on axis 0) encoder layouts.

Checkpoints, the torch converter, and the parity tests all speak the
unrolled layout; the scanned models (`TimeSformerConfig.scan_blocks`,
`BertConfig.scan_blocks`) compile one block body via lax.scan. These
adapters convert in both directions, so the stored format never changes:
init/load the unrolled tree, `stack` it to train/serve scanned, `unstack`
before export.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def stack_block_params(
    tree: Dict, count: int, prefix: str = "blocks_", dest: str = "blocks",
    inner: str = "block", start: int = 0,
) -> Dict:
    """tree[f'{prefix}{start+i}'] for i < count → tree[dest][inner] stacked
    on axis 0; all other keys pass through."""
    subs = [tree[f"{prefix}{start + i}"] for i in range(count)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *subs)
    out = {
        k: v
        for k, v in tree.items()
        if not any(k == f"{prefix}{start + i}" for i in range(count))
    }
    out[dest] = {inner: stacked} if inner else stacked
    return out


def unstack_block_params(
    tree: Dict, count: int, prefix: str = "blocks_", dest: str = "blocks",
    inner: str = "block", start: int = 0,
) -> Dict:
    stacked = tree[dest][inner] if inner else tree[dest]
    out = {k: v for k, v in tree.items() if k != dest}
    for i in range(count):
        out[f"{prefix}{start + i}"] = jax.tree_util.tree_map(
            lambda x, i=i: x[i], stacked
        )
    return out


def stack_timesformer(vis_tree: Dict, depth: int) -> Dict:
    return stack_block_params(vis_tree, depth)


def unstack_timesformer(vis_tree: Dict, depth: int) -> Dict:
    return unstack_block_params(vis_tree, depth)


def stack_bert(bert_tree: Dict, num_layers: int, fusion_layer: int) -> Dict:
    """layer_{0..f-1} → layers_text/layer; layer_{f..} → layers_fusion/layer."""
    t = stack_block_params(
        bert_tree, fusion_layer, prefix="layer_", dest="layers_text",
        inner="layer",
    )
    return stack_block_params(
        t, num_layers - fusion_layer, prefix="layer_", dest="layers_fusion",
        inner="layer", start=fusion_layer,
    )


def unstack_bert(bert_tree: Dict, num_layers: int, fusion_layer: int) -> Dict:
    t = unstack_block_params(
        bert_tree, fusion_layer, prefix="layer_", dest="layers_text",
        inner="layer",
    )
    return unstack_block_params(
        t, num_layers - fusion_layer, prefix="layer_", dest="layers_fusion",
        inner="layer", start=fusion_layer,
    )


def stack_model_params(params: Dict, bert_cfg, vis_cfg) -> Dict:
    """Full AlproModel {'params': …} tree: unrolled → scanned layout.
    Handles bare-TimeSformer trees (no 'visual_encoder' level) too."""
    inner = dict(params["params"]) if "params" in params else dict(params)
    if "visual_encoder" in inner:
        inner["visual_encoder"] = stack_timesformer(
            dict(inner["visual_encoder"]), vis_cfg.depth
        )
        if "text_encoder" in inner and bert_cfg is not None:
            inner["text_encoder"] = stack_bert(
                dict(inner["text_encoder"]),
                bert_cfg.num_hidden_layers, bert_cfg.fusion_layer,
            )
    elif any(k.startswith("blocks_") for k in inner):
        inner = stack_timesformer(inner, vis_cfg.depth)
    return {"params": inner} if "params" in params else inner


def unstack_model_params(params: Dict, bert_cfg, vis_cfg) -> Dict:
    inner = dict(params["params"]) if "params" in params else dict(params)
    if "visual_encoder" in inner:
        inner["visual_encoder"] = unstack_timesformer(
            dict(inner["visual_encoder"]), vis_cfg.depth
        )
        if "text_encoder" in inner and bert_cfg is not None:
            inner["text_encoder"] = unstack_bert(
                dict(inner["text_encoder"]),
                bert_cfg.num_hidden_layers, bert_cfg.fusion_layer,
            )
    elif "blocks" in inner:
        inner = unstack_timesformer(inner, vis_cfg.depth)
    return {"params": inner} if "params" in params else inner


# ---------------------------------------------------------------------------
# model-aware helpers: checkpoints and converters always speak the unrolled
# layout; these translate params to/from whatever layout the given model
# (AlproModel or bare TimeSformer/BertModel) actually uses.
# ---------------------------------------------------------------------------
def _model_cfgs(model):
    cfg = model.cfg
    if hasattr(cfg, "bert"):  # AlproModel
        return cfg.bert, cfg.visual
    if hasattr(cfg, "fusion_layer"):  # bare BertModel
        return cfg, None
    return None, cfg  # bare TimeSformer


def model_uses_scan(model) -> bool:
    bert, vis = _model_cfgs(model)
    return bool(getattr(bert, "scan_blocks", False) or
                getattr(vis, "scan_blocks", False))


def unrolled_twin(model):
    """Same model with scan_blocks disabled everywhere (identical math and
    unrolled param naming — used for reference-faithful init and checkpoint
    merging)."""
    import dataclasses

    cfg = model.cfg
    if hasattr(cfg, "bert"):
        cfg2 = dataclasses.replace(
            cfg,
            bert=dataclasses.replace(cfg.bert, scan_blocks=False),
            visual=dataclasses.replace(cfg.visual, scan_blocks=False),
        )
    else:
        cfg2 = dataclasses.replace(cfg, scan_blocks=False)
    return type(model)(cfg2, dtype=model.dtype)


def to_model_layout(unrolled_params, model):
    if not model_uses_scan(model):
        return unrolled_params
    bert, vis = _model_cfgs(model)
    if vis is None:  # bare BertModel
        inner = dict(unrolled_params["params"]) if "params" in unrolled_params else dict(unrolled_params)
        inner = stack_bert(inner, bert.num_hidden_layers, bert.fusion_layer)
        return {"params": inner} if "params" in unrolled_params else inner
    return stack_model_params(unrolled_params, bert, vis)


def to_unrolled_layout(params, model):
    if not model_uses_scan(model):
        return params
    bert, vis = _model_cfgs(model)
    if vis is None:
        inner = dict(params["params"]) if "params" in params else dict(params)
        inner = unstack_bert(inner, bert.num_hidden_layers, bert.fusion_layer)
        return {"params": inner} if "params" in params else inner
    return unstack_model_params(params, bert, vis)
