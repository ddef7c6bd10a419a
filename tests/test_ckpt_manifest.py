"""Official-checkpoint key-manifest gate.

Golden-number runs on the real released checkpoints are environment-blocked
(no assets in this sandbox), so this layer guarantees the *plumbing* can
never be the failure mode: using the exact key manifests transcribed from
the reference module definitions (tests/ckpt_manifest.py), it asserts

  1. the converter consumes every checkpoint key, except a documented
     known-skip set (buffers / heads the reference itself never uses);
  2. every converted leaf lands on an existing model parameter with the
     exact shape (via jax.eval_shape — no full-size init is materialized);
  3. no model parameter is left unfilled by its matching family.

If the first real-asset run fails, it can only be numerics — never a
key-name or shape surprise.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alpro_tpu.checkpoint.torch_convert import convert_reference_state_dict
from alpro_tpu.models import (
    BertConfig,
    TimeSformerConfig,
    build_prompter_model,
    build_pretrain_model,
    build_qa_model,
    build_retrieval_model,
)

from ckpt_manifest import official_manifest


class TrackingDict(dict):
    """Records which keys the converter actually reads."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.consumed = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return super().__getitem__(k)

    def get(self, k, default=None):
        if k in self:
            self.consumed.add(k)
        return super().get(k, default)


# Keys the converter knowingly ignores (regexes), with the reference
# citation for why ignoring is correct:
KNOWN_SKIPPED = (
    # position_ids: a registered buffer, not a weight (`xbert.py:181`); HF
    # itself lists it under _keys_to_ignore_on_load_missing (`xbert.py:1346`)
    r".*embeddings\.position_ids$",
    # Kinetics-400 classifier head: created at `vit.py:285-287` but
    # forward_features returns pooled tokens before it is ever applied
    # (`vit.py:475-503`); "You can ignore the keys ... from task heads"
    # (`load_save.py:128`)
    r".*visual_encoder\.model\.head\.(weight|bias)$",
    # prompt-feature banks: the reference refuses to load them from teacher
    # checkpoints ("a quick hack to avoid loading prompts",
    # `alpro_models.py:421-428`); the rebuild recomputes banks at startup
    # (`cli/run_pretrain.py::setup_prompt_banks`)
    r"^(prompter\.)?(video|image)_prompt_feat$",
)


def _is_known_skipped(key: str) -> bool:
    return any(re.match(p, key) for p in KNOWN_SKIPPED)


def _tracking_sd(manifest):
    return TrackingDict(
        {k: np.zeros(shape, np.float32) for k, shape in manifest.items()}
    )


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            # leaves are arrays/ShapeDtypeStructs (have .shape) or already
            # shape tuples (from the eval_shape tree.map)
            out[path] = tuple(v.shape) if hasattr(v, "shape") else tuple(v)
    return out


def _model_param_shapes(model, num_frm, max_txt_len=40, extra_init=None):
    """Parameter path → shape via eval_shape (no memory materialized)."""

    def init():
        pixels = jnp.zeros((1, num_frm, 224, 224, 3), jnp.float32)
        ids = jnp.zeros((1, max_txt_len), jnp.int32)
        mask = jnp.ones((1, max_txt_len), jnp.int32)
        return model.init({"params": jax.random.PRNGKey(0)}, pixels, ids, mask)

    shapes = jax.eval_shape(init)
    return _flatten(
        jax.tree.map(lambda x: x.shape, shapes,
                     is_leaf=lambda x: hasattr(x, "shape"))["params"]
    )


def _convert(family, manifest):
    sd = _tracking_sd(manifest)
    if family == "pretrain":
        # load_reference_checkpoint splits the embedded prompter first
        # (`checkpoint/torch_convert.py::load_reference_checkpoint`); both
        # halves go through the same converter
        main = TrackingDict(
            {k: sd[k] for k in list(sd) if not k.startswith("prompter.")}
        )
        sub = TrackingDict(
            {k[len("prompter."):]: sd[k] for k in list(sd)
             if k.startswith("prompter.")}
        )
        conv = convert_reference_state_dict(main, num_patches=196)
        teacher = convert_reference_state_dict(sub, num_patches=196)
        consumed = main.consumed | {"prompter." + k for k in sub.consumed}
        return conv, teacher, consumed
    conv = convert_reference_state_dict(
        sd, num_patches=196,
        remove_text_encoder_prefix=False,
    )
    return conv, None, sd.consumed


FAMILIES = ("retrieval", "qa", "pretrain", "prompter")


@pytest.mark.parametrize("family", FAMILIES)
def test_every_official_key_consumed_or_knowingly_skipped(family):
    manifest = official_manifest(family)
    _, _, consumed = _convert(family, manifest)
    unconsumed = [
        k for k in manifest if k not in consumed and not _is_known_skipped(k)
    ]
    assert not unconsumed, (
        f"{family}: converter silently drops {len(unconsumed)} official "
        f"checkpoint keys: {sorted(unconsumed)[:10]}"
    )


def _build(family):
    bert = BertConfig()
    if family == "retrieval":
        vis = TimeSformerConfig(num_frames=8)
        return build_retrieval_model(bert, vis), 8
    if family == "qa":
        vis = TimeSformerConfig(num_frames=16)
        return build_qa_model(bert, vis, num_labels=1500), 16
    if family == "pretrain":
        vis = TimeSformerConfig(num_frames=4)
        return build_pretrain_model(bert, vis, num_entities=1000), 4
    vis = TimeSformerConfig(num_frames=4)
    return build_prompter_model(bert, vis), 4


# Converted subtrees the task models intentionally do not own: every family's
# text tower is a `BertForMaskedLM` in the reference (`alpro_models.py:30`),
# so retrieval/prompter checkpoints carry `text_encoder.cls.predictions.*`
# even though those forwards never call the MLM head; the rebuild's
# retrieval/prompter models omit the head and `cli/common.py::merge_params`
# drops the converted leaves with a report, never an error.
CONVERTED_BUT_UNUSED = {
    "retrieval": ("mlm_head/",),
    "prompter": ("mlm_head/",),
    "qa": (),
    "pretrain": (),
}


@pytest.mark.parametrize("family", FAMILIES)
def test_converted_tree_fills_model_exactly(family):
    manifest = official_manifest(family)
    conv, teacher, _ = _convert(family, manifest)
    model, num_frm = _build(family)
    model_shapes = _model_param_shapes(model, num_frm)
    conv_shapes = _flatten(conv["params"])
    unused = CONVERTED_BUT_UNUSED[family]

    # (2) every converted leaf exists on the model with the exact shape
    bad = []
    for path, shape in conv_shapes.items():
        if any(path.startswith(u) for u in unused):
            assert path not in model_shapes, (
                f"{path} whitelisted as unused but the model has it"
            )
            continue
        if path not in model_shapes:
            bad.append(f"{path}: converted but not a model param")
        elif model_shapes[path] != shape:
            bad.append(
                f"{path}: ckpt {shape} vs model {model_shapes[path]}"
            )
    assert not bad, f"{family}: {bad[:10]}"

    # (3) every model param is filled by the matching checkpoint family
    unfilled = sorted(set(model_shapes) - set(conv_shapes))
    assert not unfilled, (
        f"{family}: model params the official checkpoint does not fill: "
        f"{unfilled[:10]}"
    )

    if family == "pretrain":
        # the embedded prompter converts against the prompter model (same
        # mlm_head drop as the standalone prompter family)
        tmodel, tfrm = _build("prompter")
        tshapes = _model_param_shapes(tmodel, tfrm)
        t_conv = {
            k: v for k, v in _flatten(teacher["params"]).items()
            if not k.startswith("mlm_head/")
        }
        assert set(t_conv) == set(tshapes)
        for path in t_conv:
            assert t_conv[path] == tshapes[path], path


def test_qa_finetune_from_pretrain_ckpt_prefix_strip():
    """The QA finetune loads the *pretrain* checkpoint with
    remove_text_encoder_prefix=True (`run_video_qa.py:189-195`,
    `load_save.py:96-101`): text_encoder.bert.* must land on the QA model's
    bare text_encoder.*; pretrain-only heads (mlm/mpm) are dropped by the
    merge, never by a key error."""
    manifest = official_manifest("pretrain")
    sd = _tracking_sd(
        {k: v for k, v in manifest.items() if not k.startswith("prompter.")}
    )
    conv = convert_reference_state_dict(
        sd, num_patches=196, num_frames=16, remove_text_encoder_prefix=True
    )
    model, num_frm = _build("qa")
    model_shapes = _model_param_shapes(model, num_frm)
    conv_shapes = _flatten(conv["params"])
    # text tower fully lands
    text_paths = [p for p in model_shapes if p.startswith("text_encoder/")]
    assert text_paths
    for p in text_paths:
        assert p in conv_shapes and conv_shapes[p] == model_shapes[p], p
    # time_embed resized 4 → 16 frames on the way in
    assert conv_shapes["visual_encoder/time_embed"] == (1, 16, 768)
    # QA classifier is the only unfilled family difference
    unfilled = sorted(set(model_shapes) - set(conv_shapes))
    assert unfilled == [
        "classifier_hidden/bias", "classifier_hidden/kernel",
        "classifier_out/bias", "classifier_out/kernel",
    ], unfilled
