"""Exact state-dict key manifests of the official ALPRO checkpoints.

Transcribed from the reference module definitions (NOT from the checkpoints
themselves — they are not available in this sandbox), so the converter can be
gated on the precise key set the first real-asset run will present:

  * `AlproBaseModel.__init__` — temp / visual_encoder / text_encoder /
    vision_proj / text_proj / itm_head (`alpro_models.py:19-42`)
  * `TimeSformer` wraps `VisionTransformer` under `.model`
    (`timesformer/vit.py:445`); `VisionTransformer` owns cls_token /
    pos_embed / time_embed / patch_embed.proj / blocks.N.* / norm / head
    (`vit.py:257-287`), each Block owns norm1, attn{qkv,proj},
    temporal_norm1, temporal_attn{qkv,proj}, temporal_fc, norm2,
    mlp{fc1,fc2} (`vit.py:105-135`), with qkv_bias=True (`vit.py:452`)
    and the Kinetics-400 head (`vit.py:285-287,440`)
  * xbert `BertForMaskedLM` = bert.* (embeddings incl. the position_ids
    buffer `xbert.py:181`, 12 encoder layers, NO pooler, NO crossattention —
    `has_cross_attention=False` hardcoded `xbert.py:450`) + cls.predictions.*
    with decoder.bias tied to predictions.bias (both keys serialize,
    `xbert.py:665-677`)
  * `AlproForSequenceClassification` — text encoder is a bare `BertModel`
    (no `bert.` nesting, no cls head, add_pooling_layer=False) + 2-layer
    `classifier` Sequential (`alpro_models.py:633-644`)
  * `AlproForPretrain` — base + `prompter.*` (a full `Prompter` submodule,
    `alpro_models.py:63`) + `mpm_head` Sequential (`alpro_models.py:66-71`)
  * `Prompter` — base + video/image_prompt_feat buffers
    (`alpro_models.py:389-398`)

Checkpoints are saved as plain `model.state_dict()` (`load_save.py:52-59`),
so these ARE the on-disk key sets.
"""

from __future__ import annotations

D = 768
HIDDEN_X4 = 3072
DEPTH = 12
PATCHES = 196
VOCAB = 30522
MAX_POS = 512
EMBED = 256
ENTITIES = 1000


def vit_keys(prefix: str = "visual_encoder.model.", num_frames: int = 8):
    """VisionTransformer state-dict keys → shapes (`vit.py:242-310`)."""
    p = prefix
    out = {
        p + "cls_token": (1, 1, D),
        p + "pos_embed": (1, PATCHES + 1, D),
        p + "time_embed": (1, num_frames, D),
        p + "patch_embed.proj.weight": (D, 3, 16, 16),
        p + "patch_embed.proj.bias": (D,),
        p + "norm.weight": (D,),
        p + "norm.bias": (D,),
        # Kinetics-400 classifier head (`vit.py:285-287`, num_classes=400
        # `vit.py:440`) — present in every official checkpoint, never used
        # by forward_features
        p + "head.weight": (400, D),
        p + "head.bias": (400,),
    }
    for i in range(DEPTH):
        bp = f"{p}blocks.{i}."
        for name, shape in (
            ("norm1.weight", (D,)), ("norm1.bias", (D,)),
            ("attn.qkv.weight", (3 * D, D)), ("attn.qkv.bias", (3 * D,)),
            ("attn.proj.weight", (D, D)), ("attn.proj.bias", (D,)),
            ("temporal_norm1.weight", (D,)), ("temporal_norm1.bias", (D,)),
            ("temporal_attn.qkv.weight", (3 * D, D)),
            ("temporal_attn.qkv.bias", (3 * D,)),
            ("temporal_attn.proj.weight", (D, D)),
            ("temporal_attn.proj.bias", (D,)),
            ("temporal_fc.weight", (D, D)), ("temporal_fc.bias", (D,)),
            ("norm2.weight", (D,)), ("norm2.bias", (D,)),
            ("mlp.fc1.weight", (HIDDEN_X4, D)), ("mlp.fc1.bias", (HIDDEN_X4,)),
            ("mlp.fc2.weight", (D, HIDDEN_X4)), ("mlp.fc2.bias", (D,)),
        ):
            out[bp + name] = shape
    return out


def bert_keys(prefix: str, mlm_head: bool):
    """xbert BertModel (+ BertOnlyMLMHead) keys. `prefix` is
    'text_encoder.bert.' for BertForMaskedLM families (`alpro_models.py:30`)
    or 'text_encoder.' for the QA BertModel (`alpro_models.py:636`)."""
    p = prefix
    out = {
        p + "embeddings.position_ids": (1, MAX_POS),  # buffer, xbert.py:181
        p + "embeddings.word_embeddings.weight": (VOCAB, D),
        p + "embeddings.position_embeddings.weight": (MAX_POS, D),
        p + "embeddings.token_type_embeddings.weight": (2, D),
        p + "embeddings.LayerNorm.weight": (D,),
        p + "embeddings.LayerNorm.bias": (D,),
    }
    for i in range(DEPTH):
        lp = f"{p}encoder.layer.{i}."
        for name, shape in (
            ("attention.self.query.weight", (D, D)),
            ("attention.self.query.bias", (D,)),
            ("attention.self.key.weight", (D, D)),
            ("attention.self.key.bias", (D,)),
            ("attention.self.value.weight", (D, D)),
            ("attention.self.value.bias", (D,)),
            ("attention.output.dense.weight", (D, D)),
            ("attention.output.dense.bias", (D,)),
            ("attention.output.LayerNorm.weight", (D,)),
            ("attention.output.LayerNorm.bias", (D,)),
            ("intermediate.dense.weight", (HIDDEN_X4, D)),
            ("intermediate.dense.bias", (HIDDEN_X4,)),
            ("output.dense.weight", (D, HIDDEN_X4)),
            ("output.dense.bias", (D,)),
            ("output.LayerNorm.weight", (D,)),
            ("output.LayerNorm.bias", (D,)),
        ):
            out[lp + name] = shape
    if mlm_head:
        # BertOnlyMLMHead (`xbert.py:648-692`); base is the prefix minus
        # the trailing 'bert.'
        base = prefix[: -len("bert.")]
        cp = base + "cls.predictions."
        out.update({
            cp + "bias": (VOCAB,),
            cp + "transform.dense.weight": (D, D),
            cp + "transform.dense.bias": (D,),
            cp + "transform.LayerNorm.weight": (D,),
            cp + "transform.LayerNorm.bias": (D,),
            cp + "decoder.weight": (VOCAB, D),  # tied to word_embeddings
            cp + "decoder.bias": (VOCAB,),      # tied to predictions.bias
        })
    return out


def base_head_keys(prefix: str = ""):
    """AlproBaseModel's own parameters (`alpro_models.py:22,37-41`)."""
    p = prefix
    return {
        p + "temp": (),
        p + "vision_proj.weight": (EMBED, D),
        p + "vision_proj.bias": (EMBED,),
        p + "text_proj.weight": (EMBED, D),
        p + "text_proj.bias": (EMBED,),
        p + "itm_head.weight": (2, D),
        p + "itm_head.bias": (2,),
    }


def prompter_keys(prefix: str = ""):
    """Prompter = AlproBaseModel + prompt-feature buffers
    (`alpro_models.py:389-398`)."""
    p = prefix
    out = {}
    out.update(base_head_keys(p))
    out.update(vit_keys(p + "visual_encoder.model.", num_frames=4))
    out.update(bert_keys(p + "text_encoder.bert.", mlm_head=True))
    out.update({
        p + "video_prompt_feat": (ENTITIES, EMBED),
        p + "image_prompt_feat": (ENTITIES, EMBED),
    })
    return out


def official_manifest(family: str):
    """Key → shape manifest for an official checkpoint family.

    family:
      'retrieval' — AlproForVideoTextRetrieval (`alpro_models.py:727-731`),
                    e.g. msrvtt/didemo ret finetunes (num_frm=8)
      'qa'        — AlproForSequenceClassification (`alpro_models.py:633-644`),
                    msrvtt_qa (num_labels=1500, num_frm=16)
      'pretrain'  — AlproForPretrain incl. the embedded prompter teacher
                    (`alpro_models.py:58-71`), alpro_pretrained.pt (num_frm=4)
      'prompter'  — standalone Prompter teacher ckpt
                    (`run_pretrain_contrastive_only.py:148-152`)
    """
    if family == "retrieval":
        out = base_head_keys()
        out.update(vit_keys(num_frames=8))
        out.update(bert_keys("text_encoder.bert.", mlm_head=True))
        return out
    if family == "qa":
        out = base_head_keys()
        out.update(vit_keys(num_frames=16))
        # bare BertModel, no bert. nesting, no pooler (add_pooling_layer=
        # False), no cls head (`alpro_models.py:636`)
        out.update(bert_keys("text_encoder.", mlm_head=False))
        out.update({
            "classifier.0.weight": (2 * D, D),
            "classifier.0.bias": (2 * D,),
            "classifier.2.weight": (1500, 2 * D),
            "classifier.2.bias": (1500,),
        })
        return out
    if family == "pretrain":
        out = base_head_keys()
        out.update(vit_keys(num_frames=4))
        out.update(bert_keys("text_encoder.bert.", mlm_head=True))
        out.update(prompter_keys("prompter."))
        out.update({
            "mpm_head.0.weight": (2 * D, D),
            "mpm_head.0.bias": (2 * D,),
            "mpm_head.2.weight": (ENTITIES, 2 * D),
            "mpm_head.2.bias": (ENTITIES,),
        })
        return out
    if family == "prompter":
        return prompter_keys()
    raise ValueError(family)
