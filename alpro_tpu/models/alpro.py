"""ALPRO task models: video-text alignment + fusion with task heads.

One flax module covers the reference's four model classes
(`/root/reference/src/modeling/alpro_models.py`):

  * AlproForPretrain            → AlproConfig(with_mlm_head=True, num_entities>0)
  * Prompter                    → bare AlproModel (prompt bank lives outside the
                                  module — see objectives/pem.py)
  * AlproForVideoTextRetrieval  → bare AlproModel
  * AlproForSequenceClassification → AlproConfig(num_labels>0)

Design departure from the reference (intentional, SURVEY.md §1): distributed
collectives do NOT live inside the model. The model exposes pure functions
(embed → project → fuse → heads); the VTC/VTM/MLM/PEM objectives in
`alpro_tpu/objectives/` compose them, and cross-device behaviour comes from the
mesh sharding of the training step (`alpro_tpu/train/step.py`).

Head shapes preserved for checkpoint conversion:
  * vision_proj / text_proj: 768 → 256 (`alpro_models.py:33-39`)
  * itm_head: 768 → 2 (`alpro_models.py:42`)
  * classifier: 768 → 768*cls_hidden_scale → ReLU → num_labels
    (`alpro_models.py:639-644`)
  * mpm_head: 768 → 1536 → ReLU → num_entities (`alpro_models.py:66-71`)
  * temp: learnable scalar init 0.07, clamped to [0.001, 0.5] at use
    (`alpro_models.py:23,80-81`)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from alpro_tpu.models.bert import BertConfig, BertMLMHead, BertModel
from alpro_tpu.models.timesformer import TimeSformer, TimeSformerConfig


@dataclasses.dataclass(frozen=True)
class AlproConfig:
    bert: BertConfig
    visual: TimeSformerConfig
    embed_dim: int = 256
    temp_init: float = 0.07
    num_labels: int = 0
    with_mlm_head: bool = False
    num_entities: int = 0
    cls_hidden_scale: int = 2


class AlproModel(nn.Module):
    cfg: AlproConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.visual_encoder = TimeSformer(cfg.visual, dtype=self.dtype)
        self.text_encoder = BertModel(cfg.bert, dtype=self.dtype)
        self.vision_proj = nn.Dense(cfg.embed_dim, dtype=self.dtype)
        self.text_proj = nn.Dense(cfg.embed_dim, dtype=self.dtype)
        self.itm_head = nn.Dense(2, dtype=self.dtype)
        self.temp = self.param(
            "temp", lambda _k: jnp.asarray(cfg.temp_init, jnp.float32)
        )
        if cfg.with_mlm_head:
            self.mlm_head = BertMLMHead(cfg.bert, dtype=self.dtype)
        if cfg.num_labels > 0:
            hidden = cfg.bert.hidden_size * cfg.cls_hidden_scale
            self.classifier_hidden = nn.Dense(hidden, dtype=self.dtype)
            self.classifier_out = nn.Dense(cfg.num_labels, dtype=self.dtype)
        if cfg.num_entities > 0:
            self.mpm_hidden = nn.Dense(
                cfg.bert.hidden_size * 2, dtype=self.dtype
            )
            self.mpm_out = nn.Dense(cfg.num_entities, dtype=self.dtype)

    # ---- building blocks -------------------------------------------------
    def temperature(self) -> jnp.ndarray:
        return jnp.clip(self.temp, 0.001, 0.5)

    def embed_video(
        self, pixels: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        """(B, T, H, W, C) normalized pixels → (B, 1+N, 768) tokens."""
        return self.visual_encoder(
            pixels, pooling="temporal", deterministic=deterministic
        )

    def embed_text(
        self,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Token ids → (B, Lt, 768) via the text half (layers 0..fusion)."""
        return self.text_encoder(
            input_ids=input_ids,
            attention_mask=attention_mask,
            mode="text",
            deterministic=deterministic,
        )

    def video_feat(self, video_embeds: jnp.ndarray) -> jnp.ndarray:
        """CLS token → normalized 256-d contrastive feature."""
        feat = self.vision_proj(video_embeds[:, 0, :]).astype(jnp.float32)
        return feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)

    def text_feat(self, text_embeds: jnp.ndarray) -> jnp.ndarray:
        feat = self.text_proj(text_embeds[:, 0, :]).astype(jnp.float32)
        return feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)

    def fuse(
        self,
        text_embeds: jnp.ndarray,
        text_mask: jnp.ndarray,
        video_embeds: jnp.ndarray,
        video_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Concat [text, video] through the fusion half (layers fusion..12)."""
        B, Lv = video_embeds.shape[:2]
        if video_mask is None:
            video_mask = jnp.ones((B, Lv), dtype=text_mask.dtype)
        embeds = jnp.concatenate(
            [text_embeds.astype(self.dtype), video_embeds.astype(self.dtype)],
            axis=1,
        )
        mask = jnp.concatenate([text_mask, video_mask], axis=1)
        return self.text_encoder(
            encoder_embeds=embeds,
            attention_mask=mask,
            mode="fusion",
            deterministic=deterministic,
        )

    # ---- heads -----------------------------------------------------------
    def itm_logits(self, fusion_cls: jnp.ndarray) -> jnp.ndarray:
        return self.itm_head(fusion_cls).astype(jnp.float32)

    def mlm_logits(self, fusion_text_hidden: jnp.ndarray) -> jnp.ndarray:
        return self.mlm_head(fusion_text_hidden).astype(jnp.float32)

    def classify(self, fusion_cls: jnp.ndarray) -> jnp.ndarray:
        x = self.classifier_hidden(fusion_cls)
        x = nn.relu(x)
        return self.classifier_out(x).astype(jnp.float32)

    def mpm_logits(self, masked_mean_embeds: jnp.ndarray) -> jnp.ndarray:
        x = self.mpm_hidden(masked_mean_embeds)
        x = nn.relu(x)
        return self.mpm_out(x).astype(jnp.float32)

    # ---- init / default forward -----------------------------------------
    def __call__(
        self,
        pixels: jnp.ndarray,
        text_ids: jnp.ndarray,
        text_mask: jnp.ndarray,
        deterministic: bool = True,
    ):
        """Touches every head once (used for parameter init and the
        single-chip compile check)."""
        video_embeds = self.embed_video(pixels, deterministic)
        text_embeds = self.embed_text(text_ids, text_mask, deterministic)
        v_feat = self.video_feat(video_embeds)
        t_feat = self.text_feat(text_embeds)
        sim = v_feat @ t_feat.T / self.temperature()
        fusion = self.fuse(
            text_embeds, text_mask, video_embeds, deterministic=deterministic
        )
        out = {
            "video_embeds": video_embeds,
            "text_embeds": text_embeds,
            "video_feat": v_feat,
            "text_feat": t_feat,
            "sim": sim,
            "fusion": fusion,
            "itm_logits": self.itm_logits(fusion[:, 0, :]),
        }
        if self.cfg.with_mlm_head:
            Lt = text_ids.shape[1]
            out["mlm_logits"] = self.mlm_logits(fusion[:, :Lt, :])
        if self.cfg.num_labels > 0:
            out["cls_logits"] = self.classify(fusion[:, 0, :])
        if self.cfg.num_entities > 0:
            out["mpm_logits"] = self.mpm_logits(
                jnp.mean(fusion[:, text_ids.shape[1] + 1 :, :], axis=1)
            )
        return out


# ---- builders mirroring the reference model classes ----------------------
def _cfgs(bert_cfg_dict: dict, video_enc_cfg: dict, img_size: int, num_frm: int):
    bert = (
        bert_cfg_dict
        if isinstance(bert_cfg_dict, BertConfig)
        else BertConfig.from_json_dict(bert_cfg_dict)
    )
    vis = (
        video_enc_cfg
        if isinstance(video_enc_cfg, TimeSformerConfig)
        else TimeSformerConfig.from_reference_cfg(video_enc_cfg, img_size, num_frm)
    )
    return bert, vis


def build_retrieval_model(bert_cfg, video_enc_cfg, img_size=224, num_frm=8,
                          dtype=jnp.float32) -> AlproModel:
    bert, vis = _cfgs(bert_cfg, video_enc_cfg, img_size, num_frm)
    return AlproModel(AlproConfig(bert=bert, visual=vis), dtype=dtype)


def build_qa_model(bert_cfg, video_enc_cfg, num_labels, img_size=224,
                   num_frm=16, cls_hidden_scale=2, dtype=jnp.float32) -> AlproModel:
    bert, vis = _cfgs(bert_cfg, video_enc_cfg, img_size, num_frm)
    return AlproModel(
        AlproConfig(
            bert=bert, visual=vis, num_labels=num_labels,
            cls_hidden_scale=cls_hidden_scale,
        ),
        dtype=dtype,
    )


def build_pretrain_model(bert_cfg, video_enc_cfg, num_entities=1000,
                         img_size=224, num_frm=4, dtype=jnp.float32) -> AlproModel:
    bert, vis = _cfgs(bert_cfg, video_enc_cfg, img_size, num_frm)
    return AlproModel(
        AlproConfig(
            bert=bert, visual=vis, with_mlm_head=True,
            num_entities=num_entities,
        ),
        dtype=dtype,
    )


def build_prompter_model(bert_cfg, video_enc_cfg, img_size=224, num_frm=4,
                         dtype=jnp.float32) -> AlproModel:
    bert, vis = _cfgs(bert_cfg, video_enc_cfg, img_size, num_frm)
    return AlproModel(AlproConfig(bert=bert, visual=vis), dtype=dtype)
