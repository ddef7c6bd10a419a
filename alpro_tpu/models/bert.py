"""Split text/fusion BERT encoder, TPU-native.

Re-designed from the reference's forked HF BERT (`/root/reference/src/modeling/
xbert.py`): a single 12-layer encoder split by ``fusion_layer`` (=6 in
`config_release/base_model.json:17`) —

  * mode='text'        runs layers [0, fusion_layer) on token embeddings;
  * mode='fusion'      runs layers [fusion_layer, num_layers) on pre-computed
                       ``encoder_embeds`` = concat[text_embeds, video_embeds]
                       (`xbert.py:549-559,948-1053`);
  * mode='multi_modal' runs all layers.

Fusion is pure self-attention over the concatenated sequence: the reference
hardcodes ``has_cross_attention=False`` (`xbert.py:450`), so no cross-attention
machinery exists here at all. Masking uses the HF additive constant -10000
(`xbert.py:878-938`) so converted checkpoints reproduce numerics.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from alpro_tpu.ops.layers import LayerNorm, gelu_exact


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0
    fusion_layer: int = 6
    initializer_range: float = 0.02
    attn_impl: str = "auto"
    # whole-layer lowering: 'auto' (TPU + deterministic → 'fused', else
    # 'xla') | 'xla' | 'fused' — the masked attention chain and the post-LN
    # MLP chain each run as one Pallas kernel (ops/pallas_bert_block.py)
    block_impl: str = "auto"
    # per-layer remat (HF-style gradient checkpointing, `xbert.py:569-591`)
    gradient_checkpointing: bool = False
    # what the remat keeps: 'nothing' | 'dots' | 'names' (models/remat.py)
    remat_policy: str = "nothing"
    # lax.scan the text/fusion layer stacks (one compiled layer body per
    # stack; param tree layer_{i}/* → layers_text|layers_fusion/layer/*
    # stacked — convert with `models.scan_utils.stack_bert`)
    scan_blocks: bool = False

    @classmethod
    def from_json_dict(cls, d: dict) -> "BertConfig":
        keys = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in keys})


class BertEmbeddings(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, deterministic: bool = True):
        cfg = self.cfg
        B, L = input_ids.shape
        init = nn.initializers.normal(cfg.initializer_range)
        word = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, embedding_init=init,
            dtype=self.dtype, name="word_embeddings",
        )(input_ids)
        pos_ids = jnp.arange(L)[None, :]
        pos = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, embedding_init=init,
            dtype=self.dtype, name="position_embeddings",
        )(pos_ids)
        tok_type = nn.Embed(
            cfg.type_vocab_size, cfg.hidden_size, embedding_init=init,
            dtype=self.dtype, name="token_type_embeddings",
        )(jnp.zeros_like(input_ids))
        x = word + pos + tok_type
        x = LayerNorm(cfg.layer_norm_eps, dtype=self.dtype, name="LayerNorm")(x)
        x = nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic=deterministic)
        return x


class BertSelfAttention(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attention_mask, deterministic: bool = True):
        from alpro_tpu.ops.attention import multi_head_attention_bshd

        cfg = self.cfg
        B, L, D = x.shape
        H = cfg.num_attention_heads
        hd = D // H

        init = nn.initializers.normal(cfg.initializer_range)
        q = nn.Dense(D, dtype=self.dtype, kernel_init=init, name="query")(x).reshape(B, L, H, hd)
        k = nn.Dense(D, dtype=self.dtype, kernel_init=init, name="key")(x).reshape(B, L, H, hd)
        v = nn.Dense(D, dtype=self.dtype, kernel_init=init, name="value")(x).reshape(B, L, H, hd)
        use_drop = (
            cfg.attention_probs_dropout_prob > 0.0 and not deterministic
        )
        out = multi_head_attention_bshd(
            q, k, v,
            key_mask=attention_mask,
            impl=cfg.attn_impl,
            dropout_rate=cfg.attention_probs_dropout_prob,
            dropout_rng=self.make_rng("dropout") if use_drop else None,
            deterministic=deterministic,
        )
        # remat tag: reused by remat_policy='names' (models/remat.py)
        return checkpoint_name(
            out.reshape(B, L, D), "bert_attn_out"
        )


class _BertAttnParams(nn.Module):
    """Parameter twin of `BertSelfAttention`: query/key/value Dense trees."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, dim: int):
        from alpro_tpu.ops.layers import DenseParams

        std = self.cfg.initializer_range
        q = DenseParams(dim, init="normal", init_std=std, name="query")(dim)
        k = DenseParams(dim, init="normal", init_std=std, name="key")(dim)
        v = DenseParams(dim, init="normal", init_std=std, name="value")(dim)
        return q, k, v


class BertLayer(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attention_mask, deterministic: bool = True):
        cfg = self.cfg
        impl = cfg.block_impl
        if impl == "auto":
            from alpro_tpu.ops.attention import _on_tpu

            D = cfg.hidden_size
            hd = D // cfg.num_attention_heads
            impl = (
                "fused"
                if (
                    _on_tpu() and deterministic and x.shape[1] <= 640
                    and D % 128 == 0 and 128 % hd == 0
                    and cfg.intermediate_size % 128 == 0
                )
                else "xla"
            )
        if impl == "fused" and deterministic:
            # serving path: two kernels per layer — masked attention chain
            # and post-LN MLP chain, each one HBM round-trip
            from alpro_tpu.ops.layers import DenseParams, LNParams
            from alpro_tpu.ops.pallas_bert_block import (
                fused_bert_attention_block,
                fused_bert_mlp_block,
            )

            D = cfg.hidden_size
            std = cfg.initializer_range
            (wq, bq), (wk, bk), (wv, bv) = _BertAttnParams(
                cfg, name="attention"
            )(D)
            wo, bo = DenseParams(
                D, init="normal", init_std=std, name="attention_output"
            )(D)
            l1s, l1b = LNParams(name="attention_layernorm")(D)
            w1, b1 = DenseParams(
                cfg.intermediate_size, init="normal", init_std=std,
                name="intermediate",
            )(D)
            w2, b2 = DenseParams(
                D, init="normal", init_std=std, name="output"
            )(cfg.intermediate_size)
            l2s, l2b = LNParams(name="output_layernorm")(D)
            dt = self.dtype
            x = fused_bert_attention_block(
                x.astype(dt), attention_mask,
                wq.astype(dt), bq.astype(dt), wk.astype(dt), bk.astype(dt),
                wv.astype(dt), bv.astype(dt), wo.astype(dt), bo.astype(dt),
                l1s, l1b, cfg.num_attention_heads, eps=cfg.layer_norm_eps,
            )
            x = fused_bert_mlp_block(
                x, w1.astype(dt), b1.astype(dt), w2.astype(dt), b2.astype(dt),
                l2s, l2b, eps=cfg.layer_norm_eps,
            )
            return x
        attn_out = BertSelfAttention(cfg, dtype=self.dtype, name="attention")(
            x, attention_mask, deterministic
        )
        init = nn.initializers.normal(cfg.initializer_range)
        attn_out = nn.Dense(
            cfg.hidden_size, dtype=self.dtype, kernel_init=init,
            name="attention_output",
        )(attn_out)
        attn_out = nn.Dropout(cfg.hidden_dropout_prob)(
            attn_out, deterministic=deterministic
        )
        x = LayerNorm(
            cfg.layer_norm_eps, dtype=self.dtype, name="attention_layernorm"
        )(attn_out + x)

        inter = nn.Dense(
            cfg.intermediate_size, dtype=self.dtype, kernel_init=init,
            name="intermediate",
        )(x)
        inter = gelu_exact(inter)
        out = nn.Dense(cfg.hidden_size, dtype=self.dtype, kernel_init=init, name="output")(inter)
        out = nn.Dropout(cfg.hidden_dropout_prob)(
            out, deterministic=deterministic
        )
        x = LayerNorm(
            cfg.layer_norm_eps, dtype=self.dtype, name="output_layernorm"
        )(out + x)
        return x


class _ScanBertLayer(nn.Module):
    """Scan body wrapping one BertLayer under the fixed name 'layer'."""

    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attention_mask, deterministic):
        x = BertLayer(self.cfg, dtype=self.dtype, name="layer")(
            x, attention_mask, deterministic
        )
        return x, None


class BertModel(nn.Module):
    """Mode-routed encoder. For mode='fusion', pass ``encoder_embeds``."""

    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.embeddings = BertEmbeddings(self.cfg, dtype=self.dtype)
        if self.cfg.scan_blocks:
            body = _ScanBertLayer
            if self.cfg.gradient_checkpointing:
                from alpro_tpu.models.remat import resolve_remat_policy

                body = nn.remat(
                    body, static_argnums=(3,), prevent_cse=False,
                    policy=resolve_remat_policy(self.cfg.remat_policy),
                )

            def mk_stack(length, name):
                return nn.scan(
                    body,
                    variable_axes={"params": 0},
                    split_rngs={"params": True, "dropout": True},
                    in_axes=(nn.broadcast, nn.broadcast),
                    length=length,
                )(self.cfg, dtype=self.dtype, name=name)

            self.layers_text = mk_stack(self.cfg.fusion_layer, "layers_text")
            self.layers_fusion = mk_stack(
                self.cfg.num_hidden_layers - self.cfg.fusion_layer,
                "layers_fusion",
            )
            self.layers = None
        else:
            layer_cls = BertLayer
            if self.cfg.gradient_checkpointing:
                from alpro_tpu.models.remat import resolve_remat_policy

                layer_cls = nn.remat(
                    BertLayer, static_argnums=(3,),
                    policy=resolve_remat_policy(self.cfg.remat_policy),
                )
            self.layers = [
                layer_cls(self.cfg, dtype=self.dtype, name=f"layer_{i}")
                for i in range(self.cfg.num_hidden_layers)
            ]

    def __call__(
        self,
        input_ids: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        encoder_embeds: Optional[jnp.ndarray] = None,
        mode: str = "multi_modal",
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if mode == "text":
            lo, hi = 0, self.cfg.fusion_layer
        elif mode == "fusion":
            lo, hi = self.cfg.fusion_layer, self.cfg.num_hidden_layers
        elif mode == "multi_modal":
            lo, hi = 0, self.cfg.num_hidden_layers
        else:
            raise ValueError(f"invalid mode {mode!r}")

        if encoder_embeds is None:
            assert input_ids is not None, "input_ids required without encoder_embeds"
            x = self.embeddings(input_ids, deterministic=deterministic)
        else:
            x = encoder_embeds.astype(self.dtype)

        if attention_mask is None:
            attention_mask = jnp.ones(x.shape[:2], dtype=jnp.int32)

        if self.cfg.scan_blocks:
            if mode in ("text", "multi_modal"):
                x, _ = self.layers_text(x, attention_mask, deterministic)
            if mode in ("fusion", "multi_modal"):
                x, _ = self.layers_fusion(x, attention_mask, deterministic)
            return x
        for i in range(lo, hi):
            x = self.layers[i](x, attention_mask, deterministic)
        return x


class BertMLMHead(nn.Module):
    """cls.predictions head: transform (dense+gelu+LN) then vocab decoder.

    The decoder weight is stored separately (converted checkpoints carry the
    tied tensor explicitly, `xbert.py` BertLMPredictionHead).
    """

    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="transform_dense")(
            hidden
        )
        x = gelu_exact(x)
        x = LayerNorm(
            cfg.layer_norm_eps, dtype=self.dtype, name="transform_layernorm"
        )(x)
        logits = nn.Dense(cfg.vocab_size, dtype=self.dtype, name="decoder")(x)
        return logits
