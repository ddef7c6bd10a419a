"""Flagship-dims golden parity: the reference's own torch modules at FULL
ALPRO-base dimensions vs the JAX stack through the real conversion path.

Everything in tests/test_reference_parity.py and tests/test_e2e_golden.py
runs at toy dims (dim=64, depth=3, img=32, T=2). These gates run the
reference's unmodified torch code (`/root/reference/src/modeling/timesformer/
vit.py:136-213,321-377`, `xbert.py:940-1053`) at the real operating point —
ViT-B/16 at 224², T=8 and T=16; BERT-base 12L/768-d/12H/30522-vocab with
fusion_layer=6 (`config_release/base_model.json`) — export a
reference-format checkpoint, convert it with the SAME loader the CLI uses
(`checkpoint/torch_convert.load_reference_checkpoint`), and compare

  (a) per-block / per-layer activations of both towers,
  (b) the retrieval score matrix (4 videos × 8 texts) through both
      inference paths (`alpro_models.py:874-914` forward_inference math vs
      `train/step.make_retrieval_inference_fn`),
  (c) QA classifier logits (`alpro_models.py:633-724`),

all in fp32 with tight tolerances.  This is the class of bug the toy-dims
tests cannot catch: 14×14 pos-embed grid handling, 768-wide reduction
accumulation order, the 6-of-12 fusion split, the 30522-row embedding.

~6 min total on the 1-core CPU sandbox host (torch fwd ~4 s/clip at T=8;
JAX compile ~10-40 s per jit) — marked slow.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_reference_parity import (
    _build_ref_bert,
    _build_ref_vit,
    _ref_tokens_to_btnd,
    _reference_modules,
)

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir("/root/reference/src"),
        reason="reference tree not mounted",
    ),
]

# ALPRO-base operating point (`config_release/base_model.json`,
# `config_release/msrvtt_ret.json:27`, `msrvtt_qa.json:36`)
DIM, DEPTH, HEADS = 768, 12, 12
LAYERS, FUSION, VOCAB, INTER = 12, 6, 30522, 3072
IMG, PATCH = 224, 16
N_PATCH = (IMG // PATCH) ** 2  # 196 → the real 14×14 grid

PIXEL_MEAN = (0.48145466, 0.4578275, 0.40821073)
PIXEL_STD = (0.26862954, 0.26130258, 0.27577711)


def _normalize(clip_uint8: np.ndarray) -> np.ndarray:
    x = clip_uint8.astype(np.float32) / 255.0
    return ((x - np.asarray(PIXEL_MEAN)) / np.asarray(PIXEL_STD)).astype(
        np.float32
    )


def _ref_pooled(m, x_f32: np.ndarray, T: int) -> np.ndarray:
    """Reference forward + TimeSformer temporal pooling (`vit.py:475-503`)."""
    xt = torch.from_numpy(
        np.ascontiguousarray(x_f32.transpose(0, 4, 1, 2, 3), dtype=np.float32)
    )
    with torch.no_grad():
        toks = m.forward_features(xt, return_all_tokens=True).numpy()
    cls, grid = _ref_tokens_to_btnd(toks, x_f32.shape[0], T, N_PATCH)
    return np.concatenate([cls[:, None], grid.mean(axis=1)], axis=1)


# --------------------------------------------------------------------------
# (a) towers, per-block
# --------------------------------------------------------------------------
def test_flagship_timesformer_t8_blocks_match_reference():
    import jax
    import jax.numpy as jnp

    from alpro_tpu.checkpoint.torch_convert import convert_timesformer
    from alpro_tpu.models import TimeSformer, TimeSformerConfig

    ref_vit, _ = _reference_modules()
    B, T = 1, 8
    m = _build_ref_vit(
        ref_vit, img_size=IMG, num_frames=T, depth=DEPTH, dim=DIM, heads=HEADS
    )
    ref_block_outs = []
    for blk in m.blocks:
        blk.register_forward_hook(
            lambda mod, inp, out: ref_block_outs.append(out.detach().numpy())
        )
    rng = np.random.RandomState(0)
    x = rng.randn(B, T, IMG, IMG, 3).astype(np.float32)
    ref_pooled = _ref_pooled(m, x, T)

    sd = {
        "visual_encoder.model." + k: v.detach().numpy()
        for k, v in m.state_dict().items()
    }
    params = {"params": convert_timesformer(sd, "visual_encoder.model.")}
    cfg = TimeSformerConfig(
        img_size=IMG, patch_size=PATCH, num_frames=T, embed_dim=DIM,
        depth=DEPTH, num_heads=HEADS, drop_path_rate=0.0,
    )
    model = TimeSformer(cfg, dtype=jnp.float32)
    ours, state = jax.jit(
        lambda p, x: model.apply(
            p, x, pooling="temporal",
            capture_intermediates=lambda mdl, name: name == "__call__",
        )
    )(params, jnp.asarray(x))

    inter = state["intermediates"]
    assert len(ref_block_outs) == DEPTH
    for i in range(DEPTH):
        cls_i, x_i = inter[f"blocks_{i}"]["__call__"][0]
        ref_cls_i, ref_x_i = _ref_tokens_to_btnd(ref_block_outs[i], B, T, N_PATCH)
        np.testing.assert_allclose(
            np.asarray(cls_i)[:, 0], ref_cls_i, atol=2e-4, rtol=1e-4,
            err_msg=f"block {i} CLS",
        )
        np.testing.assert_allclose(
            np.asarray(x_i), ref_x_i, atol=2e-4, rtol=1e-4,
            err_msg=f"block {i} patches",
        )
    np.testing.assert_allclose(
        np.asarray(ours), ref_pooled, atol=2e-4, rtol=1e-4
    )


def test_flagship_timesformer_t16_matches_reference():
    """T=16, the QA operating point (`config_release/msrvtt_qa.json:36`) —
    the temporal attention runs over twice the frames and time_embed is
    built at 16 entries natively."""
    import jax
    import jax.numpy as jnp

    from alpro_tpu.checkpoint.torch_convert import convert_timesformer
    from alpro_tpu.models import TimeSformer, TimeSformerConfig

    ref_vit, _ = _reference_modules()
    B, T = 1, 16
    m = _build_ref_vit(
        ref_vit, img_size=IMG, num_frames=T, depth=DEPTH, dim=DIM, heads=HEADS
    )
    rng = np.random.RandomState(1)
    x = rng.randn(B, T, IMG, IMG, 3).astype(np.float32)
    ref_pooled = _ref_pooled(m, x, T)

    sd = {
        "visual_encoder.model." + k: v.detach().numpy()
        for k, v in m.state_dict().items()
    }
    params = {"params": convert_timesformer(sd, "visual_encoder.model.")}
    cfg = TimeSformerConfig(
        img_size=IMG, patch_size=PATCH, num_frames=T, embed_dim=DIM,
        depth=DEPTH, num_heads=HEADS, drop_path_rate=0.0,
    )
    model = TimeSformer(cfg, dtype=jnp.float32)
    ours = jax.jit(lambda p, x: model.apply(p, x, pooling="temporal"))(
        params, jnp.asarray(x)
    )
    np.testing.assert_allclose(
        np.asarray(ours), ref_pooled, atol=2e-4, rtol=1e-4
    )


def test_flagship_bert_base_layers_match_reference():
    import jax
    import jax.numpy as jnp

    from alpro_tpu.checkpoint.torch_convert import convert_bert
    from alpro_tpu.models import BertConfig, BertModel

    _, ref_xbert = _reference_modules()
    m = _build_ref_bert(
        ref_xbert, layers=LAYERS, fusion=FUSION, dim=DIM, heads=HEADS,
        vocab=VOCAB,
    )
    # _build_ref_bert uses intermediate_size=2*dim; override to the real 3072
    from transformers.models.bert.configuration_bert import BertConfig as HFCfg

    torch.manual_seed(13)
    hf = HFCfg(
        vocab_size=VOCAB, hidden_size=DIM, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        fusion_layer=FUSION, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    m = ref_xbert.BertModel(hf, add_pooling_layer=False).eval()

    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params = {"params": convert_bert(sd, prefix="", num_layers=LAYERS)}
    cfg = BertConfig(
        vocab_size=VOCAB, hidden_size=DIM, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        fusion_layer=FUSION,
    )
    model = BertModel(cfg, dtype=jnp.float32)

    rng = np.random.RandomState(3)
    B, Lt = 4, 40  # max_txt_len region of the real configs
    ids = rng.randint(0, VOCAB, (B, Lt)).astype(np.int64)
    mask = np.ones((B, Lt), np.int64)
    mask[0, 25:] = 0
    mask[2, 10:] = 0
    with torch.no_grad():
        ref_text = m(
            torch.from_numpy(ids), attention_mask=torch.from_numpy(mask),
            return_dict=True, mode="text", output_hidden_states=True,
        )
        # fusion mode over a realistic 237-token concat sequence
        # (40 text + 197 video) — `xbert.py:549-559` layers [6, 12)
        emb = torch.from_numpy(
            rng.randn(B, Lt + 1 + N_PATCH, DIM).astype(np.float32)
        )
        emask = torch.ones(B, Lt + 1 + N_PATCH, dtype=torch.long)
        ref_fusion = m(
            encoder_embeds=emb, attention_mask=emask, return_dict=True,
            mode="fusion", output_hidden_states=True,
        )

    ours_text, state = jax.jit(
        lambda p, i, a: model.apply(
            p, i, a, mode="text",
            capture_intermediates=lambda mdl, name: name == "__call__",
        )
    )(params, jnp.asarray(ids), jnp.asarray(mask))
    inter = state["intermediates"]
    np.testing.assert_allclose(
        np.asarray(inter["embeddings"]["__call__"][0]),
        ref_text.hidden_states[0].numpy(), atol=2e-4, rtol=1e-4,
    )
    for i in range(FUSION):
        np.testing.assert_allclose(
            np.asarray(inter[f"layer_{i}"]["__call__"][0]),
            ref_text.hidden_states[i + 1].numpy(), atol=2e-4, rtol=1e-4,
            err_msg=f"text layer {i}",
        )
    np.testing.assert_allclose(
        np.asarray(ours_text), ref_text.last_hidden_state.numpy(),
        atol=2e-4, rtol=1e-4,
    )
    ours_fusion = jax.jit(
        lambda p, e, a: model.apply(
            p, None, a, encoder_embeds=e, mode="fusion"
        )
    )(params, jnp.asarray(emb.numpy()),
      jnp.asarray(np.ones((B, Lt + 1 + N_PATCH), np.int32)))
    np.testing.assert_allclose(
        np.asarray(ours_fusion), ref_fusion.last_hidden_state.numpy(),
        atol=2e-4, rtol=1e-4,
    )


# --------------------------------------------------------------------------
# (b)+(c) full model through the CLI's checkpoint loader
# --------------------------------------------------------------------------
class _TorchRefFull:
    """Reference-architecture ALPRO at full dims: the reference's own
    VisionTransformer + xbert.BertModel plus the AlproBaseModel heads
    (`alpro_models.py:19-42`), emitting a reference-format state dict."""

    def __init__(self, T=8, num_labels=0):
        ref_vit, ref_xbert = _reference_modules()
        self.T = T
        self.vit = _build_ref_vit(
            ref_vit, img_size=IMG, num_frames=T, depth=DEPTH, dim=DIM,
            heads=HEADS,
        )
        from transformers.models.bert.configuration_bert import (
            BertConfig as HFCfg,
        )

        torch.manual_seed(17)
        hf = HFCfg(
            vocab_size=VOCAB, hidden_size=DIM, num_hidden_layers=LAYERS,
            num_attention_heads=HEADS, intermediate_size=INTER,
            fusion_layer=FUSION, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        )
        self.bert = ref_xbert.BertModel(hf, add_pooling_layer=False).eval()
        g = torch.Generator().manual_seed(23)

        def lin(i, o):
            mod = torch.nn.Linear(i, o)
            with torch.no_grad():
                mod.weight.normal_(0, 0.02, generator=g)
                mod.bias.normal_(0, 0.01, generator=g)
            return mod.eval()

        self.vision_proj = lin(DIM, 256)
        self.text_proj = lin(DIM, 256)
        self.itm_head = lin(DIM, 2)
        self.temp = 0.07
        self.classifier = (
            torch.nn.Sequential(
                lin(DIM, 2 * DIM), torch.nn.ReLU(), lin(2 * DIM, num_labels)
            )
            if num_labels
            else None
        )

    def state_dict(self, qa: bool = False):
        sd = {}
        for k, v in self.vit.state_dict().items():
            sd[f"visual_encoder.model.{k}"] = v
        tp = "text_encoder." if qa else "text_encoder.bert."
        for k, v in self.bert.state_dict().items():
            sd[tp + k] = v
        for name, mod in (
            ("vision_proj", self.vision_proj),
            ("text_proj", self.text_proj),
            ("itm_head", self.itm_head),
        ):
            for k, v in mod.state_dict().items():
                sd[f"{name}.{k}"] = v
        sd["temp"] = torch.tensor(self.temp)
        if self.classifier is not None:
            for k, v in self.classifier.state_dict().items():
                sd[f"classifier.{k}"] = v
        return sd

    def embed_video(self, clip_uint8: np.ndarray) -> torch.Tensor:
        return torch.from_numpy(
            _ref_pooled(self.vit, _normalize(clip_uint8), self.T)
        )

    def embed_text(self, ids: np.ndarray, mask: np.ndarray) -> torch.Tensor:
        with torch.no_grad():
            return self.bert(
                torch.from_numpy(ids.astype(np.int64)),
                attention_mask=torch.from_numpy(mask.astype(np.int64)),
                return_dict=True, mode="text",
            ).last_hidden_state

    def fuse(self, text_embeds, text_mask, video_embeds) -> torch.Tensor:
        n = text_embeds.shape[0]
        if video_embeds.shape[0] == 1:
            video_embeds = video_embeds.expand(n, -1, -1)
        emb = torch.cat([text_embeds, video_embeds], dim=1)
        vmask = torch.ones(n, video_embeds.shape[1], dtype=torch.long)
        mask = torch.cat(
            [torch.from_numpy(text_mask.astype(np.int64)), vmask], dim=1
        )
        with torch.no_grad():
            return self.bert(
                encoder_embeds=emb, attention_mask=mask, return_dict=True,
                mode="fusion",
            ).last_hidden_state


def _model_cfg_dicts():
    base = {
        "attention_probs_dropout_prob": 0.0,
        "hidden_dropout_prob": 0.0,
        "hidden_size": DIM,
        "intermediate_size": INTER,
        "num_attention_heads": HEADS,
        "num_hidden_layers": LAYERS,
        "vocab_size": VOCAB,
        "max_position_embeddings": 512,
        "fusion_layer": FUSION,
        "pad_token_id": 0,
    }
    vis = {
        "patch_size": PATCH,
        "embed_dim": DIM,
        "depth": DEPTH,
        "num_heads": HEADS,
        "drop_rate": 0,
        "attn_drop_rate": 0,
        "drop_path_rate": 0.0,
    }
    return base, vis


def test_flagship_retrieval_scores_match_reference(tmp_path):
    import jax
    import jax.numpy as jnp

    from alpro_tpu.checkpoint.torch_convert import load_reference_checkpoint
    from alpro_tpu.models import build_retrieval_model
    from alpro_tpu.train.step import make_retrieval_inference_fn

    T, V, C, Lt = 8, 4, 8, 24
    ref = _TorchRefFull(T=T)
    ckpt = os.path.join(str(tmp_path), "flagship_ref.pt")
    torch.save(ref.state_dict(), ckpt)

    # the CLI's loader (`cli/common.py` → load_reference_checkpoint)
    params, prompter_sd = load_reference_checkpoint(ckpt)
    assert not prompter_sd

    base, vis = _model_cfg_dicts()
    model = build_retrieval_model(base, vis, img_size=IMG, num_frm=T)
    infer = jax.jit(make_retrieval_inference_fn(model))

    rng = np.random.RandomState(7)
    clips = rng.randint(0, 256, (V, T, IMG, IMG, 3), dtype=np.uint8)
    ids = rng.randint(0, VOCAB, (C, Lt)).astype(np.int32)
    mask = np.ones((C, Lt), np.int32)
    mask[1, 15:] = 0
    mask[5, 8:] = 0

    # reference forward_inference math (`alpro_models.py:874-914`)
    text_embeds = ref.embed_text(ids, mask)
    tfeat = torch.nn.functional.normalize(
        ref.text_proj(text_embeds[:, 0]), dim=-1
    )
    temp = float(np.clip(ref.temp, 0.001, 0.5))
    ref_sims = np.zeros((V, C), np.float32)
    ref_probs = np.zeros((V, C), np.float32)
    for vi in range(V):
        pooled = ref.embed_video(clips[vi : vi + 1])
        vfeat = torch.nn.functional.normalize(
            ref.vision_proj(pooled[:, 0]), dim=-1
        )
        ref_sims[vi] = (vfeat @ tfeat.T / temp)[0].detach().numpy()
        fusion = ref.fuse(text_embeds, mask, pooled)
        logits = ref.itm_head(fusion[:, 0])
        ref_probs[vi] = torch.softmax(logits, dim=-1)[:, 1].detach().numpy()

    # our inference path (1 video × C texts per dispatch, like the CLI)
    got_sims = np.zeros((V, C), np.float32)
    got_probs = np.zeros((V, C), np.float32)
    for vi in range(V):
        out = infer(params, {
            "visual_inputs": jnp.asarray(clips[vi : vi + 1]),
            "text_input_ids": jnp.asarray(ids),
            "text_input_mask": jnp.asarray(mask),
        })
        got_sims[vi] = np.asarray(out["itc_scores"][0])
        got_probs[vi] = np.asarray(
            jax.nn.softmax(out["logits"], axis=-1)[:, 1]
        )

    np.testing.assert_allclose(got_sims, ref_sims, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(got_probs, ref_probs, atol=5e-4, rtol=1e-3)
    # the retrieval protocol ranks by VTM prob (`run_video_retrieval.py:683`)
    for vi in range(V):
        assert list(np.argsort(-got_probs[vi])) == list(
            np.argsort(-ref_probs[vi])
        ), f"video {vi} ranking"


def test_flagship_qa_logits_match_reference(tmp_path):
    import jax
    import jax.numpy as jnp

    from alpro_tpu.checkpoint.torch_convert import load_reference_checkpoint
    from alpro_tpu.models import build_qa_model
    from alpro_tpu.train.step import make_qa_inference_fn

    T, B, Lt, NUM_LABELS = 16, 2, 24, 1500  # msrvtt_qa operating point
    ref = _TorchRefFull(T=T, num_labels=NUM_LABELS)
    ckpt = os.path.join(str(tmp_path), "flagship_ref_qa.pt")
    torch.save(ref.state_dict(qa=True), ckpt)

    params, _ = load_reference_checkpoint(
        ckpt, remove_text_encoder_prefix=True
    )
    base, vis = _model_cfg_dicts()
    model = build_qa_model(
        base, vis, num_labels=NUM_LABELS, img_size=IMG, num_frm=T
    )
    infer = jax.jit(make_qa_inference_fn(model))

    rng = np.random.RandomState(11)
    clips = rng.randint(0, 256, (B, T, IMG, IMG, 3), dtype=np.uint8)
    ids = rng.randint(0, VOCAB, (B, Lt)).astype(np.int32)
    mask = np.ones((B, Lt), np.int32)
    mask[1, 12:] = 0

    pooled = ref.embed_video(clips)
    text_embeds = ref.embed_text(ids, mask)
    fusion = ref.fuse(text_embeds, mask, pooled)
    with torch.no_grad():
        ref_logits = ref.classifier(fusion[:, 0]).numpy()

    got = np.asarray(infer(params, {
        "visual_inputs": jnp.asarray(clips),
        "text_input_ids": jnp.asarray(ids),
        "text_input_mask": jnp.asarray(mask),
    }))
    np.testing.assert_allclose(got, ref_logits, atol=1e-3, rtol=1e-3)
    np.testing.assert_array_equal(got.argmax(-1), ref_logits.argmax(-1))
