"""Synthetic end-to-end golden gates: torch-reference checkpoint → full CLI.

The staged-asset golden gates (test_golden_gates.py) need the official
checkpoints; these tests prove the SAME chain — real torch `.pt` on disk →
`--do_inference 1` CLI → decode → samplers → towers → protocol → metrics —
entirely in-sandbox, against scores computed independently with the
reference's own torch modules (`/root/reference/src/modeling/timesformer/
vit.py`, `xbert.py`) and the reference inference math
(`alpro_models.py:874-914` forward_inference, `run_video_qa.py:251-279`).

If any link drifts (checkpoint conversion, embed resize, tokenizer, decode,
fusion order, head math, protocol), scores diverge and the gate goes red.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from fixtures import write_qa_dataset, write_video_dataset
from test_reference_parity import (
    _build_ref_bert,
    _build_ref_vit,
    _ref_tokens_to_btnd,
    _reference_modules,
)

from alpro_tpu.core.config import Config
from alpro_tpu.data.tokenization import WordPieceTokenizer, make_test_vocab

DIM, DEPTH, FUSION, LAYERS, HEADS = 64, 3, 2, 4, 4
VOCAB = 200
IMG, PATCH, T = 32, 16, 2
PIXEL_MEAN = (0.48145466, 0.4578275, 0.40821073)
PIXEL_STD = (0.26862954, 0.26130258, 0.27577711)


def _write_model_configs(root):
    base = {
        "attention_probs_dropout_prob": 0.0,
        "hidden_dropout_prob": 0.0,
        "hidden_size": DIM,
        "intermediate_size": 2 * DIM,
        "num_attention_heads": HEADS,
        "num_hidden_layers": LAYERS,
        "vocab_size": VOCAB,
        "max_position_embeddings": 64,
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
    bm, vm = os.path.join(root, "base_model.json"), os.path.join(root, "vis_model.json")
    json.dump(base, open(bm, "w"))
    json.dump(vis, open(vm, "w"))
    vocab_path = os.path.join(root, "vocab.txt")
    with open(vocab_path, "w") as f:
        for tok in make_test_vocab():
            f.write(tok + "\n")
    return bm, vm, vocab_path


class _TorchRef:
    """Tiny reference-architecture ALPRO in torch: the reference's own
    VisionTransformer + xbert.BertModel plus the AlproBaseModel heads
    (`alpro_models.py:19-42`)."""

    def __init__(self, num_labels=0):
        ref_vit, ref_xbert = _reference_modules()
        self.vit = _build_ref_vit(
            ref_vit, img_size=IMG, num_frames=T, depth=DEPTH, dim=DIM, heads=HEADS
        )
        self.bert = _build_ref_bert(
            ref_xbert, layers=LAYERS, fusion=FUSION, dim=DIM, heads=HEADS,
            vocab=VOCAB, max_pos=64,
        )
        g = torch.Generator().manual_seed(23)

        def lin(i, o):
            m = torch.nn.Linear(i, o)
            with torch.no_grad():
                m.weight.normal_(0, 0.05, generator=g)
                m.bias.normal_(0, 0.02, generator=g)
            return m.eval()

        self.vision_proj = lin(DIM, 256)
        self.text_proj = lin(DIM, 256)
        self.itm_head = lin(DIM, 2)
        self.temp = 0.07
        self.classifier = (
            torch.nn.Sequential(lin(DIM, 2 * DIM), torch.nn.ReLU(), lin(2 * DIM, num_labels))
            if num_labels else None
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

    # --- reference inference math ---
    def embed_video(self, clip_uint8: np.ndarray) -> torch.Tensor:
        """uint8 (B,T,H,W,3) → pooled tokens (B, 1+N, D): normalize, the
        reference TimeSformer forward, temporal mean-pool (`vit.py:475-503`)."""
        x = clip_uint8.astype(np.float32) / 255.0
        x = (x - np.asarray(PIXEL_MEAN)) / np.asarray(PIXEL_STD)
        xt = torch.from_numpy(
            np.ascontiguousarray(x.transpose(0, 4, 1, 2, 3), dtype=np.float32)
        )
        with torch.no_grad():
            toks = self.vit.forward_features(xt, return_all_tokens=True).numpy()
        B = clip_uint8.shape[0]
        N = (IMG // PATCH) ** 2
        cls, grid = _ref_tokens_to_btnd(toks, B, T, N)
        pooled = np.concatenate([cls[:, None], grid.mean(axis=1)], axis=1)
        return torch.from_numpy(pooled)

    def embed_text(self, ids: np.ndarray, mask: np.ndarray) -> torch.Tensor:
        with torch.no_grad():
            return self.bert(
                torch.from_numpy(ids.astype(np.int64)),
                attention_mask=torch.from_numpy(mask.astype(np.int64)),
                return_dict=True, mode="text",
            ).last_hidden_state

    def fuse(self, text_embeds, text_mask, video_embeds) -> torch.Tensor:
        n = text_embeds.shape[0]
        video_rep = video_embeds.expand(n, -1, -1)
        emb = torch.cat([text_embeds, video_rep], dim=1)
        vmask = torch.ones(n, video_rep.shape[1], dtype=torch.long)
        mask = torch.cat([torch.from_numpy(text_mask.astype(np.int64)), vmask], dim=1)
        with torch.no_grad():
            return self.bert(
                encoder_embeds=emb, attention_mask=mask, return_dict=True,
                mode="fusion",
            ).last_hidden_state


def test_retrieval_cli_matches_torch_reference_scores(tmp_path):
    root = str(tmp_path)
    bm, vm, vocab = _write_model_configs(root)
    ann, vid_dir, rows = write_video_dataset(root, n_videos=6, t=4, h=48, w=48)

    ref = _TorchRef()
    ckpt = os.path.join(root, "tiny_ref.pt")
    torch.save(ref.state_dict(), ckpt)

    cfg = Config({
        "do_inference": 1,
        "inference_txt_db": ann,
        "inference_img_db": vid_dir,
        "inference_model_ckpt": ckpt,
        "tokenizer_dir": vocab,
        "model_config": bm,
        "visual_model_cfg": vm,
        "num_frm": T,
        "resize_size": 40,
        "crop_img_size": IMG,
        "max_txt_len": 12,
        "inference_batch_size": 8,
        "eval_video_batch_size": 4,
        "output_dir": os.path.join(root, "out"),
        "compute_dtype": "float32",
        "seed": 0,
    })
    from alpro_tpu.cli.run_video_retrieval import start_inference

    metrics = start_inference(cfg)
    with open(os.path.join(root, "out", "results.json")) as f:
        results = json.load(f)["results"]
    got = {(r["vid_id"], r["txt_id"]): (r["score"], r["sim"]) for r in results}

    # --- independent torch-side computation over the SAME decoded pixels ---
    from alpro_tpu.data.datasets import RetrievalEvalDataset, load_datalist

    ds = RetrievalEvalDataset(
        load_datalist(ann), vid_dir, num_frm=T, resize_size=40, crop_size=IMG
    )
    tok = WordPieceTokenizer(make_test_vocab())
    captions = [t["caption"] for t in ds.texts]
    enc = tok(captions, max_length=12)
    ids = np.asarray(enc["input_ids"], np.int32)
    mask = np.asarray(enc["attention_mask"], np.int32)

    text_embeds = ref.embed_text(ids, mask)
    tfeat = torch.nn.functional.normalize(ref.text_proj(text_embeds[:, 0]), dim=-1)
    temp = float(np.clip(ref.temp, 0.001, 0.5))

    n_checked = 0
    for vi in range(len(ds)):
        video = ds.get_video(vi)
        pooled = ref.embed_video(video["clip"][None])
        vfeat = torch.nn.functional.normalize(ref.vision_proj(pooled[:, 0]), dim=-1)
        sims = (vfeat @ tfeat.T / temp)[0].detach().numpy()
        fusion = ref.fuse(text_embeds, mask, pooled)
        logits = ref.itm_head(fusion[:, 0])
        probs = torch.softmax(logits, dim=-1)[:, 1].detach().numpy()
        for j, t in enumerate(ds.texts):
            score, sim = got[(video["vid_id"], t["txt_id"])]
            np.testing.assert_allclose(score, probs[j], atol=5e-4, rtol=1e-3)
            np.testing.assert_allclose(sim, sims[j], atol=5e-3, rtol=1e-3)
            n_checked += 1
        # ranking must agree rank-for-rank (the retrieval protocol sorts by
        # VTM prob, `run_video_retrieval.py:683`)
        cli_scores = np.asarray([got[(video["vid_id"], t["txt_id"])][0] for t in ds.texts])
        assert list(np.argsort(-cli_scores)) == list(np.argsort(-probs))
    assert n_checked == len(ds) * len(ds.texts)
    assert set(metrics) == {"text2video", "video2text"}


def test_qa_cli_matches_torch_reference_predictions(tmp_path):
    root = str(tmp_path)
    bm, vm, vocab = _write_model_configs(root)
    ann, vid_dir, rows, ans2label = write_qa_dataset(root, n=6, t=4, h=48, w=48)
    a2l_path = os.path.join(root, "ans2label.json")
    json.dump(ans2label, open(a2l_path, "w"))

    ref = _TorchRef(num_labels=len(ans2label))
    ckpt = os.path.join(root, "tiny_ref_qa.pt")
    torch.save(ref.state_dict(qa=True), ckpt)

    cfg = Config({
        "do_inference": 1,
        "inference_txt_db": ann,
        "inference_img_db": vid_dir,
        "inference_model_ckpt": ckpt,
        "tokenizer_dir": vocab,
        "model_config": bm,
        "visual_model_cfg": vm,
        "ans2label_path": a2l_path,
        "task": "msvd_qa",
        "num_labels": len(ans2label),
        "cls_hidden_scale": 2,
        "score_agg_func": "mean",
        "inference_n_clips": 1,
        "train_n_clips": 1,
        "num_frm": T,
        "resize_size": 40,
        "crop_img_size": IMG,
        "max_txt_len": 12,
        "inference_batch_size": 6,
        "val_batch_size": 6,
        "n_workers": 0,
        "output_dir": os.path.join(root, "out"),
        "compute_dtype": "float32",
        "seed": 0,
    })
    from alpro_tpu.cli.run_video_qa import start_inference

    metrics = start_inference(cfg)
    with open(os.path.join(root, "out", "qa_results.json")) as f:
        results = json.load(f)["results"]
    got = {r["question_id"]: r["answer"] for r in results}

    # --- torch side over the same items ---
    from alpro_tpu.data.datasets import QACollator, VideoQADataset, load_datalist

    ds = VideoQADataset(
        load_datalist(ann), vid_dir, ans2label, num_frm=T,
        frm_sampling_strategy="uniform", resize_size=40, crop_size=IMG,
        is_train=False, seed=0, return_label=True,
    )
    tok = WordPieceTokenizer(make_test_vocab())
    col = QACollator(tok, 12)
    batch = col([ds[i] for i in range(len(ds))])
    pooled = ref.embed_video(batch["visual_inputs"])
    text_embeds = ref.embed_text(batch["text_input_ids"], batch["text_input_mask"])
    # per-pair fusion (batch): video_embeds align 1:1 with questions here
    emb = torch.cat([text_embeds, pooled], dim=1)
    vmask = torch.ones(pooled.shape[0], pooled.shape[1], dtype=torch.long)
    mask = torch.cat(
        [torch.from_numpy(batch["text_input_mask"].astype(np.int64)), vmask], dim=1
    )
    with torch.no_grad():
        fusion = ref.bert(
            encoder_embeds=emb, attention_mask=mask, return_dict=True,
            mode="fusion",
        ).last_hidden_state
        logits = ref.classifier(fusion[:, 0]).numpy()
    preds = logits.argmax(-1)
    assert len(got) == len(ds)
    for qid, pred in zip(batch["question_ids"], preds):
        assert got[qid] == int(pred), f"qid {qid}: CLI {got[qid]} vs torch {pred}"
    assert "overall_acc" in metrics
