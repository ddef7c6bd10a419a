"""Text→video retrieval serving: an indexed video gallery + per-query path.

The reference has no serving surface — its eval loop recomputes every tower
for every (video, text-chunk) pair (`/root/reference/src/tasks/
run_video_retrieval.py:632-738`). This is the deploy-time shape of the same
model: videos are embedded ONCE into two banks (the 256-d VTC features for
candidate generation and the (1+N, D) token banks for reranking), and each
arriving text costs exactly

  1. tokenize + text tower (layers 0..fusion) + projection;
  2. VTC similarity against the feature bank → top-k candidates;
  3. VTM rerank: fusion half over [text, candidate video tokens] for the
     top-k; rank by P(match) (the reference's ranking score, `:683`),
     VTC sim carried alongside.

Measured on one v5e chip behind this sandbox's tunnel: ~29-32 ms p50 per
query against a 1000-video gallery (`benchmarks/retrieval_latency.py`,
which exercises this exact path shape).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np


class RetrievalIndex:
    """Video gallery index + query path for one retrieval model.

    >>> idx = RetrievalIndex(model, params, tokenizer)
    >>> idx.add_videos(clips_uint8, ids=["v1", "v2"])   # (B, T, H, W, 3)
    >>> idx.query("a dog catches a frisbee", topk=5)
    [("v2", 0.93, 0.41), ...]                            # (id, P(match), sim)
    """

    def __init__(self, model, params, tokenizer, max_txt_len: int = 40,
                 topk: int = 16, weights: str = "bf16"):
        """`weights`: 'bf16' (default serving policy) or 'int8' — per-channel
        int8 weight storage dequantized inside jit (`ops/quant.py`); halves
        at-rest and streamed weight HBM, numerics within the int8
        round-to-nearest envelope (tests/test_quant.py)."""
        import jax

        from alpro_tpu.train.step import (
            make_fusion_score_fn,
            make_text_encode_fn,
            make_video_embed_fn,
        )

        self.model = model
        self.tokenizer = tokenizer
        self.max_txt_len = int(max_txt_len)
        self.topk = int(topk)
        if weights not in ("bf16", "int8"):
            raise ValueError(f"weights must be 'bf16' or 'int8', got {weights!r}")
        self.weights = weights
        wrap = lambda f: f  # noqa: E731
        if weights == "int8":
            from alpro_tpu.ops.quant import quantize_tree, wrap_dequant

            params = quantize_tree(params)
            wrap = wrap_dequant
        self.params = params
        self._embed_video = jax.jit(wrap(make_video_embed_fn(model)))
        self._encode_text = jax.jit(wrap(make_text_encode_fn(model)))
        self._fusion_score = jax.jit(wrap(make_fusion_score_fn(model)))
        self.ids: List[str] = []
        self._feat_chunks: List[np.ndarray] = []   # (b, 256) fp32, normalized
        self._token_chunks: List[np.ndarray] = []  # (b, 1+N, D)
        self._bank = None  # (device feat bank, device token bank) cache
        self._batched_fns = {}  # k -> jitted one-dispatch batched query

    # -- gallery -----------------------------------------------------------
    def __len__(self) -> int:
        return len(self.ids)

    def add_videos(self, clips: np.ndarray, ids: Sequence[str]) -> None:
        """clips: (B, T, H, W, 3) uint8 (already sampled/cropped to the
        model's num_frames/img_size); ids: B video identifiers."""
        assert clips.ndim == 5 and clips.shape[0] == len(ids)
        embeds, feat = self._embed_video(self.params, clips)
        self._token_chunks.append(np.asarray(embeds))
        self._feat_chunks.append(np.asarray(feat, dtype=np.float32))
        self.ids.extend(str(i) for i in ids)
        self._bank = None  # device cache invalidated

    def _device_banks(self):
        import jax
        import jax.numpy as jnp

        if self._bank is None:
            assert self.ids, "empty index — add_videos first"
            feats = jnp.asarray(np.concatenate(self._feat_chunks, axis=0))
            tokens = jax.device_put(
                jnp.asarray(np.concatenate(self._token_chunks, axis=0))
            )
            self._bank = (feats, tokens)
        return self._bank

    # -- query -------------------------------------------------------------
    def _tokenize(self, text: str):
        import jax.numpy as jnp

        enc = self.tokenizer([text], max_length=self.max_txt_len)
        return (
            jnp.asarray(np.asarray(enc["input_ids"], dtype=np.int32)),
            jnp.asarray(np.asarray(enc["attention_mask"], dtype=np.int32)),
        )

    def query(
        self, text: str, topk: Optional[int] = None
    ) -> List[Tuple[str, float, float]]:
        """Returns [(vid_id, vtm_match_prob, vtc_sim)] ranked by the VTM
        P(match) over the VTC top-k candidates (reference ranking protocol,
        `run_video_retrieval.py:683`)."""
        import jax
        import jax.numpy as jnp

        k = min(self.topk if topk is None else int(topk), len(self.ids))
        if k < 1:
            raise ValueError(f"topk must be >= 1 (got {topk!r})")
        feats, tokens = self._device_banks()
        ids, mask = self._tokenize(text)

        text_embeds, tfeat = self._encode_text(self.params, {
            "text_input_ids": ids, "text_input_mask": mask,
        })
        sims = jnp.squeeze(tfeat @ feats.T, axis=0)
        top_sims, top_idx = jax.lax.top_k(sims, k)
        cand_tokens = jnp.take(tokens, top_idx, axis=0)
        te_rep = jnp.broadcast_to(text_embeds, (k,) + text_embeds.shape[1:])
        mask_rep = jnp.broadcast_to(mask, (k,) + mask.shape[1:])
        logits = self._fusion_score(self.params, te_rep, mask_rep, cand_tokens)
        probs = jax.nn.softmax(logits, axis=-1)[:, 1]

        probs = np.asarray(probs)
        top_idx = np.asarray(top_idx)
        top_sims = np.asarray(top_sims)
        order = np.argsort(-probs, kind="stable")
        return [
            (self.ids[int(top_idx[j])], float(probs[j]), float(top_sims[j]))
            for j in order
        ]

    def _batched_query_fn(self, k: int):
        """One-dispatch batched query (text tower + VTC top-k + VTM rerank
        all inside one jit): the serving-THROUGHPUT shape. jit specializes
        per (B, k); k is cached here, B by jax. Mirrors
        `ShardedRetrievalIndex._query_fn` on a single device."""
        import jax
        import jax.numpy as jnp

        from alpro_tpu.train.step import (
            make_fusion_score_fn,
            make_text_encode_fn,
        )

        if k in self._batched_fns:
            return self._batched_fns[k]

        encode = make_text_encode_fn(self.model)
        fusion = make_fusion_score_fn(self.model)

        def qfn(params, feats, tokens, ids, mask):
            if self.weights == "int8":  # dequantize once inside jit
                from alpro_tpu.ops.quant import dequantize_tree

                params = dequantize_tree(params)
            text_embeds, tfeat = encode(params, {
                "text_input_ids": ids, "text_input_mask": mask,
            })
            B = ids.shape[0]
            sims = tfeat @ feats.T                    # (B, V)
            top_sims, top_idx = jax.lax.top_k(sims, k)
            cand = jnp.take(tokens, top_idx.reshape(-1), axis=0)
            te = jnp.repeat(text_embeds, k, axis=0)   # query-major (B·k, L, D)
            mk = jnp.repeat(mask, k, axis=0)
            logits = fusion(params, te, mk, cand)
            probs = jax.nn.softmax(logits, axis=-1)[:, 1].reshape(B, k)
            return probs, top_sims, top_idx

        self._batched_fns[k] = jax.jit(qfn)
        return self._batched_fns[k]

    def query_batch(
        self, texts: Sequence[str], topk: Optional[int] = None
    ) -> List[List[Tuple[str, float, float]]]:
        """B queries in ONE device dispatch — batches the text tower, the
        VTC candidate generation and the (B·k)-pair VTM rerank, so the
        per-dispatch host↔device floor and the B=1 weight-streaming cost
        amortize across the batch (measured: benchmarks/retrieval_latency.py
        batched mode). Per-text results identical to `query` (same ranking
        protocol; numerics within one fused-reduction reorder)."""
        import jax.numpy as jnp

        k = min(self.topk if topk is None else int(topk), len(self.ids))
        if k < 1:
            raise ValueError(f"topk must be >= 1 (got {topk!r})")
        if not texts:
            return []
        feats, tokens = self._device_banks()
        enc = self.tokenizer(list(texts), max_length=self.max_txt_len)
        ids = jnp.asarray(np.asarray(enc["input_ids"], dtype=np.int32))
        mask = jnp.asarray(np.asarray(enc["attention_mask"], dtype=np.int32))
        probs, sims, idx = self._batched_query_fn(k)(
            self.params, feats, tokens, ids, mask
        )
        probs, sims, idx = np.asarray(probs), np.asarray(sims), np.asarray(idx)
        out = []
        for b in range(len(texts)):
            order = np.argsort(-probs[b], kind="stable")
            out.append([
                (self.ids[int(idx[b, j])], float(probs[b, j]),
                 float(sims[b, j]))
                for j in order
            ])
        return out

    # -- persistence -------------------------------------------------------
    @staticmethod
    def _paths(path: str) -> Tuple[str, str]:
        base = path[:-4] if path.endswith(".npz") else path
        return base + ".npz", base + ".ids.json"

    def save(self, path: str) -> None:
        """Writes the banks + ids (not the model params) to ``path``."""
        if not self.ids:
            raise ValueError("cannot save an empty index: add videos first")
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        npz, idsp = self._paths(path)
        np.savez(
            npz,
            feats=np.concatenate(self._feat_chunks, axis=0),
            tokens=np.concatenate(self._token_chunks, axis=0),
        )
        with open(idsp, "w") as f:
            json.dump(self.ids, f)

    def load(self, path: str) -> None:
        npz, idsp = self._paths(path)
        data = np.load(npz)
        self._feat_chunks = [data["feats"]]
        self._token_chunks = [data["tokens"]]
        with open(idsp) as f:
            self.ids = list(json.load(f))
        self._bank = None
