"""Mesh-sharded retrieval gallery: serve galleries bigger than one chip.

`RetrievalIndex` holds two device banks per gallery: the 256-d VTC features
(small) and the (1+N, D) fusion token bank — ~300 KB/video in bf16, i.e. the
HBM ceiling for a single chip is a few tens of thousands of videos. This
module shards BOTH banks row-wise over a `dp` mesh and replaces the global
argmax with the classic two-stage distributed top-k:

  1. every device scores the query against ITS shard of the feature bank and
     takes a local top-k (with its k candidate token rows gathered locally —
     never the whole bank);
  2. the (n_dev × k) candidates — a few MB — ride one `all_gather` over ICI;
  3. a global top-k over n_dev·k survivors feeds the VTM rerank (replicated,
     k is small).

The naive alternative (`jnp.take` straight from the sharded token bank)
risks GSPMD materializing a full bank all-gather; the shard_map form pins
the collective to exactly k rows per device. No reference counterpart (the
reference has no serving surface at all); extends
`serving/retrieval.py::RetrievalIndex` which documents the query protocol.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from alpro_tpu.serving.retrieval import RetrievalIndex


class ShardedRetrievalIndex(RetrievalIndex):
    """RetrievalIndex with gallery banks sharded over a mesh's `dp` axis.

    >>> mesh = make_mesh()                       # dp over all devices
    >>> idx = ShardedRetrievalIndex(model, params, tokenizer, mesh=mesh)
    >>> idx.add_videos(clips, ids)               # same API as RetrievalIndex
    >>> idx.query("a dog catches a frisbee")     # identical results, sharded
    """

    def __init__(self, model, params, tokenizer, mesh, axis: str = "dp",
                 **kw):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        super().__init__(model, params, tokenizer, **kw)
        self.mesh = mesh
        self.axis = axis
        self.n_dev = int(mesh.shape[axis])
        # params (possibly a QTensor tree) replicated over the mesh so the
        # towers compute identically on every device
        self.params = jax.device_put(
            self.params, NamedSharding(mesh, P())
        )
        self._n_valid = 0
        self._query_fns = {}  # k -> jitted query fn (shape-specialized)

    # -- sharded banks -------------------------------------------------------
    def _device_banks(self):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        if self._bank is None:
            assert self.ids, "empty index — add_videos first"
            feats = np.concatenate(self._feat_chunks, axis=0)
            tokens = np.concatenate(self._token_chunks, axis=0)
            self._n_valid = feats.shape[0]
            pad = (-feats.shape[0]) % self.n_dev
            if pad:  # zero rows; masked to -inf sim before any top-k
                feats = np.concatenate(
                    [feats, np.zeros((pad,) + feats.shape[1:], feats.dtype)]
                )
                tokens = np.concatenate(
                    [tokens, np.zeros((pad,) + tokens.shape[1:], tokens.dtype)]
                )
            self._bank = (
                jax.device_put(
                    jnp.asarray(feats),
                    NamedSharding(self.mesh, P(self.axis, None)),
                ),
                jax.device_put(
                    jnp.asarray(tokens),
                    NamedSharding(self.mesh, P(self.axis, None, None)),
                ),
            )
        return self._bank

    # -- one-dispatch sharded query ------------------------------------------
    def _query_fn(self, k: int):
        import jax
        import jax.numpy as jnp
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from alpro_tpu.train.step import (
            make_fusion_score_fn,
            make_text_encode_fn,
        )

        if k in self._query_fns:
            return self._query_fns[k]

        encode = make_text_encode_fn(self.model)
        fusion = make_fusion_score_fn(self.model)
        axis, mesh = self.axis, self.mesh

        def local_topk(feats_l, tokens_l, tfeat, n_valid):
            # returns the LOCAL kk survivors per query; the sharded
            # out_specs stitch them into (B, n_dev·kk, ...) global arrays —
            # the implicit gather moves exactly kk rows per (query, device),
            # never the bank
            nl = feats_l.shape[0]
            kk = min(k, nl)
            sims = tfeat @ feats_l.T  # (B, nl)
            gidx0 = jax.lax.axis_index(axis) * nl
            gi = gidx0 + jnp.arange(nl)
            sims = jnp.where(gi[None, :] < n_valid, sims, -jnp.inf)
            s, i = jax.lax.top_k(sims, kk)      # (B, kk)
            t = jnp.take(tokens_l, i, axis=0)   # (B, kk, 1+N, D) local rows
            g = gidx0 + i
            return s, t, g

        def qfn(params, feats, tokens, n_valid, ids, mask):
            if self.weights == "int8":  # dequantize once inside jit
                from alpro_tpu.ops.quant import dequantize_tree

                params = dequantize_tree(params)
            text_embeds, tfeat = encode(params, {
                "text_input_ids": ids, "text_input_mask": mask,
            })
            B = ids.shape[0]
            s_all, t_all, g_all = shard_map(
                local_topk, mesh=mesh,
                in_specs=(P(axis, None), P(axis, None, None), P(), P()),
                out_specs=(P(None, axis), P(None, axis, None, None),
                           P(None, axis)),
            )(feats, tokens, tfeat, n_valid)
            top_s, j = jax.lax.top_k(s_all, k)  # (B, k) over n_dev·kk
            cand = jnp.take_along_axis(
                t_all, j[:, :, None, None], axis=1
            ).reshape((B * k,) + t_all.shape[2:])
            gidx = jnp.take_along_axis(g_all, j, axis=1)
            te = jnp.repeat(text_embeds, k, axis=0)   # query-major (B·k, L, D)
            mk = jnp.repeat(mask, k, axis=0)
            logits = fusion(params, te, mk, cand)
            probs = jax.nn.softmax(logits, axis=-1)[:, 1].reshape(B, k)
            return probs, top_s, gidx

        self._query_fns[k] = jax.jit(qfn)
        return self._query_fns[k]

    def _query_many(self, texts: List[str], k: int):
        import jax.numpy as jnp

        feats, tokens = self._device_banks()
        enc = self.tokenizer(list(texts), max_length=self.max_txt_len)
        ids = jnp.asarray(np.asarray(enc["input_ids"], dtype=np.int32))
        mask = jnp.asarray(np.asarray(enc["attention_mask"], dtype=np.int32))
        probs, sims, gidx = self._query_fn(k)(
            self.params, feats, tokens, self._n_valid, ids, mask
        )
        out = []
        probs, sims, gidx = np.asarray(probs), np.asarray(sims), np.asarray(gidx)
        for b in range(len(texts)):
            order = np.argsort(-probs[b], kind="stable")
            out.append([
                (self.ids[int(gidx[b, j])], float(probs[b, j]),
                 float(sims[b, j]))
                for j in order
            ])
        return out

    def query(
        self, text: str, topk: Optional[int] = None
    ) -> List[Tuple[str, float, float]]:
        k = min(self.topk if topk is None else int(topk), len(self.ids))
        if k < 1:
            raise ValueError(f"topk must be >= 1 (got {topk!r})")
        return self._query_many([text], k)[0]

    def query_batch(
        self, texts: List[str], topk: Optional[int] = None
    ) -> List[List[Tuple[str, float, float]]]:
        """B queries in one device dispatch: the text tower, the sharded
        candidate generation, and the (B·k)-pair VTM rerank all batch —
        the serving-throughput shape (jit specializes per (B, k))."""
        k = min(self.topk if topk is None else int(topk), len(self.ids))
        if k < 1:
            raise ValueError(f"topk must be >= 1 (got {topk!r})")
        return self._query_many(texts, k)
