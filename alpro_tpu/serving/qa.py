"""Video QA serving: one (clips, question) → ranked answers.

The deploy-time shape of `AlproForSequenceClassification` inference
(`/root/reference/src/tasks/run_video_qa.py:567-640`): encode the sampled
clip(s), run question + fusion + classifier, pool per-clip logits with the
reference's multi-clip ensembling (`:251-279`, mean/max/lse), and map label
ids back to answer strings.

Beyond the reference: `encode_video` caches the video-tower output so many
questions about one video pay only text+fusion+head per question (the
reference re-runs the full tower per (question, video) pair). MSRVTT-QA
averages ~2.4 questions per clip and an interactive session asks many more,
so the tower — the large majority of per-question device time — amortizes
away.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple, Union

import numpy as np


class VideoQAPredictor:
    """>>> qa = VideoQAPredictor(model, params, tokenizer, ans2label)
    >>> qa.predict(clips_uint8, "what is the man doing", topk=3)
    [("cooking", 0.71), ("eating", 0.12), ("running", 0.05)]

    Many questions on one video — encode once, ask cheaply:
    >>> feats = qa.encode_video(clips_uint8)
    >>> qa.predict(feats, "who is on the stage")
    """

    def __init__(self, model, params, tokenizer, ans2label: Dict[str, int],
                 max_txt_len: int = 25, pool: str = "mean",
                 weights: str = "bf16"):
        """`weights`: 'bf16' or 'int8' (per-channel int8 weight storage,
        dequantized inside jit — see serving/retrieval.py + ops/quant.py)."""
        import jax

        from alpro_tpu.train.step import (
            make_qa_inference_fn,
            make_qa_video_encode_fn,
        )

        self.model = model
        self.tokenizer = tokenizer
        self.max_txt_len = int(max_txt_len)
        self.pool = pool
        self.label2ans = {v: k for k, v in ans2label.items()}
        if weights not in ("bf16", "int8"):
            raise ValueError(f"weights must be 'bf16' or 'int8', got {weights!r}")
        infer = make_qa_inference_fn(model)
        encode = make_qa_video_encode_fn(model)
        if weights == "int8":
            from alpro_tpu.ops.quant import quantize_tree, wrap_dequant

            params = quantize_tree(params)
            infer = wrap_dequant(infer)
            encode = wrap_dequant(encode)
        self.params = params
        self._infer = jax.jit(infer)
        self._encode = jax.jit(encode)

    def encode_video(self, clips: np.ndarray):
        """(n_clips, T, H, W, 3) uint8 → device-resident (n_clips, 1+N, D)
        video tokens. Pass the result to `predict` in place of `clips` to
        skip the video tower on every subsequent question."""
        import jax.numpy as jnp

        assert clips.ndim == 5, "clips must be (n_clips, T, H, W, 3)"
        return self._encode(self.params, jnp.asarray(clips))

    def predict(
        self,
        clips: Union[np.ndarray, "object"],
        question: str,
        topk: int = 5,
        pool: Optional[str] = None,
    ) -> List[Tuple[str, float]]:
        """clips: (n_clips, T, H, W, 3) uint8 — multiple sampled clips of the
        same video are ensembled (reference multi-clip eval) — or the
        (n_clips, 1+N, D) output of `encode_video` (cached fast path);
        returns the top-k (answer, probability) pairs."""
        import jax
        import jax.numpy as jnp

        from alpro_tpu.evals.qa import pool_clip_logits

        assert clips.ndim in (3, 5), (
            "clips must be (n_clips, T, H, W, 3) pixels or the "
            "(n_clips, 1+N, D) output of encode_video"
        )
        n = clips.shape[0]
        enc = self.tokenizer([question] * n, max_length=self.max_txt_len)
        batch = {
            "text_input_ids": jnp.asarray(
                np.asarray(enc["input_ids"], dtype=np.int32)
            ),
            "text_input_mask": jnp.asarray(
                np.asarray(enc["attention_mask"], dtype=np.int32)
            ),
        }
        if clips.ndim == 3:
            batch["video_embeds"] = clips
        else:
            batch["visual_inputs"] = jnp.asarray(clips)
        logits = self._infer(self.params, batch)
        # (n_clips, L) → (n_clips, B=1, L) for the reference pooling
        pooled = pool_clip_logits(
            np.asarray(logits)[:, None, :], method=pool or self.pool
        )[0]
        probs = np.asarray(jax.nn.softmax(jnp.asarray(pooled)))
        order = np.argsort(-probs, kind="stable")[:topk]
        return [
            (self.label2ans.get(int(i), f"<label {int(i)}>"), float(probs[i]))
            for i in order
        ]

    def predict_batch(
        self,
        clips: Union[np.ndarray, "object"],
        questions: List[str],
        topk: int = 5,
        pool: Optional[str] = None,
    ) -> List[List[Tuple[str, float]]]:
        """B questions about ONE video in a single device dispatch.

        The video tower runs at most once (pixels are encoded via
        `encode_video` first; pass its output directly to skip it entirely),
        then all (question × clip) pairs batch through text + fusion + head
        together — the interactive-session throughput shape (MSRVTT-QA
        averages ~2.4 questions/clip; a session asks many more). Per-question
        results identical to `predict` (same pooling/ranking; jit
        specializes per (B, n_clips))."""
        import jax
        import jax.numpy as jnp

        from alpro_tpu.evals.qa import pool_clip_logits

        if not questions:
            return []
        if clips.ndim == 5:
            clips = self.encode_video(clips)
        assert clips.ndim == 3, (
            "clips must be (n_clips, T, H, W, 3) pixels or the "
            "(n_clips, 1+N, D) output of encode_video"
        )
        n = clips.shape[0]
        B = len(questions)
        # question-major pair layout: row b·n + j = (question b, clip j)
        enc = self.tokenizer(
            [q for q in questions for _ in range(n)],
            max_length=self.max_txt_len,
        )
        batch = {
            "text_input_ids": jnp.asarray(
                np.asarray(enc["input_ids"], dtype=np.int32)
            ),
            "text_input_mask": jnp.asarray(
                np.asarray(enc["attention_mask"], dtype=np.int32)
            ),
            "video_embeds": jnp.tile(clips, (B, 1, 1)),
        }
        logits = np.asarray(self._infer(self.params, batch))  # (B·n, L)
        # (B·n, L) → (n_clips, B, L) for the reference multi-clip pooling
        pooled = pool_clip_logits(
            logits.reshape(B, n, -1).transpose(1, 0, 2),
            method=pool or self.pool,
        )                                                      # (B, L)
        probs = np.asarray(jax.nn.softmax(jnp.asarray(pooled), axis=-1))
        out = []
        for b in range(B):
            order = np.argsort(-probs[b], kind="stable")[:topk]
            out.append([
                (self.label2ans.get(int(i), f"<label {int(i)}>"),
                 float(probs[b, i]))
                for i in order
            ])
        return out
