"""Video QA serving: one (clips, question) → ranked answers.

The deploy-time shape of `AlproForSequenceClassification` inference
(`/root/reference/src/tasks/run_video_qa.py:567-640`): encode the sampled
clip(s), run question + fusion + classifier, pool per-clip logits with the
reference's multi-clip ensembling (`:251-279`, mean/max/lse), and map label
ids back to answer strings.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from alpro_tpu.evals.qa import pool_clip_logits


class VideoQAPredictor:
    """>>> qa = VideoQAPredictor(model, params, tokenizer, ans2label)
    >>> qa.predict(clips_uint8, "what is the man doing", topk=3)
    [("cooking", 0.71), ("eating", 0.12), ("running", 0.05)]"""

    def __init__(self, model, params, tokenizer, ans2label: Dict[str, int],
                 max_txt_len: int = 25, pool: str = "mean",
                 weights: str = "bf16"):
        """`weights`: 'bf16' or 'int8' (per-channel int8 weight storage,
        dequantized inside jit — see serving/retrieval.py + ops/quant.py)."""
        import jax

        from alpro_tpu.train.step import make_qa_inference_fn

        self.model = model
        self.tokenizer = tokenizer
        self.max_txt_len = int(max_txt_len)
        self.pool = pool
        self.label2ans = {v: k for k, v in ans2label.items()}
        if weights not in ("bf16", "int8"):
            raise ValueError(f"weights must be 'bf16' or 'int8', got {weights!r}")
        infer = make_qa_inference_fn(model)
        if weights == "int8":
            from alpro_tpu.ops.quant import quantize_tree, wrap_dequant

            params = quantize_tree(params)
            infer = wrap_dequant(infer)
        self.params = params
        self._infer = jax.jit(infer)

    def predict(
        self,
        clips: np.ndarray,
        question: str,
        topk: int = 5,
        pool: Optional[str] = None,
    ) -> List[Tuple[str, float]]:
        """clips: (n_clips, T, H, W, 3) uint8 — multiple sampled clips of the
        same video are ensembled (reference multi-clip eval); returns the
        top-k (answer, probability) pairs."""
        import jax
        import jax.numpy as jnp

        assert clips.ndim == 5, "clips must be (n_clips, T, H, W, 3)"
        n = clips.shape[0]
        enc = self.tokenizer([question] * n, max_length=self.max_txt_len)
        logits = self._infer(self.params, {
            "visual_inputs": jnp.asarray(clips),
            "text_input_ids": jnp.asarray(
                np.asarray(enc["input_ids"], dtype=np.int32)
            ),
            "text_input_mask": jnp.asarray(
                np.asarray(enc["attention_mask"], dtype=np.int32)
            ),
        })
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
