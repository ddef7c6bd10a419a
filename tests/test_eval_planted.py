"""Planted-ranking correctness of the full (K=0) retrieval eval protocol.

CPU-scale twin of `benchmarks/full_eval_check.py` (which runs the same check
at flagship 1002×1000 ViT-B/16+BERT-base shapes on TPU): drives the REAL
`inference_retrieval` over a synthetic gallery sized to force uneven video
blocks and text-chunk padding, spot-checks the assembled score matrix
against a layout-independent re-derivation, and asserts the metric pipeline
recovers a planted per-text argmax ranking (R@1 = 100).

Protocol reference: `/root/reference/src/tasks/run_video_retrieval.py:559-738`.
"""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np

from alpro_tpu.core.config import Config
from alpro_tpu.models import BertConfig, TimeSformerConfig, build_retrieval_model

_SPEC = importlib.util.spec_from_file_location(
    "full_eval_check",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "benchmarks", "full_eval_check.py"),
)
full_eval_check = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(full_eval_check)


def test_planted_ranking_full_protocol():
    T, S, L = 2, 32, 10
    N_VIDEOS, N_TEXTS = 13, 21       # 4-video blocks → 1+3 pad; 8-text chunks → 5+3 pad
    EVAL_BSZ, VID_BSZ = 8, 4

    vis = TimeSformerConfig(
        img_size=S, patch_size=16, num_frames=T, embed_dim=24, depth=2,
        num_heads=4, drop_path_rate=0.0,
    )
    bert = BertConfig(
        vocab_size=100, hidden_size=24, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=48, fusion_layer=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    model = build_retrieval_model(bert, vis)
    params = model.init(
        {"params": jax.random.PRNGKey(2)},
        jnp.zeros((1, T, S, S, 3), jnp.float32),
        jnp.zeros((1, L), jnp.int32), jnp.ones((1, L), jnp.int32),
    )

    rng = np.random.RandomState(11)
    eval_ds = full_eval_check.PlantedEvalDS(rng, N_VIDEOS, N_TEXTS, T, S)
    tok = full_eval_check.HashTokenizer(bert.vocab_size)
    cfg = Config(dict(
        max_txt_len=L, inference_batch_size=EVAL_BSZ,
        eval_video_batch_size=VID_BSZ,
    ))

    svi = np.asarray([3, 12, 4, 0], np.int64)      # block corners, shuffled
    sti = np.asarray([8, 0, 20, 15, 7, 16, 2, 10], np.int64)  # chunk corners

    out = full_eval_check.planted_eval_check(
        model, params, eval_ds, tok, cfg, svi, sti, rng,
        prob_atol=1e-5, sim_atol=1e-4,
    )
    assert out["planted_t2v"]["r1"] == 100.0
    assert out["spot_pairs"] == VID_BSZ * EVAL_BSZ
