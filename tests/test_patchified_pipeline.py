"""Pre-patchified input pipeline: collator → model gives the same training
signal as the frame pipeline, and QA training actually learns."""

import numpy as np
import jax
import jax.numpy as jnp

from alpro_tpu.data.datasets import RetrievalCollator, RetrievalDataset, load_jsonl
from alpro_tpu.data.loader import BatchLoader
from alpro_tpu.models import BertConfig, TimeSformerConfig, build_qa_model, build_retrieval_model
from alpro_tpu.train import TrainState, build_optimizer, get_lr_schedule
from alpro_tpu.train.step import make_qa_train_step
from fixtures import make_tokenizer, write_video_dataset


def test_patchified_collator_matches_frame_collator(tmp_path):
    ann, vid_dir, rows = write_video_dataset(str(tmp_path), n_videos=4)
    tok = make_tokenizer()
    kw = dict(num_frm=2, resize_size=48, crop_size=32)

    ds_a = RetrievalDataset(load_jsonl(ann), vid_dir, seed=7, **kw)
    ds_b = RetrievalDataset(load_jsonl(ann), vid_dir, seed=7, **kw)
    col_frames = RetrievalCollator(tok, 10, patchify=False)
    col_patches = RetrievalCollator(tok, 10, patchify=True, patch_size=16)
    batch_a = col_frames([ds_a[i] for i in range(4)])
    batch_b = col_patches([ds_b[i] for i in range(4)])

    assert batch_a["visual_inputs"].shape == (4, 2, 32, 32, 3)
    assert batch_b["visual_inputs"].shape == (4, 2, 4, 768)

    vis = TimeSformerConfig(
        img_size=32, patch_size=16, num_frames=2, embed_dim=16, depth=1,
        num_heads=2, drop_path_rate=0.0,
    )
    bert = BertConfig(
        vocab_size=200, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32, fusion_layer=1,
    )
    model = build_retrieval_model(bert, vis)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(batch_a["visual_inputs"][:1]),
        jnp.asarray(batch_a["text_input_ids"][:1]),
        jnp.asarray(batch_a["text_input_mask"][:1]),
    )
    emb_frames = model.apply(
        params, jnp.asarray(batch_a["visual_inputs"]), method=model.embed_video
    )
    emb_patches = model.apply(
        params, jnp.asarray(batch_b["visual_inputs"]), method=model.embed_video
    )
    np.testing.assert_allclose(
        np.asarray(emb_frames), np.asarray(emb_patches), atol=1e-5
    )


def test_qa_training_learns(tmp_path):
    """Overfit 4 QA examples: accuracy must reach 1.0 (the loop actually
    learns, not just runs)."""
    rng = np.random.RandomState(0)
    B = 4
    batch = {
        "visual_inputs": (rng.rand(B, 2, 32, 32, 3) * 255).astype(np.uint8),
        "text_input_ids": rng.randint(0, 50, (B, 6)).astype(np.int32),
        "text_input_mask": np.ones((B, 6), np.int32),
        "labels": np.arange(B, dtype=np.int32),
    }
    vis = TimeSformerConfig(
        img_size=32, patch_size=16, num_frames=2, embed_dim=16, depth=1,
        num_heads=2, drop_path_rate=0.0,
    )
    bert = BertConfig(
        vocab_size=50, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32, fusion_layer=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    model = build_qa_model(bert, vis, num_labels=B, num_frm=2)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(batch["visual_inputs"][:1]),
        jnp.asarray(batch["text_input_ids"][:1]),
        jnp.asarray(batch["text_input_mask"][:1]),
    )
    tx = build_optimizer(get_lr_schedule("constant", 5e-3, 100))
    step = jax.jit(make_qa_train_step(model, tx))
    state = TrainState.create(params, tx)
    accs = []
    for i in range(30):
        state, m = step(state, batch, jax.random.PRNGKey(0))
        accs.append(float(m["acc"]))
    assert accs[-1] == 1.0, accs[-5:]
