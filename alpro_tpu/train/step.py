"""jit/pjit-compiled train + inference step builders for the four tasks.

Replaces the reference hot loops (`/root/reference/src/tasks/run_video_retrieval.py:402-500`,
`src/tasks/run_video_qa.py`, `src/pretrain/run_pretrain_sparse.py:532-666`,
`src/pretrain/run_pretrain_contrastive_only.py`) with pure step functions:

  step(state, batch, rng) -> (state, metrics)

Distribution model: `shard_step` jits a step over a Mesh with parameters
replicated and the batch sharded on `dp`. The VTC similarity matrix and the
hard-negative gathers are written as global math — GSPMD lowers them to
all_gathers over ICI; gradients allreduce via the psum GSPMD inserts. No
collective appears in this file (SURVEY.md §2.9 mapping).

Every loss keeps the reference's composition: retrieval = VTC + VTM
(`alpro_models.py:733-798`); QA = CE (`alpro_models.py:647-688`); pretrain =
VTC + VTM + MLM + MPM under use_* flags (`run_pretrain_sparse.py:534-557`);
prompter = VTC only (`run_pretrain_contrastive_only.py:225-255`).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from alpro_tpu.models.alpro import AlproModel
from alpro_tpu.objectives.mlm import mlm_loss
from alpro_tpu.objectives.pem import masked_patch_mean, mpm_loss, pseudo_labels_from_feats
from alpro_tpu.objectives.vtc import vtc_loss
from alpro_tpu.objectives.vtm import sample_hard_negatives, vtm_loss_from_logits
from alpro_tpu.train.optimizer import project_temp
from alpro_tpu.train.state import TrainState


def _train_rngs(rng: jax.Array) -> Dict[str, jax.Array]:
    d, p = jax.random.split(rng)
    return {"dropout": d, "droppath": p}


def _prep_pixels(x: jnp.ndarray) -> jnp.ndarray:
    """Pass-through: the TimeSformer normalizes uint8 batches internally
    (fused Pallas patchify on TPU, XLA elsewhere) with the stats from its
    config — the reference's GPU ImageNorm role
    (`src/datasets/data_utils.py:437-457`)."""
    return x


def _alignment_forward(
    model: AlproModel, variables, batch, rng, train: bool
) -> Dict[str, jnp.ndarray]:
    """Shared VTC+VTM forward used by retrieval and pretrain."""
    rngs = _train_rngs(jax.random.fold_in(rng, 0)) if train else None
    det = not train
    video_embeds = model.apply(
        variables, _prep_pixels(batch["visual_inputs"]), det, method=model.embed_video,
        rngs=rngs,
    )
    rngs2 = _train_rngs(jax.random.fold_in(rng, 1)) if train else None
    text_embeds = model.apply(
        variables, batch["text_input_ids"], batch["text_input_mask"], det,
        method=model.embed_text, rngs=rngs2,
    )
    vfeat = model.apply(variables, video_embeds, method=model.video_feat)
    tfeat = model.apply(variables, text_embeds, method=model.text_feat)
    temp = model.apply(variables, method=model.temperature)
    return dict(
        video_embeds=video_embeds, text_embeds=text_embeds,
        video_feat=vfeat, text_feat=tfeat, temp=temp,
    )


def _vtm_forward(
    model: AlproModel,
    variables,
    batch,
    fwd,
    sim_v2t,
    sim_t2v,
    rng,
    train: bool,
    num_local_blocks: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hard-negative VTM. Returns (vtm_loss, fusion_pos_hidden)."""
    text_embeds, video_embeds = fwd["text_embeds"], fwd["video_embeds"]
    text_mask = batch["text_input_mask"]

    neg_text_idx, neg_video_idx = sample_hard_negatives(
        jax.random.fold_in(rng, 2),
        jax.lax.stop_gradient(sim_v2t),
        jax.lax.stop_gradient(sim_t2v),
        num_local_blocks=num_local_blocks,
    )

    # one 3B-batch fusion call covering positives and both negative kinds —
    # rows [0,B): (text_i, video_i); [B,2B): (text_i, video[neg_video_idx_i]);
    # [2B,3B): (text[neg_text_idx_i], video_i). The reference runs pos and neg
    # as two separate fusion forwards (`alpro_models.py:269-344`); batching
    # them keeps the MXU on one large matmul shape and drops a whole set of
    # per-layer dispatches. Deterministic numerics are identical (attention
    # and MLP are per-sample along batch).
    B = text_embeds.shape[0]
    text_all = jnp.concatenate(
        [text_embeds, text_embeds, jnp.take(text_embeds, neg_text_idx, axis=0)],
        axis=0,
    )
    mask_all = jnp.concatenate(
        [text_mask, text_mask, jnp.take(text_mask, neg_text_idx, axis=0)],
        axis=0,
    )
    video_all = jnp.concatenate(
        [video_embeds, jnp.take(video_embeds, neg_video_idx, axis=0), video_embeds],
        axis=0,
    )
    rngs = _train_rngs(jax.random.fold_in(rng, 3)) if train else None
    fusion_all = model.apply(
        variables, text_all, mask_all, video_all, None, not train,
        method=model.fuse, rngs=rngs,
    )
    fusion_pos = fusion_all[:B]
    logits = model.apply(
        variables, fusion_all[:, 0, :], method=model.itm_logits
    )
    loss, _, _ = vtm_loss_from_logits(logits[:B], logits[B:])
    return loss, fusion_pos


def _apply_updates(state: TrainState, grads, tx) -> TrainState:
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_params = dict(new_params)
    new_params["params"] = project_temp(dict(new_params["params"]))
    return TrainState(
        step=state.step + 1, params=new_params, opt_state=new_opt_state
    )


# --------------------------------------------------------------------------
# retrieval
# --------------------------------------------------------------------------
def make_retrieval_train_step(
    model: AlproModel,
    tx: optax.GradientTransformation,
    num_local_blocks: int = 1,
) -> Callable:
    def loss_fn(params, batch, rng):
        fwd = _alignment_forward(model, params, batch, rng, train=True)
        vtc, sim_v2t, sim_t2v = vtc_loss(
            fwd["video_feat"], fwd["text_feat"], fwd["temp"]
        )
        vtm, _ = _vtm_forward(
            model, params, batch, fwd, sim_v2t, sim_t2v, rng,
            train=True, num_local_blocks=num_local_blocks,
        )
        loss = vtc + vtm
        return loss, {"loss": loss, "vtc_loss": vtc, "vtm_loss": vtm}

    def step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        return _apply_updates(state, grads, tx), metrics

    return step


def make_text_encode_fn(model: AlproModel) -> Callable:
    """Text-tower-only forward: (ids, mask) → (text_embeds, text_feat).

    The text tower is video-independent, so retrieval eval encodes each text
    exactly once and reuses the embeddings for every video — the reference
    recomputes the text half per (video, text-chunk) pair
    (`run_video_retrieval.py:644-670`), i.e. ~N_videos× redundant BERT work.
    """

    def encode(params, batch):
        text_embeds = model.apply(
            params, batch["text_input_ids"], batch["text_input_mask"],
            method=model.embed_text,
        )
        tfeat = model.apply(params, text_embeds, method=model.text_feat)
        return text_embeds, tfeat

    return encode


def make_retrieval_pair_fn(model: AlproModel) -> Callable:
    """Score one video against a chunk of pre-encoded texts: returns
    (itc_scores (N,), itm_logits (N, 2))."""

    def score(params, pixels, text_embeds, text_mask, text_feat):
        video_embeds = model.apply(
            params, _prep_pixels(pixels), method=model.embed_video
        )
        vfeat = model.apply(params, video_embeds, method=model.video_feat)
        temp = model.apply(params, method=model.temperature)
        itc = (vfeat @ text_feat.T / temp)[0]
        n_text = text_embeds.shape[0]
        video_rep = jnp.broadcast_to(
            video_embeds, (n_text,) + video_embeds.shape[1:]
        )
        fusion = model.apply(
            params, text_embeds, text_mask, video_rep, method=model.fuse
        )
        logits = model.apply(params, fusion[:, 0, :], method=model.itm_logits)
        return itc, logits

    return score


def make_video_embed_fn(model: AlproModel) -> Callable:
    """Video-tower-only forward (pixels → (video_embeds, video_feat))."""

    def embed(params, pixels):
        video_embeds = model.apply(
            params, _prep_pixels(pixels), method=model.embed_video
        )
        vfeat = model.apply(params, video_embeds, method=model.video_feat)
        return video_embeds, vfeat

    return embed


def make_fusion_score_fn(model: AlproModel) -> Callable:
    """VTM logits for pre-encoded (text, video) pairs."""

    def score(params, text_embeds, text_mask, video_embeds):
        n_text = text_embeds.shape[0]
        if video_embeds.shape[0] == 1 and n_text > 1:
            video_embeds = jnp.broadcast_to(
                video_embeds, (n_text,) + video_embeds.shape[1:]
            )
        fusion = model.apply(
            params, text_embeds, text_mask, video_embeds, method=model.fuse
        )
        return model.apply(params, fusion[:, 0, :], method=model.itm_logits)

    return score


def make_fusion_score_pairs_fn(model: AlproModel) -> Callable:
    """VTM logits for the full V×C cross product of pre-encoded videos and
    texts in ONE dispatch: (V, Nv, D) videos × (C, L, D) texts → (V, C, 2).

    The reference's eval loops fusion per (video, text-chunk) pair
    (`run_video_retrieval.py:644-670`); batching the pairs into one fused
    forward keeps the MXU fed and cuts the per-dispatch host round-trips
    V-fold (measured: benchmarks/full_eval.py)."""

    def score(params, text_embeds, text_mask, video_embeds):
        V = video_embeds.shape[0]
        C = text_embeds.shape[0]
        te = jnp.tile(text_embeds, (V, 1, 1))          # video-major pairs
        tm = jnp.tile(text_mask, (V, 1))
        ve = jnp.repeat(video_embeds, C, axis=0)
        fusion = model.apply(params, te, tm, ve, method=model.fuse)
        logits = model.apply(params, fusion[:, 0, :], method=model.itm_logits)
        return logits.reshape(V, C, 2)

    return score


def make_fusion_rerank_bank_fn(model: AlproModel) -> Callable:
    """VTM logits for an arbitrary pair list against a device-resident video
    token bank: (C, L, D) text-chunk embeds + (V, 1+N, D) bank + per-pair
    int32 index vectors tidx/vidx (P,) → (P, 2) logits. Both gathers run on
    device, so each dispatch ships only the two tiny index vectors — the
    top-k eval rerank (`cli/run_video_retrieval.py --eval_rerank_topk`)
    scores each text's VTC candidates instead of the full V×C cross
    product (the serving `RetrievalIndex.query` candidate protocol applied
    to the batch eval gate)."""

    def score(params, text_embeds, text_mask, bank, tidx, vidx):
        te = jnp.take(text_embeds, tidx, axis=0)
        tm = jnp.take(text_mask, tidx, axis=0)
        ve = jnp.take(bank, vidx, axis=0)
        fusion = model.apply(params, te, tm, ve, method=model.fuse)
        return model.apply(params, fusion[:, 0, :], method=model.itm_logits)

    return score


def make_retrieval_inference_fn(model: AlproModel) -> Callable:
    """1 video vs N texts (`alpro_models.py:874-914`): returns VTC sims
    (1, N) and per-pair VTM logits (N, 2)."""

    def infer(params, batch):
        video_embeds = model.apply(
            params, _prep_pixels(batch["visual_inputs"]), method=model.embed_video
        )
        text_embeds = model.apply(
            params, batch["text_input_ids"], batch["text_input_mask"],
            method=model.embed_text,
        )
        vfeat = model.apply(params, video_embeds, method=model.video_feat)
        tfeat = model.apply(params, text_embeds, method=model.text_feat)
        temp = model.apply(params, method=model.temperature)
        itc_scores = vfeat @ tfeat.T / temp

        n_text = text_embeds.shape[0]
        video_rep = jnp.broadcast_to(
            video_embeds, (n_text,) + video_embeds.shape[1:]
        )
        fusion = model.apply(
            params, text_embeds, batch["text_input_mask"], video_rep,
            method=model.fuse,
        )
        logits = model.apply(params, fusion[:, 0, :], method=model.itm_logits)
        return {"logits": logits, "itc_scores": itc_scores}

    return infer


# --------------------------------------------------------------------------
# QA classification
# --------------------------------------------------------------------------
def make_qa_train_step(model: AlproModel, tx: optax.GradientTransformation,
                       n_options: int = 1, n_clips: int = 1,
                       num_frm: Optional[int] = None) -> Callable:
    """`n_clips > 1` reproduces the reference's train-time multi-clip
    semantics (`/root/reference/src/tasks/run_video_qa.py:461-489`): the
    (B, n_clips*num_frm) frame stack splits into n_clips per-clip forwards,
    every clip's loss is computed, but — reference quirk, preserved — ONLY
    the LAST clip's loss reaches backward (`loss = outputs['loss']` is
    overwritten per iteration before the single `scaled_loss.backward()`).
    Earlier clips contribute metrics only (stop_gradient), matching the
    reference where their autograd graphs are built then dropped.
    `n_clips == 1` keeps the original single-clip graph bit-identical."""

    def _clip_loss(params, batch, rng):
        logits = _qa_logits(model, params, batch, rng, train=True,
                            n_options=n_options)
        labels = batch["labels"]
        logp = jax.nn.log_softmax(logits, axis=-1)
        loss = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return loss, acc

    def loss_fn(params, batch, rng):
        if n_clips <= 1:
            loss, acc = _clip_loss(params, batch, rng)
            return loss, {"loss": loss, "acc": acc}
        assert num_frm is not None, "n_clips > 1 needs num_frm"
        vis = batch["visual_inputs"]
        B = vis.shape[0]
        vis = vis.reshape(B, n_clips, num_frm, *vis.shape[2:])
        losses, accs = [], []
        for c in range(n_clips):  # static unroll; n_clips is 2-3
            sub = dict(batch)
            sub["visual_inputs"] = vis[:, c]
            p = params if c == n_clips - 1 else jax.lax.stop_gradient(params)
            loss_c, acc_c = _clip_loss(p, sub, jax.random.fold_in(rng, c))
            losses.append(loss_c)
            accs.append(acc_c)
        loss = losses[-1]  # reference backprops the final clip only
        return loss, {
            "loss": loss,
            "acc": accs[-1],
            "loss_all_clips": jnp.mean(jnp.stack(losses)),
            "acc_all_clips": jnp.mean(jnp.stack(accs)),
        }

    def step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        return _apply_updates(state, grads, tx), metrics

    return step


def _qa_logits(model, params, batch, rng, train: bool, n_options: int = 1):
    """`n_options > 1` = multi-choice (TGIF action/transition): text rows are
    (B·n_options) Q+option sequences against B videos; the video tower runs
    ONCE per video and its embeddings repeat per option before fusion, then
    the per-option scalar logits regroup to (B, n_options). The reference's
    own multi-choice path was inoperative (`dataset_video_qa.py:165-200`
    builds the rows but `n_examples_list` is never consumed by
    `AlproForSequenceClassification`); this is the working TGIF-QA protocol
    (ClipBERT lineage) implemented jit-natively."""
    det = not train
    rngs = _train_rngs(jax.random.fold_in(rng, 0)) if train else None
    if "video_embeds" in batch:
        # serving fast path: the video tower ran once per video (e.g.
        # `serving.qa.VideoQAPredictor.encode_video`) and its (n, 1+N, D)
        # output is reused across every question about that video — the
        # reference re-runs the tower per (question, video) pair
        # (`run_video_qa.py:567-640`)
        video_embeds = batch["video_embeds"]
    else:
        video_embeds = model.apply(
            params, _prep_pixels(batch["visual_inputs"]), det,
            method=model.embed_video, rngs=rngs,
        )
    rngs = _train_rngs(jax.random.fold_in(rng, 1)) if train else None
    text_embeds = model.apply(
        params, batch["text_input_ids"], batch["text_input_mask"], det,
        method=model.embed_text, rngs=rngs,
    )
    if n_options > 1:
        # rows are question-major: [q0·opt0..q0·optK, q1·opt0..] — repeat
        # (not tile) aligns each video with its K option rows
        video_embeds = jnp.repeat(video_embeds, n_options, axis=0)
    rngs = _train_rngs(jax.random.fold_in(rng, 2)) if train else None
    fusion = model.apply(
        params, text_embeds, batch["text_input_mask"], video_embeds, None, det,
        method=model.fuse, rngs=rngs,
    )
    logits = model.apply(params, fusion[:, 0, :], method=model.classify)
    if n_options > 1:
        # num_labels == 1 classifier → one score per (question, option) pair
        logits = logits.reshape(-1, n_options)
    return logits


def make_qa_inference_fn(model: AlproModel, n_options: int = 1) -> Callable:
    def infer(params, batch):
        return _qa_logits(model, params, batch, jax.random.PRNGKey(0),
                          train=False, n_options=n_options)

    return infer


def make_qa_video_encode_fn(model: AlproModel) -> Callable:
    """(params, (n, T, H, W, 3) pixels) → (n, 1+N, D) video tokens — the
    tower half of `_qa_logits`, split out so QA serving can encode a video
    once and answer many questions against the cached embeddings."""

    def encode(params, visual_inputs):
        return model.apply(
            params, _prep_pixels(visual_inputs), True,
            method=model.embed_video,
        )

    return encode


# --------------------------------------------------------------------------
# pretraining (VTC + VTM + MLM + MPM)
# --------------------------------------------------------------------------
def make_pretrain_train_step(
    model: AlproModel,
    tx: optax.GradientTransformation,
    use_itc: bool = True,
    use_itm: bool = True,
    use_mlm: bool = True,
    use_mpm: bool = True,
    num_local_blocks: int = 1,
    teacher: Optional[AlproModel] = None,
    mpm_ignore_threshold: float = 0.2,
) -> Callable:
    """Step signature: (state, batch, rng, teacher_params, prompt_bank).

    `teacher` + the frozen `teacher_params`/`prompt_bank` implement the
    Prompter pseudo-labeller (`alpro_models.py:531-551`); pass None/zeros when
    use_mpm is False.
    """

    def loss_fn(params, batch, rng, teacher_params, prompt_bank):
        fwd = _alignment_forward(model, params, batch, rng, train=True)
        metrics = {}
        loss = 0.0

        vtc, sim_v2t, sim_t2v = vtc_loss(
            fwd["video_feat"], fwd["text_feat"], fwd["temp"]
        )
        if use_itc:
            loss = loss + vtc
            metrics["itc_loss"] = vtc

        fusion_pos = None
        if use_itm:
            vtm, fusion_pos = _vtm_forward(
                model, params, batch, fwd, sim_v2t, sim_t2v, rng,
                train=True, num_local_blocks=num_local_blocks,
            )
            loss = loss + vtm
            metrics["itm_loss"] = vtm

        if use_mlm:
            rngs = _train_rngs(jax.random.fold_in(rng, 5))
            mlm_text = model.apply(
                params, batch["mlm_text_input_ids"], batch["text_input_mask"],
                False, method=model.embed_text, rngs=rngs,
            )
            rngs = _train_rngs(jax.random.fold_in(rng, 6))
            mlm_fusion = model.apply(
                params, mlm_text, batch["text_input_mask"],
                fwd["video_embeds"], None, False,
                method=model.fuse, rngs=rngs,
            )
            Lt = batch["mlm_text_input_ids"].shape[1]
            logits = model.apply(
                params, mlm_fusion[:, :Lt, :], method=model.mlm_logits
            )
            mlm = mlm_loss(logits, batch["mlm_labels"])
            loss = loss + mlm
            metrics["mlm_loss"] = mlm

        if use_mpm:
            assert teacher is not None and fusion_pos is not None
            # frozen teacher pseudo-labels from the erased crop
            crop_embeds = teacher.apply(
                teacher_params, batch["crop_visual_inputs"],
                method=teacher.embed_video,
            )
            crop_feat = teacher.apply(
                teacher_params, crop_embeds, method=teacher.video_feat
            )
            t_temp = teacher.apply(teacher_params, method=teacher.temperature)
            soft, ignore = pseudo_labels_from_feats(
                jax.lax.stop_gradient(crop_feat), prompt_bank, t_temp,
                ignore_threshold=mpm_ignore_threshold,
            )
            Lt = batch["text_input_ids"].shape[1]
            mean_embeds = masked_patch_mean(fusion_pos, batch["mpm_mask"], Lt)
            logits = model.apply(params, mean_embeds, method=model.mpm_logits)
            mpm = mpm_loss(logits, soft, ignore)
            loss = loss + mpm
            metrics["mpm_loss"] = mpm

        metrics["loss"] = loss
        return loss, metrics

    def step(state: TrainState, batch, rng, teacher_params=None, prompt_bank=None):
        rng = jax.random.fold_in(rng, state.step)
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, batch, rng, teacher_params, prompt_bank
        )
        return _apply_updates(state, grads, tx), metrics

    return step


def make_pretrain_eval_fn(
    model: AlproModel,
    use_itc: bool = True,
    use_itm: bool = True,
    use_mlm: bool = True,
    use_mpm: bool = False,
    teacher: Optional[AlproModel] = None,
    num_local_blocks: int = 1,
) -> Callable:
    """Deterministic per-batch loss metrics for pretraining validation
    (the reference's `validate()` over the val MetaLoader,
    `run_pretrain_sparse.py:240-330`). Signature:
    (params, batch, rng, teacher_params, prompt_bank) -> metrics."""

    def evaluate(params, batch, rng, teacher_params=None, prompt_bank=None):
        fwd = _alignment_forward(model, params, batch, rng, train=False)
        metrics: Dict[str, jnp.ndarray] = {}
        vtc, sim_v2t, sim_t2v = vtc_loss(
            fwd["video_feat"], fwd["text_feat"], fwd["temp"]
        )
        if use_itc:
            metrics["val_itc_loss"] = vtc
            B = sim_v2t.shape[0]
            labels = jnp.arange(B)
            metrics["val_v2t_acc"] = jnp.mean(
                (jnp.argmax(sim_v2t, -1) == labels).astype(jnp.float32)
            )
            metrics["val_t2v_acc"] = jnp.mean(
                (jnp.argmax(sim_t2v, -1) == labels).astype(jnp.float32)
            )
        fusion_pos = None
        if use_itm:
            vtm, fusion_pos = _vtm_forward(
                model, params, batch, fwd, sim_v2t, sim_t2v, rng,
                train=False, num_local_blocks=num_local_blocks,
            )
            metrics["val_itm_loss"] = vtm
        if use_mlm and "mlm_text_input_ids" in batch:
            mlm_text = model.apply(
                params, batch["mlm_text_input_ids"], batch["text_input_mask"],
                True, method=model.embed_text,
            )
            mlm_fusion = model.apply(
                params, mlm_text, batch["text_input_mask"],
                fwd["video_embeds"], None, True, method=model.fuse,
            )
            Lt = batch["mlm_text_input_ids"].shape[1]
            logits = model.apply(
                params, mlm_fusion[:, :Lt, :], method=model.mlm_logits
            )
            metrics["val_mlm_loss"] = mlm_loss(logits, batch["mlm_labels"])
            valid = batch["mlm_labels"] != -100
            correct = (jnp.argmax(logits, -1) == batch["mlm_labels"]) & valid
            metrics["val_mlm_acc"] = jnp.sum(correct) / jnp.maximum(
                jnp.sum(valid), 1
            )
        if use_mpm and teacher is not None and fusion_pos is not None:
            crop_embeds = teacher.apply(
                teacher_params, batch["crop_visual_inputs"],
                method=teacher.embed_video,
            )
            crop_feat = teacher.apply(
                teacher_params, crop_embeds, method=teacher.video_feat
            )
            t_temp = teacher.apply(teacher_params, method=teacher.temperature)
            soft, ignore = pseudo_labels_from_feats(
                crop_feat, prompt_bank, t_temp
            )
            Lt = batch["text_input_ids"].shape[1]
            mean_embeds = masked_patch_mean(fusion_pos, batch["mpm_mask"], Lt)
            logits = model.apply(params, mean_embeds, method=model.mpm_logits)
            metrics["val_mpm_loss"] = mpm_loss(logits, soft, ignore)
        return metrics

    return evaluate


# --------------------------------------------------------------------------
# prompter (VTC only, `run_pretrain_contrastive_only.py:225-255`)
# --------------------------------------------------------------------------
def make_prompter_train_step(
    model: AlproModel, tx: optax.GradientTransformation
) -> Callable:
    def loss_fn(params, batch, rng):
        fwd = _alignment_forward(model, params, batch, rng, train=True)
        vtc, sim_v2t, sim_t2v = vtc_loss(
            fwd["video_feat"], fwd["text_feat"], fwd["temp"]
        )
        B = sim_v2t.shape[0]
        labels = jnp.arange(B)
        i2t_acc = jnp.mean((jnp.argmax(sim_v2t, -1) == labels).astype(jnp.float32))
        t2i_acc = jnp.mean((jnp.argmax(sim_t2v, -1) == labels).astype(jnp.float32))
        return vtc, {"loss": vtc, "i2t_acc": i2t_acc, "t2i_acc": t2i_acc}

    def step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        return _apply_updates(state, grads, tx), metrics

    return step


# --------------------------------------------------------------------------
# sharding
# --------------------------------------------------------------------------
def shard_step(step_fn: Callable, mesh: Mesh, donate_state: bool = True,
               compiler_options: dict | None = None) -> Callable:
    """jit a step over the mesh: state/rng replicated, batch dp-sharded.

    compiler_options: optional XLA backend flags for this computation's
    compile (e.g. {"xla_tpu_scoped_vmem_limit_kib": "65536"}) — exposed to
    users as --xla_compiler_options; invalid names fail loudly at compile.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("dp"))
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, repl),
        donate_argnums=(0,) if donate_state else (),
        compiler_options=compiler_options or None,
    )


def shard_inference(fn: Callable, mesh: Mesh, shard_batch_arg: bool = True) -> Callable:
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("dp")) if shard_batch_arg else repl
    return jax.jit(fn, in_shardings=(repl, data))
