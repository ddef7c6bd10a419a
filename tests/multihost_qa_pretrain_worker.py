"""One process of the 2-process QA-inference / pretrain multihost tests.

Round-4 VERDICT #5: the retrieval CLI is already driven 2-process
(multihost_cli_worker.py); the QA eval's cross-rank results merge
(`cli/run_video_qa.py::inference_qa` → host_sync `all_gather_list`, the
reference's per-answer-type ratio-weighted merge role,
`/root/reference/src/tasks/run_video_qa.py:300-356`) and the pretrain
teacher/prompt-bank build (`cli/run_pretrain.setup_prompt_banks` →
`alpro_models.py:430-507`; bank replicated to every host) are DIFFERENT
collective paths, driven here.

Modes:
  * ``qa``: the REAL `cli.run_video_qa.start_inference` on a fixture QA
    dataset with deterministic fresh-init params (every process inits the
    same tree from PRNGKey(cfg.seed=0)); per-host question striping +
    all_gather_list merge. 2-process metrics must equal 1-process.
  * ``pretrain``: the full pretrain step (VTC+VTM+MLM+MPM) over the global
    dp mesh with the teacher + prompt banks built through the real
    `setup_prompt_banks`; deterministic striped loaders (the
    multihost_train_worker recipe) so 2-process per-step losses bit-match
    the 1-process run.

Usage: multihost_qa_pretrain_worker.py <mode> <pid> <nproc> <port> <root>
Writes <root>/<mode>_p<pid>.json.
"""

import json
import os
import sys

mode, pid, nproc, port, root = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], sys.argv[5],
)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={8 // nproc}"
)
if nproc > 1:
    os.environ["ALPRO_COORDINATOR"] = f"localhost:{port}"
    os.environ["ALPRO_NUM_PROCESSES"] = str(nproc)
    os.environ["ALPRO_PROCESS_ID"] = str(pid)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

from alpro_tpu.core.config import Config  # noqa: E402
from alpro_tpu.data.tokenization import WordPieceTokenizer, make_test_vocab  # noqa: E402

my_root = os.path.join(root, f"{mode}_host{pid}")
os.makedirs(my_root, exist_ok=True)

BASE = {
    "attention_probs_dropout_prob": 0.0, "hidden_dropout_prob": 0.0,
    "hidden_size": 32, "intermediate_size": 64, "num_attention_heads": 4,
    "num_hidden_layers": 4, "vocab_size": 200, "max_position_embeddings": 64,
    "fusion_layer": 2, "pad_token_id": 0,
}
VIS = {
    "patch_size": 16, "embed_dim": 32, "depth": 2, "num_heads": 4,
    "drop_rate": 0, "attn_drop_rate": 0, "drop_path_rate": 0.0,
}


def _write_model_files():
    bm = os.path.join(my_root, "base_model.json")
    vm = os.path.join(my_root, "vis_model.json")
    with open(bm, "w") as f:
        json.dump(BASE, f)
    with open(vm, "w") as f:
        json.dump(VIS, f)
    vocab_path = os.path.join(my_root, "vocab.txt")
    with open(vocab_path, "w") as f:
        for tok in make_test_vocab():
            f.write(tok + "\n")
    return bm, vm, vocab_path


def run_qa():
    from fixtures import write_qa_dataset

    bm, vm, vocab = _write_model_files()
    # deterministic fixtures: every host generates byte-identical data
    ann, vid_dir, rows, ans2label = write_qa_dataset(
        my_root, n=10, t=4, h=48, w=48
    )
    a2l = os.path.join(my_root, "ans2label.json")
    with open(a2l, "w") as f:
        json.dump(ans2label, f)

    cfg = Config(
        do_inference=1, inference_txt_db=ann, inference_img_db=vid_dir,
        model_config=bm, visual_model_cfg=vm, tokenizer_dir=vocab,
        ans2label_path=a2l, task="msvd_qa", num_labels=len(ans2label),
        cls_hidden_scale=2, score_agg_func="mean",
        inference_n_clips=1, train_n_clips=1,
        num_frm=2, resize_size=48, crop_img_size=32, max_txt_len=12,
        inference_batch_size=4, val_batch_size=4, n_workers=0,
        output_dir=os.path.join(my_root, "out"),
        compute_dtype="float32", seed=0,
        # no checkpoint: the CLI's fresh-init path — deterministic
        # (PRNGKey(0)) so every process and the 1-process reference run
        # score with identical weights
        inference_model_ckpt=None, e2e_weights_path=None,
    )
    from alpro_tpu.cli.run_video_qa import start_inference

    metrics = start_inference(cfg)
    # results file is primary-host-only (reference rank-0 write semantics)
    results_path = os.path.join(cfg.output_dir, "qa_results.json")
    answers = None
    if os.path.exists(results_path):
        with open(results_path) as f:
            answers = {
                r["question_id"]: r["answer"]
                for r in json.load(f)["results"]
            }
    assert (answers is not None) == (jax.process_index() == 0)
    with open(os.path.join(root, f"qa_p{pid}.json"), "w") as f:
        json.dump({
            "process_count": jax.process_count(),
            "metrics": metrics,
            "answers": answers,
        }, f)
    print(f"OK qa pid={pid} overall_acc={metrics.get('overall_acc')}")


def run_pretrain():
    import jax.numpy as jnp

    from alpro_tpu.cli.run_pretrain import setup_prompt_banks
    from alpro_tpu.core.distributed import (
        data_shards,
        local_batch_size,
        maybe_initialize,
    )

    initialized = maybe_initialize()
    assert (nproc > 1) == initialized, (nproc, initialized)
    assert jax.device_count() == 8, jax.device_count()

    from jax.sharding import NamedSharding, PartitionSpec as P

    from alpro_tpu.core.mesh import make_mesh, replicate, shard_batch
    from alpro_tpu.data.datasets import PretrainCollator
    from alpro_tpu.data.loader import BatchLoader
    from alpro_tpu.models import build_pretrain_model, build_prompter_model
    from alpro_tpu.train import TrainState, build_optimizer, get_lr_schedule
    from alpro_tpu.train.step import make_pretrain_train_step

    from alpro_tpu.models import BertConfig, TimeSformerConfig

    GLOBAL_B, N_STEPS, T, S, L = 8, 2, 2, 32, 10
    vis_cfg = TimeSformerConfig(
        img_size=S, patch_size=16, num_frames=T, embed_dim=VIS["embed_dim"],
        depth=VIS["depth"], num_heads=VIS["num_heads"], drop_path_rate=0.0,
    )
    bert_cfg = BertConfig(
        vocab_size=BASE["vocab_size"], hidden_size=BASE["hidden_size"],
        num_hidden_layers=BASE["num_hidden_layers"],
        num_attention_heads=BASE["num_attention_heads"],
        intermediate_size=BASE["intermediate_size"],
        fusion_layer=BASE["fusion_layer"],
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    model = build_pretrain_model(
        bert_cfg, vis_cfg, num_entities=5, img_size=S, num_frm=T
    )
    teacher = build_prompter_model(bert_cfg, vis_cfg, img_size=S, num_frm=T)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, T, S, S, 3), jnp.float32),
        jnp.zeros((1, L), jnp.int32), jnp.ones((1, L), jnp.int32),
    )
    teacher_params = teacher.init(
        {"params": jax.random.PRNGKey(1)},
        jnp.zeros((1, T, S, S, 3), jnp.float32),
        jnp.zeros((1, L), jnp.int32), jnp.ones((1, L), jnp.int32),
    )

    # the REAL one-time prompt-bank build (jitted chunked lax.map over the
    # global mesh — replicated output, the collective path under test)
    ents = os.path.join(my_root, "unigrams.txt")
    with open(ents, "w") as f:
        for w in ["dog", "cat", "ball", "man", "woman"]:
            f.write(w + "\n")
    tok = WordPieceTokenizer(make_test_vocab())
    bank_cfg = Config(
        entity_file_path=ents, num_entities=5, max_txt_len=L,
        prompt_chunk_size=16,
    )
    banks = setup_prompt_banks(bank_cfg, teacher, teacher_params, tok)
    assert banks["video"].shape == (5, 256), banks["video"].shape

    class _SyntheticPretrainDataset:
        """index → fixed (clip, caption): byte-identical on every host."""

        CAPTIONS = ["a dog runs", "the cat jumps", "a man is playing ball",
                    "rain on the window", "two cats sleep"]

        def __len__(self):
            return GLOBAL_B * N_STEPS

        def __getitem__(self, i):
            rng = np.random.RandomState(2000 + int(i))
            return {
                "clip": rng.randint(0, 255, (T, S, S, 3), np.uint8),
                "caption": self.CAPTIONS[int(i) % len(self.CAPTIONS)],
                "type": "video",
            }

    def mk_loader(shard_id, num_shards):
        # fresh collator per loader: its MLM/random-erase RNG stream then
        # depends only on this stripe's call order (num_workers=0), so the
        # single-process emulation below masks identically per stripe
        col = PretrainCollator(tok, L, mlm=True, mpm=True, patch_size=16,
                               seed=123)
        return BatchLoader(
            _SyntheticPretrainDataset(), col,
            GLOBAL_B // 2, shuffle=True, seed=7,
            num_shards=num_shards, shard_id=shard_id, num_workers=0,
        )

    if nproc > 1:
        num_shards, shard_id = data_shards()
        assert (num_shards, shard_id) == (2, pid)
        assert local_batch_size(GLOBAL_B) == GLOBAL_B // 2
        loaders = [mk_loader(shard_id, 2)]
    else:
        loaders = [mk_loader(s, 2) for s in range(2)]

    mesh = make_mesh()
    tx = build_optimizer(get_lr_schedule("linear", 1e-4, 10))
    state = replicate(mesh, TrainState.create(params, tx))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("dp"))
    # (state, batch, rng, teacher_params, prompt_bank) — the same sharding
    # layout cli/common.setup_training uses for extra_repl_args=2
    step = jax.jit(
        make_pretrain_train_step(
            model, tx, use_itc=True, use_itm=True, use_mlm=True, use_mpm=True,
            teacher=teacher,
        ),
        in_shardings=(repl, data, repl, repl, repl),
        donate_argnums=(0,),
    )
    t_repl = replicate(mesh, teacher_params)
    bank_repl = replicate(mesh, banks["video"])

    drop_keys = {"type", "question_ids", "caption"}
    losses = []
    iters = [iter(l) for l in loaders]
    rng = jax.random.PRNGKey(11)
    for si in range(N_STEPS):
        parts = [next(it) for it in iters]
        batch = {
            k: np.concatenate([p[k] for p in parts]) if len(parts) > 1
            else parts[0][k]
            for k in parts[0]
            if k not in drop_keys
        }
        gbatch = shard_batch(mesh, batch)
        state, metrics = step(state, gbatch, rng, t_repl, bank_repl)
        losses.append(float(np.asarray(metrics["loss"])))

    leaf = state.params["params"]["vision_proj"]["kernel"]
    fingerprint = float(jnp.sum(jnp.abs(leaf.astype(jnp.float32))))
    with open(os.path.join(root, f"pretrain_p{pid}.json"), "w") as f:
        json.dump({
            "process_count": jax.process_count(),
            "losses": losses,
            "fingerprint": fingerprint,
        }, f)
    print(f"OK pretrain pid={pid} losses={losses}")


if mode == "qa":
    run_qa()
elif mode == "pretrain":
    run_pretrain()
else:
    raise SystemExit(f"unknown mode {mode}")
