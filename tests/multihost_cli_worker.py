"""One process of a multi-host retrieval-CLI run on synthetic fixture data.

Drives the REAL `cli.run_video_retrieval.start_training` — not just the step
function — under a 2-process runtime: env-gated `jax.distributed.initialize`
(`core/distributed.py`), the dp-shrink mesh layout over both hosts' devices
(`cli/common.setup_training` + `core.mesh.select_devices`), per-host loader
striping, collective orbax checkpointing, and preemption resume. The
reference equivalent is one rank of `horovodrun -np 8 python
src/tasks/run_video_retrieval.py` (`run_scripts/ft_msrvtt_ret.sh:8`).

Usage: multihost_cli_worker.py <pid> <nproc> <port> <shared_root>
Writes <shared_root>/p<pid>.json with the final steps of both runs.
"""

import json
import os
import sys

pid, nproc, port, root = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={8 // nproc}"
)
os.environ["ALPRO_COORDINATOR"] = f"localhost:{port}"
os.environ["ALPRO_NUM_PROCESSES"] = str(nproc)
os.environ["ALPRO_PROCESS_ID"] = str(pid)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

from alpro_tpu.core.config import Config  # noqa: E402
from alpro_tpu.data.tokenization import make_test_vocab  # noqa: E402
from fixtures import write_video_dataset  # noqa: E402

my_root = os.path.join(root, f"host{pid}")
os.makedirs(my_root, exist_ok=True)

base = {
    "attention_probs_dropout_prob": 0.0, "hidden_dropout_prob": 0.0,
    "hidden_size": 32, "intermediate_size": 64, "num_attention_heads": 4,
    "num_hidden_layers": 4, "vocab_size": 200, "max_position_embeddings": 64,
    "fusion_layer": 2, "pad_token_id": 0,
}
vis = {
    "patch_size": 16, "embed_dim": 32, "depth": 2, "num_heads": 4,
    "drop_rate": 0, "attn_drop_rate": 0, "drop_path_rate": 0.0,
}
bm = os.path.join(my_root, "base_model.json")
vm = os.path.join(my_root, "vis_model.json")
with open(bm, "w") as f:
    json.dump(base, f)
with open(vm, "w") as f:
    json.dump(vis, f)
vocab_path = os.path.join(my_root, "vocab.txt")
with open(vocab_path, "w") as f:
    for tok in make_test_vocab():
        f.write(tok + "\n")
# deterministic fixtures: every host generates byte-identical data
ann, vid_dir, rows = write_video_dataset(my_root, n_videos=8, t=4, h=48, w=48)

cfg = Config(
    model_config=bm, visual_model_cfg=vm, tokenizer_dir=vocab_path,
    output_dir=os.path.join(root, "out"),  # shared across "hosts"
    max_txt_len=12, crop_img_size=32, resize_size=48, num_frm=2,
    # train_batch_size=4 over 8 devices exercises the dp-shrink path: dp=4
    # must take 2 devices from EACH process (a device prefix would leave
    # process 1 with zero addressable mesh shards)
    train_batch_size=4, val_batch_size=4, inference_batch_size=4,
    gradient_accumulation_steps=1, num_train_epochs=2, num_valid=1,
    learning_rate=1e-4, decay="linear", betas=[0.9, 0.98], weight_decay=0.0,
    grad_norm=5.0, seed=42, debug=True, log_interval=2,
    compute_dtype="float32", save_steps_ratio=1.0,
    frm_sampling_strategy="rand", mesh_shape=None,
    train_datasets=[{"name": "syn", "txt": ann, "img": vid_dir}],
    val_datasets=[{"name": "syn", "txt": ann, "img": vid_dir}],
    e2e_weights_path=None, inference_txt_db=None, inference_img_db=None,
)

from alpro_tpu.cli.run_video_retrieval import start_training  # noqa: E402

state = start_training(cfg)
step1 = int(np.asarray(state.step))
assert jax.process_count() == nproc, jax.process_count()

# second run resumes from the shared restore/ checkpoint (exercises the
# cross-host restore consistency check + collective orbax restore)
state = start_training(cfg)
step2 = int(np.asarray(state.step))

with open(os.path.join(root, f"p{pid}.json"), "w") as f:
    json.dump({
        "process_count": jax.process_count(),
        "step_first_run": step1,
        "step_resumed_run": step2,
    }, f)
print(f"OK pid={pid} step1={step1} step2={step2}")
