"""Worker for the 2-process multi-host training integration test.

Runs the REAL training path — `core.distributed.maybe_initialize` (env-gated,
as the CLIs call it), `BatchLoader(num_shards, shard_id)` per-host data
striping, `core.mesh.shard_batch` global-array assembly, and the jitted
`make_retrieval_train_step` over the global dp mesh — in one of two modes:

  * ``single``: one process, 8 virtual CPU devices (the existing test rig);
  * ``multi``:  one of two processes, 4 virtual CPU devices each, joined via
    ALPRO_COORDINATOR (the `horovodrun -np 2` role).

Both modes compute the same GLOBAL program over the same global batch, so
the per-step losses must match (the reference's multi-process data parallel
is only correct under the same invariant — `run_video_retrieval.py:115-117`,
SURVEY.md §2.10).

Usage: python multihost_train_worker.py <mode> <pid> <nproc> <port> <out>
"""

import json
import os
import sys

mode, pid, nproc, port, out_path = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], sys.argv[5]
)
n_local_dev = 8 // nproc
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={n_local_dev}"
)
if mode == "multi":
    # exercise the env-gated path the CLIs use (core/distributed.py)
    os.environ["ALPRO_COORDINATOR"] = f"localhost:{port}"
    os.environ["ALPRO_NUM_PROCESSES"] = str(nproc)
    os.environ["ALPRO_PROCESS_ID"] = str(pid)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from alpro_tpu.core.distributed import (  # noqa: E402
    data_shards,
    local_batch_size,
    maybe_initialize,
)

initialized = maybe_initialize()
assert (mode == "multi") == initialized, (mode, initialized)
assert jax.device_count() == 8, jax.device_count()

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from alpro_tpu.core.mesh import make_mesh, replicate, shard_batch  # noqa: E402
from alpro_tpu.data.loader import BatchLoader  # noqa: E402
from alpro_tpu.models import (  # noqa: E402
    BertConfig,
    TimeSformerConfig,
    build_retrieval_model,
)
from alpro_tpu.train import TrainState, build_optimizer, get_lr_schedule  # noqa: E402
from alpro_tpu.train.step import make_retrieval_train_step, shard_step  # noqa: E402

GLOBAL_B = 8
N_STEPS = 2

vis = TimeSformerConfig(
    img_size=32, patch_size=16, num_frames=2, embed_dim=16, depth=2,
    num_heads=2, drop_path_rate=0.0,
)
bert = BertConfig(
    vocab_size=64, hidden_size=16, num_hidden_layers=2,
    num_attention_heads=2, intermediate_size=32, fusion_layer=1,
    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
)
model = build_retrieval_model(bert, vis)


class _SyntheticDataset:
    """Deterministic rows shared by every process (index → fixed sample)."""

    def __len__(self):
        return GLOBAL_B * N_STEPS

    def __getitem__(self, i):
        rng = np.random.RandomState(1000 + int(i))
        return {
            "visual_inputs": rng.rand(2, 32, 32, 3).astype(np.float32),
            "text_input_ids": rng.randint(0, 64, (6,)).astype(np.int32),
            "text_input_mask": np.ones((6,), np.int32),
        }


def _collate(samples):
    return {
        k: np.stack([s[k] for s in samples]) for k in samples[0]
    }


SHARDS = 2  # host stripes; the multi run hosts one stripe per process
if mode == "multi":
    num_shards, shard_id = data_shards()
    assert (num_shards, shard_id) == (SHARDS, pid)
    loaders = [BatchLoader(
        _SyntheticDataset(), _collate, local_batch_size(GLOBAL_B),
        shuffle=True, seed=7, num_shards=SHARDS, shard_id=shard_id,
    )]
else:
    # single-process reference: iterate BOTH host stripes with the same
    # loader code and concatenate — the exact global batch the 2-process
    # run assembles via make_array_from_process_local_data
    assert data_shards() == (1, 0)
    loaders = [BatchLoader(
        _SyntheticDataset(), _collate, GLOBAL_B // SHARDS,
        shuffle=True, seed=7, num_shards=SHARDS, shard_id=s,
    ) for s in range(SHARDS)]

mesh = make_mesh()  # all 8 global devices on dp
params = model.init(
    {"params": jax.random.PRNGKey(0)},
    jnp.zeros((1, 2, 32, 32, 3), jnp.float32),
    jnp.zeros((1, 6), jnp.int32),
    jnp.ones((1, 6), jnp.int32),
)
tx = build_optimizer(get_lr_schedule("linear", 1e-4, 10))
state = replicate(mesh, TrainState.create(params, tx))
step_fn = shard_step(make_retrieval_train_step(model, tx), mesh)

rng = jax.random.PRNGKey(42)
losses = []
iters = [iter(ld) for ld in loaders]
for _ in range(N_STEPS):
    parts = [next(it) for it in iters]
    host_batch = {
        k: np.concatenate([p[k] for p in parts]) for k in parts[0]
    }
    batch = shard_batch(mesh, host_batch)
    state, metrics = step_fn(state, batch, rng)
    losses.append(float(metrics["loss"]))

# a post-update parameter fingerprint proves the optimizer applied the same
# (psum-reduced) gradients in both process layouts
leaf = state.params["params"]["vision_proj"]["kernel"]
fingerprint = float(jnp.sum(jnp.abs(leaf.astype(jnp.float32))))

with open(out_path, "w") as f:
    json.dump({"losses": losses, "fingerprint": fingerprint,
               "process_count": jax.process_count()}, f)
print("worker done", flush=True)
