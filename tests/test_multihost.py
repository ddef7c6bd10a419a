"""Multi-host (2-process) training integration test.

Closes SURVEY.md §2.9 row 1 end-to-end: the env-gated
`jax.distributed.initialize` entry (`core/distributed.py`), per-host loader
striping (`BatchLoader(num_shards, shard_id)` — the DistributedSampler role,
reference `run_video_retrieval.py:115-117`), global-array assembly
(`core.mesh.shard_batch` via `jax.make_array_from_process_local_data`), and
the jitted retrieval train step over the spanning dp mesh.

The 2-process × 4-device run and the 1-process × 8-device run execute the
same global program over the same global batch, so their per-step losses and
post-update parameter fingerprints must agree.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_train_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env():
    env = {k: v for k, v in os.environ.items()
           if k not in ("ALPRO_COORDINATOR", "ALPRO_NUM_PROCESSES",
                        "ALPRO_PROCESS_ID", "XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return env


def _run(mode, pid, nproc, port, out, timeout=900):
    return subprocess.Popen(
        [sys.executable, WORKER, mode, str(pid), str(nproc), str(port), out],
        env=_env(), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )


@pytest.mark.slow
def test_two_process_train_matches_single_process(tmp_path):
    port = _free_port()
    out_s = str(tmp_path / "single.json")
    out_m0 = str(tmp_path / "multi0.json")
    out_m1 = str(tmp_path / "multi1.json")

    # single-process reference run (8 local devices)
    p = _run("single", 0, 1, port, out_s)
    stdout, _ = p.communicate(timeout=900)
    assert p.returncode == 0, stdout.decode(errors="replace")[-3000:]

    # 2-process run (4 local devices each) joined through the coordinator
    port = _free_port()
    p1 = _run("multi", 1, 2, port, out_m1)
    p0 = _run("multi", 0, 2, port, out_m0)
    out0, _ = p0.communicate(timeout=900)
    out1, _ = p1.communicate(timeout=900)
    assert p0.returncode == 0, out0.decode(errors="replace")[-3000:]
    assert p1.returncode == 0, out1.decode(errors="replace")[-3000:]

    with open(out_s) as f:
        single = json.load(f)
    with open(out_m0) as f:
        multi0 = json.load(f)
    with open(out_m1) as f:
        multi1 = json.load(f)

    assert single["process_count"] == 1
    assert multi0["process_count"] == 2
    # both processes of the multi run observe the identical replicated state
    np.testing.assert_array_equal(multi0["losses"], multi1["losses"])
    np.testing.assert_array_equal(multi0["fingerprint"], multi1["fingerprint"])

    # the global program is identical → same losses and same updated params
    # (same HLO partitioning over the same 8-device dp mesh; tolerance only
    # for cross-runtime reduction-order slack)
    np.testing.assert_allclose(single["losses"], multi0["losses"],
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(single["fingerprint"], multi0["fingerprint"],
                               rtol=1e-6)
    # training actually progressed (loss changed between steps)
    assert single["losses"][0] != single["losses"][1]


CLI_WORKER = os.path.join(os.path.dirname(__file__), "multihost_cli_worker.py")


@pytest.mark.slow
def test_two_process_cli_train_and_resume(tmp_path):
    """Full retrieval CLI under a 2-process runtime, including the paths the
    step-level test can't reach: the dp-shrink mesh layout over both hosts
    (batch 4 over 8 devices → 2 devices per host, `core.mesh.select_devices`),
    collective orbax checkpointing (rank-0-only saves would deadlock the
    primary's barrier), and cross-host preemption resume."""
    port = _free_port()
    root = str(tmp_path)
    procs = [
        subprocess.Popen(
            [sys.executable, CLI_WORKER, str(i), "2", str(port), root],
            env=_env(), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, logs[i].decode(errors="replace")[-3000:]
    results = []
    for i in range(2):
        with open(os.path.join(root, f"p{i}.json")) as f:
            results.append(json.load(f))
    assert all(r["process_count"] == 2 for r in results)
    assert results[0] == results[1]
    assert results[0]["step_first_run"] >= 2
    # run 2 restored the shared checkpoint instead of restarting at step 0
    assert results[0]["step_resumed_run"] >= results[0]["step_first_run"]


QA_PRETRAIN_WORKER = os.path.join(
    os.path.dirname(__file__), "multihost_qa_pretrain_worker.py"
)


def _run_qp(mode, pid, nproc, port, root):
    return subprocess.Popen(
        [sys.executable, QA_PRETRAIN_WORKER, mode, str(pid), str(nproc),
         str(port), root],
        env=_env(), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )


def _run_pair_and_single(mode, tmp_path):
    root = str(tmp_path)
    p = _run_qp(mode, 0, 1, 0, root)
    out, _ = p.communicate(timeout=900)
    assert p.returncode == 0, out.decode(errors="replace")[-3000:]
    os.rename(os.path.join(root, f"{mode}_p0.json"),
              os.path.join(root, f"{mode}_single.json"))

    port = _free_port()
    procs = [_run_qp(mode, i, 2, port, root) for i in (1, 0)]
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, logs[i].decode(errors="replace")[-3000:]
    with open(os.path.join(root, f"{mode}_single.json")) as f:
        single = json.load(f)
    multi = []
    for i in range(2):
        with open(os.path.join(root, f"{mode}_p{i}.json")) as f:
            multi.append(json.load(f))
    assert single["process_count"] == 1
    assert all(m["process_count"] == 2 for m in multi)
    return single, multi


@pytest.mark.slow
def test_two_process_qa_inference_matches_single(tmp_path):
    """The QA eval's cross-rank merge (`inference_qa` → host_sync
    all_gather_list; the reference's per-answer-type ratio-weighted merge,
    `run_video_qa.py:300-356`): per-host question striping must reassemble
    into exactly the single-process metrics and per-question answers."""
    single, (m0, m1) = _run_pair_and_single("qa", tmp_path)
    assert m0["metrics"] == m1["metrics"]           # replicated merge result
    assert m0["metrics"] == single["metrics"]       # striping is lossless
    assert m0["answers"] == single["answers"]       # per-question agreement
    assert m1["answers"] is None                    # rank-0-only file write
    assert len(single["answers"]) == 10


@pytest.mark.slow
def test_two_process_pretrain_matches_single(tmp_path):
    """The pretrain collective paths (prompt-bank build via the real
    setup_prompt_banks on the global mesh; 4-objective step with teacher +
    replicated bank): 2-process per-step losses must match the 1-process
    run over the identical global batches (tolerance only for cross-runtime
    reduction-order slack, as in the retrieval multihost test)."""
    single, (m0, m1) = _run_pair_and_single("pretrain", tmp_path)
    np.testing.assert_array_equal(m0["losses"], m1["losses"])
    assert m0["fingerprint"] == m1["fingerprint"]
    np.testing.assert_allclose(single["losses"], m0["losses"],
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(single["fingerprint"], m0["fingerprint"],
                               rtol=1e-6)
    assert single["losses"][0] != single["losses"][1]  # training progressed
