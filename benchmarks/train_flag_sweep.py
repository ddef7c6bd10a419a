"""Round-5 XLA compiler-flag sweep on the flagship retrieval train step.

Rounds 2-4 measured 17 remat/kernel/dtype configurations and closed the
train throughput question at 44.9 clips/s (B=8), data-movement-bound in the
backward (94 ms/step of copies — docs/PERF.md round 4). One lever was never
touched in any round: XLA/TPU *compiler options*, which `jax.jit` can pass
per-computation and which the axon remote-compile helper verifiably parses
(invalid names are rejected with HTTP 500; probed live 2026-08-20).

This sweep runs the shipped train config (dots_ln remat, unrolled, mu-bf16)
under a ladder of documented TPU backend flags (scoped-VMEM budget,
latency-hiding scheduler, fusion knobs) and prints one JSON line per config.
Each config compiles fresh (compiler options key the compile cache), so a
full sweep is compile-dominated; results land in docs/PERF.md round 5.

Usage: python benchmarks/train_flag_sweep.py [--iters 8] [--configs a,b,...]
"""

import argparse
import json
import sys
import time

CONFIGS = {
    # scoped VMEM ladder: more VMEM budget per fusion -> deeper fusions,
    # fewer HBM round-trips for the backward's relayout copies.
    "vmem32": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "vmem64": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem96": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    # latency-hiding scheduler: overlaps DMA with compute; public MaxText
    # configs enable it on v5e. NOTE: the compiler_options bool parser wants
    # Python spelling ("True"), not "true"/"1" — probed live.
    "lhs": {"xla_tpu_enable_latency_hiding_scheduler": "True"},
    # combined best-guess
    "lhs_vmem64": {
        "xla_tpu_enable_latency_hiding_scheduler": "True",
        "xla_tpu_scoped_vmem_limit_kib": "65536",
    },
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--configs", type=str, default=",".join(CONFIGS))
    args = ap.parse_args()

    from train_step import measure_train_step  # noqa: E402 (sibling import)

    for name in args.configs.split(","):
        name = name.strip()
        if not name:
            continue
        copts = CONFIGS.get(name)
        if copts is None and "=" in name:  # ad-hoc: key=value[;key=value]
            copts = dict(kv.split("=", 1) for kv in name.split(";"))
            name = "adhoc"
        t0 = time.perf_counter()
        try:
            r = measure_train_step(
                batch=args.batch, iters=args.iters,
                remat_policy="dots_ln", scan_blocks=False,
                mu_dtype="bfloat16", compiler_options=copts,
            )
            out = {
                "config": name, "copts": copts,
                "clips_per_sec": round(r["clips_per_sec"], 2),
                "ms_per_step": round(r["ms_per_step"], 1),
                "compile_s": round(r["compile_s"], 1),
                "loss": round(r["loss"], 4),
            }
        except Exception as e:  # a rejected flag must not kill the sweep
            out = {"config": name, "copts": copts,
                   "error": f"{type(e).__name__}: {str(e)[:200]}"}
        out["wall_s"] = round(time.perf_counter() - t0, 1)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    main()
