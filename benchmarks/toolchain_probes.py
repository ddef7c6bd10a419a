"""Round-start re-probe of the two toolchain dead ends (docs/PERF.md).

Both the ≥5× embed case and the w8a8 serving case were closed *on this
toolchain* (round 3/4): XLA never emits the rated-2× int8 MXU path, the
high-intensity Pallas int8 dot crashes Mosaic, and the fused
patchify+embed kernel was superseded by `fold_uint8_norm` after Mosaic
crashes at flagship shapes. A toolchain upgrade could reopen any of them,
so each round starts with this one command and notes the result in
docs/PERF.md — keeping the closures honest.

Run: `timeout -s KILL 1800 python benchmarks/toolchain_probes.py`
(driver mode: each probe in its own subprocess — a compiler crash in one
cannot take down the rest; ONE TPU process at a time, sequential).

Probes:
  * xla_int8   — compute-bound 4096³ dot, int8 vs bf16 ratio (rated 2×;
                 round-3 measured 1.28×). Reopen if ratio ≥ 1.6.
  * pallas_int8 — the 8×-intensity Mosaic int8 dot that crashed round 3.
                 Reopen the w8a8 kernel case if it compiles AND ratio ≥ 1.6.
  * patchify   — `ops/pallas_preprocess.fused_patchify_embed` at flagship
                 (8, 8, 224, 224, 3): crash status + ms vs the XLA lowering.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBES = ("xla_int8", "pallas_int8", "patchify")
ITERS = 20


def _time_scan(call, x, w, iters=ITERS):
    """Device-time a binary op: scan chains ITERS calls, scalar readback."""
    import jax
    import jax.numpy as jnp

    one = jnp.ones((), x.dtype)

    @jax.jit
    def run(x, w):
        def body(c, _):
            return c + one, call(c, w).astype(jnp.float32).sum()

        _, sums = jax.lax.scan(body, x, None, length=iters)
        return sums.sum()

    float(run(x, w))
    t0 = time.perf_counter()
    float(run(x, w))
    return (time.perf_counter() - t0) / iters


def probe_xla_int8():
    import jax
    import jax.numpy as jnp
    import numpy as np

    M = 4096
    rng = np.random.RandomState(0)
    af = rng.randn(M, M).astype(np.float32)
    a16 = jnp.asarray(af, jnp.bfloat16)
    a8 = jnp.asarray(np.clip(np.rint(af * 10), -127, 127), jnp.int8)

    def dot16(x, w):
        return jax.lax.dot(x, w)

    def dot8(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    t16 = _time_scan(dot16, a16, a16)
    t8 = _time_scan(dot8, a8, a8)
    flops = 2 * M**3
    return {
        "xla_bf16_tf": round(flops / t16 / 1e12, 1),
        "xla_int8_tf": round(flops / t8 / 1e12, 1),
        "xla_int8_ratio": round(t16 / t8, 2),
    }


def probe_pallas_int8():
    import importlib.util

    import jax.numpy as jnp
    import numpy as np

    spec = importlib.util.spec_from_file_location(
        "int8_pallas_probe",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "int8_pallas_probe.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rng = np.random.RandomState(0)
    xf = rng.randn(mod.R, mod.D).astype(np.float32)
    wf = rng.randn(mod.D, mod.DH).astype(np.float32)
    flops = 2 * mod.R * mod.D * mod.DH * mod.REPEAT
    t16 = mod._time(mod._make(jnp.bfloat16, jnp.bfloat16),
                    jnp.asarray(xf, jnp.bfloat16), jnp.asarray(wf, jnp.bfloat16))
    out = {"pallas_bf16_tf": round(flops / t16 / 1e12, 1)}
    try:
        t8 = mod._time(
            mod._make(jnp.int8, jnp.int32),
            jnp.asarray(np.clip(np.rint(xf * 10), -127, 127), jnp.int8),
            jnp.asarray(np.clip(np.rint(wf * 10), -127, 127), jnp.int8),
        )
        out["pallas_int8_ratio"] = round(t16 / t8, 2)
    except Exception as e:
        out["pallas_int8_ratio"] = f"crash:{type(e).__name__}"
    return out


def probe_patchify():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from alpro_tpu.ops.pallas_preprocess import (
        _patches_xla,
        fused_patchify_embed,
    )

    B, T, H, P, D = 8, 8, 224, 16, 768
    rng = np.random.RandomState(0)
    raw = jnp.asarray(
        np.frombuffer(rng.bytes(B * T * H * H * 3), np.uint8).reshape(
            B, T, H, H, 3
        )
    )
    kern = jnp.asarray(rng.randn(P * P * 3, D) * 0.02, jnp.bfloat16)
    bias = jnp.zeros((D,), jnp.bfloat16)
    mean, std = (0.48, 0.46, 0.41), (0.27, 0.26, 0.28)

    def xla_path(r, k):
        return (_patches_xla(r, P, mean, std).astype(jnp.bfloat16) @ k
                + bias).astype(jnp.bfloat16)

    @jax.jit
    def xla_sum(r, k):
        return xla_path(r, k).astype(jnp.float32).sum()

    float(xla_sum(raw, kern))
    t0 = time.perf_counter()
    for _ in range(10):
        s = float(xla_sum(raw, kern))
    t_xla = (time.perf_counter() - t0) / 10
    out = {"patchify_xla_ms": round(t_xla * 1e3, 2)}
    try:
        @jax.jit
        def fused_sum(r, k):
            return fused_patchify_embed(
                r, k, bias, mean, std
            ).astype(jnp.float32).sum()

        float(fused_sum(raw, kern))
        t0 = time.perf_counter()
        for _ in range(10):
            s = float(fused_sum(raw, kern))
        out["patchify_fused_ms"] = round((time.perf_counter() - t0) / 10 * 1e3, 2)
    except Exception as e:
        out["patchify_fused_ms"] = f"crash:{type(e).__name__}"
    return out


def main():
    if len(sys.argv) > 1:  # single-probe child
        print(json.dumps(globals()[f"probe_{sys.argv[1]}"]()), flush=True)
        return
    merged = {}
    for name in PROBES:
        try:
            r = subprocess.run(
                ["timeout", "-s", "KILL", "600", sys.executable,
                 os.path.abspath(__file__), name],
                capture_output=True, text=True,
            )
            line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
            merged.update(json.loads(line) if line.startswith("{") else
                          {name: f"died:rc={r.returncode}"})
        except Exception as e:
            merged[name] = f"driver_error:{type(e).__name__}"
    print(json.dumps(merged), flush=True)


if __name__ == "__main__":
    main()
