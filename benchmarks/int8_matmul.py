"""Measure the MXU int8 rate vs bf16 at the flagship matmul shapes.

Decides whether a w8a8 serving path ("halve the matmul floor",
docs/PERF.md round-3 candidate #4) is worth wiring into the hot kernels:
on v5e the int8 MXU peak is 2× bf16, but the realized ratio depends on the
toolchain's int8 lowering. Shapes: the TimeSformer-B MLP fc1/fc2 and the
packed qkv projection at the serving batch (B=8, T=8, N=196).

Run on the real chip: `timeout -s KILL 600 python benchmarks/int8_matmul.py`.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

SHAPES = [
    ("fc1 (BTN,768)@(768,3072)", (12608, 768), (768, 3072)),
    ("fc2 (BTN,3072)@(3072,768)", (12608, 3072), (3072, 768)),
    ("qkv (BTN,768)@(768,2304)", (12608, 768), (768, 2304)),
    # compute-bound probe: 137 GFLOP over ~100 MB — exposes the raw MXU
    # rate per dtype instead of the HBM bound the model shapes sit on
    ("mxu-probe 4096^3", (4096, 4096), (4096, 4096)),
]
ITERS = 30


def _time(fn, x, w, iters=ITERS):
    one = jnp.ones((), x.dtype)

    def body(c, _):
        # c changes every iteration so the matmul is neither DCE'd nor
        # hoisted out of the scan as loop-invariant
        y = fn(c, w)
        return c + one, y.astype(jnp.float32).sum()

    @jax.jit
    def run(x, w):
        _, sums = jax.lax.scan(body, x, None, length=iters)
        return sums.sum()

    float(run(x, w))  # compile + warm
    t0 = time.perf_counter()
    s = float(run(x, w))
    dt = (time.perf_counter() - t0) / iters
    return dt, s


def main():
    rng = np.random.RandomState(0)
    print(f"devices: {jax.devices()}")
    for name, xs, ws in SHAPES:
        flops = 2 * xs[0] * xs[1] * ws[1]
        xf = rng.randn(*xs).astype(np.float32)
        wf = rng.randn(*ws).astype(np.float32)
        x16 = jnp.asarray(xf, jnp.bfloat16)
        w16 = jnp.asarray(wf, jnp.bfloat16)
        x8 = jnp.asarray(np.clip(np.rint(xf * 10), -127, 127), jnp.int8)
        w8 = jnp.asarray(np.clip(np.rint(wf * 10), -127, 127), jnp.int8)

        bf = lambda a, b: jnp.dot(a, b)  # noqa: E731
        i8 = lambda a, b: jax.lax.dot_general(  # noqa: E731
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        t_bf, _ = _time(bf, x16, w16)
        t_i8, _ = _time(i8, x8, w8)
        print(
            f"{name}: bf16 {t_bf*1e3:.3f} ms ({flops/t_bf/1e12:.1f} TF/s) | "
            f"int8 {t_i8*1e3:.3f} ms ({flops/t_i8/1e12:.1f} TOP/s) | "
            f"ratio {t_bf/t_i8:.2f}x"
        )


if __name__ == "__main__":
    main()
