"""Does Mosaic emit the native 2× int8 MXU path where XLA doesn't?

benchmarks/int8_matmul.py measured XLA's int8 dot at only 1.1–1.4× bf16.
This probes the same fc1-shaped matmul as a Pallas kernel — one row-tiled
matmul per grid cell, bf16 vs s8×s8→s32 operands — to decide whether a
w8a8 LN-MLP kernel is worth building (docs/PERF.md round-3 candidate #4).

Run: `timeout -s KILL 600 python benchmarks/int8_pallas_probe.py`.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, D, DH = 12544, 768, 3072  # fc1 shape, R rounded to 128
TM = 128
ITERS = 30


REPEAT = 8  # in-VMEM repeats: lifts compute intensity past the HBM bound


def _kernel(x_ref, w_ref, o_ref):
    ptype = jnp.float32 if x_ref.dtype != jnp.int8 else jnp.int32
    x = x_ref[...]

    def body(k, acc):
        # k-dependent input so Mosaic cannot fold the repeats into one dot
        xi = x + k.astype(x.dtype)
        return acc + jax.lax.dot_general(
            xi, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=ptype,
        )

    acc = jax.lax.fori_loop(
        0, REPEAT, body, jnp.zeros((x.shape[0], w_ref.shape[1]), ptype)
    )
    o_ref[...] = acc.astype(o_ref.dtype)


def _make(dtype, odtype):
    grid = (R // TM,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, DH), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, DH), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, DH), odtype),
    )


def _time(call, x, w):
    one = jnp.ones((), x.dtype)

    @jax.jit
    def run(x, w):
        def body(c, _):
            y = call(c, w)
            return c + one, y.astype(jnp.float32).sum()

        _, sums = jax.lax.scan(body, x, None, length=ITERS)
        return sums.sum()

    float(run(x, w))
    t0 = time.perf_counter()
    float(run(x, w))
    return (time.perf_counter() - t0) / ITERS


def main():
    rng = np.random.RandomState(0)
    flops = 2 * R * D * DH * REPEAT
    xf = rng.randn(R, D).astype(np.float32)
    wf = rng.randn(D, DH).astype(np.float32)
    x16, w16 = jnp.asarray(xf, jnp.bfloat16), jnp.asarray(wf, jnp.bfloat16)
    x8 = jnp.asarray(np.clip(np.rint(xf * 10), -127, 127), jnp.int8)
    w8 = jnp.asarray(np.clip(np.rint(wf * 10), -127, 127), jnp.int8)

    t16 = _time(_make(jnp.bfloat16, jnp.bfloat16), x16, w16)
    print(f"pallas bf16: {t16*1e3:.3f} ms ({flops/t16/1e12:.1f} TF/s)")
    try:
        t8 = _time(_make(jnp.int8, jnp.int32), x8, w8)
        print(f"pallas int8: {t8*1e3:.3f} ms ({flops/t8/1e12:.1f} TOP/s) "
              f"| ratio {t16/t8:.2f}x")
    except Exception as e:  # Mosaic may reject int8 dots outright
        print(f"pallas int8: FAILED ({type(e).__name__}: {str(e)[:200]})")


if __name__ == "__main__":
    main()
