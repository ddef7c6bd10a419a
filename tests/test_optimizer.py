"""LR schedule parity with the reference formulas (`src/optimization/sched.py`)."""

import numpy as np
import jax.numpy as jnp

from alpro_tpu.train import (
    get_lr_schedule,
    multi_step_schedule,
)


def ref_warmup_linear(step, warmup_step, tot_step):
    if step < warmup_step:
        return step / warmup_step
    return max(0, (tot_step - step) / (tot_step - warmup_step))


def ref_noam(step, warmup_step):
    if step <= warmup_step:
        return step / warmup_step
    return (warmup_step ** 0.5) * (step ** -0.5)


def test_linear_schedule_matches_reference():
    lr, total, ratio = 2.5e-5, 1000, 0.1
    sched = get_lr_schedule("linear", lr, total, warmup_ratio=ratio)
    warmup = int(ratio * total)
    for step in [0, 1, 50, 99, 100, 101, 500, 999, 1000, 1100]:
        want = max(lr * ref_warmup_linear(step, warmup, total), 1e-8)
        np.testing.assert_allclose(float(sched(step)), want, rtol=1e-6)


def test_invsqrt_schedule_matches_reference():
    lr, total, ratio = 1e-4, 10000, 0.05
    sched = get_lr_schedule("invsqrt", lr, total, warmup_ratio=ratio)
    warmup = int(ratio * total)
    for step in [1, 100, 499, 500, 501, 5000, 20000]:
        want = max(lr * ref_noam(step, warmup), 1e-8)
        np.testing.assert_allclose(float(sched(step)), want, rtol=1e-5)


def test_constant_schedule():
    sched = get_lr_schedule("constant", 3e-4, 100)
    assert float(sched(0)) == float(sched(99))
    np.testing.assert_allclose(float(sched(0)), 3e-4, rtol=1e-6)


def test_multi_step():
    assert multi_step_schedule(0, [5, 10]) == 1.0
    assert multi_step_schedule(5, [5, 10]) == 0.5
    assert multi_step_schedule(10, [5, 10]) == 0.5 ** 3
    assert multi_step_schedule(7, [10, 5]) == 0.5  # unsorted input


def test_multi_step_schedule_from_steps():
    # 10 opt-steps per epoch, milestones at epochs 2 and 4: the multiplier
    # must step down at steps 20 and 40 and hit the reference's gamma^(n+1)
    # past-the-last-milestone quirk
    sched = get_lr_schedule(
        "multi_step", 1e-3, 100, decay_epochs=[2, 4], steps_per_epoch=10
    )
    np.testing.assert_allclose(float(sched(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(19)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(20)), 0.5e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(39)), 0.5e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(40)), 1e-3 * 0.5 ** 3, rtol=1e-6)
    # and it must trace under jit (pure function of the step)
    import jax

    np.testing.assert_allclose(
        float(jax.jit(sched)(25)), 0.5e-3, rtol=1e-6
    )


def test_mu_dtype_bf16():
    """mu_dtype='bfloat16' stores the AdamW first moment in bf16 and the
    resulting updates track the fp32 optimizer closely on a quadratic."""
    import jax
    import jax.numpy as jnp
    import optax

    from alpro_tpu.train.optimizer import build_optimizer

    def run(mu_dtype):
        tx = build_optimizer(
            get_lr_schedule("constant", 1e-2, 100), grad_norm=1.0,
            mu_dtype=mu_dtype,
        )
        params = {"w": jnp.full((64,), 3.0)}
        opt = tx.init(params)
        if mu_dtype == "bfloat16":
            mus = [
                leaf
                for leaf in jax.tree_util.tree_leaves(opt)
                if hasattr(leaf, "dtype") and leaf.dtype == jnp.bfloat16
            ]
            assert mus, "first moment not stored in bf16"

        @jax.jit
        def step(params, opt):
            grads = jax.grad(lambda p: jnp.sum(p["w"] ** 2))(params)
            upd, opt = tx.update(grads, opt, params)
            return optax.apply_updates(params, upd), opt

        for _ in range(20):
            params, opt = step(params, opt)
        return np.asarray(params["w"])

    w32, wbf = run(None), run("bfloat16")
    assert np.all(np.abs(wbf) < 3.0)  # it optimizes
    np.testing.assert_allclose(wbf, w32, atol=5e-3)


def test_nu_dtype_recomposition_matches_optax():
    """The nu_dtype path recomposes adamw from _scale_by_adam_dtypes; with
    both moments left fp32 it must reproduce optax.adamw's trajectory
    exactly (same math, same bias correction, eps outside the sqrt), and
    with bf16 moments it must store both states in bf16 and still track."""
    import jax
    import jax.numpy as jnp
    import optax

    from alpro_tpu.train.optimizer import build_optimizer

    def run(mu_dtype, nu_dtype, force_custom):
        tx = build_optimizer(
            get_lr_schedule("constant", 1e-2, 100), grad_norm=1.0,
            weight_decay=1e-2, apply_weight_decay=True,
            mu_dtype=mu_dtype,
            # nu_dtype='float32' still routes through the custom transform
            nu_dtype=nu_dtype or ("float32" if force_custom else None),
        )
        params = {"w": jnp.linspace(-2.0, 3.0, 64), "bias": jnp.ones((4,))}
        opt = tx.init(params)
        if nu_dtype == "bfloat16":
            bf = [
                leaf for leaf in jax.tree_util.tree_leaves(opt)
                if hasattr(leaf, "dtype") and leaf.dtype == jnp.bfloat16
            ]
            # mu and nu for both params
            assert len(bf) >= 4, "second moment not stored in bf16"

        @jax.jit
        def step(params, opt):
            grads = jax.grad(
                lambda p: jnp.sum(p["w"] ** 2) + jnp.sum(jnp.sin(p["bias"]))
            )(params)
            upd, opt = tx.update(grads, opt, params)
            return optax.apply_updates(params, upd), opt

        for _ in range(25):
            params, opt = step(params, opt)
        return np.asarray(params["w"])

    ref = run(None, None, force_custom=False)      # pure optax.adamw
    same = run(None, None, force_custom=True)      # custom kernel, fp32
    np.testing.assert_allclose(same, ref, rtol=1e-6, atol=1e-7)

    wbf = run("bfloat16", "bfloat16", force_custom=True)
    assert np.all(np.abs(wbf) <= np.abs(ref) + 0.05)  # it optimizes
    np.testing.assert_allclose(wbf, ref, atol=2e-2)
