"""Optimizer + LR schedules (optax), matching the reference semantics.

Reference: HF-style AdamW with betas from config and eps 1e-6
(`/root/reference/src/optimization/adamw.py`, `optimization/utils.py:5-14`) —
note `setup_e2e_optimizer` never forwards `weight_decay`, so the reference
effectively trains with wd=0 regardless of the config value; we default to the
same behaviour (`apply_weight_decay=False`) with a correct masked-wd option
(no decay on biases / LayerNorm / embeddings) for those who want the config
honoured.

Schedules: warmup+linear decay / noam invsqrt / multi-step / constant,
numerically identical to `src/optimization/sched.py:8-47` including the 1e-8
floor safeguard.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax


# ---- schedules (value = multiplier * base_lr, evaluated per step) ---------
def warmup_linear(step, warmup_step, tot_step):
    warm = step / jnp.maximum(warmup_step, 1)
    lin = jnp.maximum(0.0, (tot_step - step) / jnp.maximum(tot_step - warmup_step, 1))
    return jnp.where(step < warmup_step, warm, lin)


def noam_schedule(step, warmup_step=4000):
    warm = step / jnp.maximum(warmup_step, 1)
    decay = (warmup_step ** 0.5) * jnp.maximum(step, 1) ** -0.5
    return jnp.where(step <= warmup_step, warm, decay)


def multi_step_schedule(n_epoch, milestones: Sequence[int], gamma=0.5):
    """Reference-exact (`sched.py:8-15`) including its quirk: past the last
    milestone the multiplier jumps to gamma^(len+1), skipping gamma^len.
    Traceable: works on python ints and on jnp scalars alike."""
    milestones = sorted(milestones)
    n_passed = sum(
        (jnp.asarray(n_epoch) >= m).astype(jnp.int32) for m in milestones
    ) if not isinstance(n_epoch, int) else sum(n_epoch >= m for m in milestones)
    n = len(milestones)
    exp = jnp.where(jnp.asarray(n_passed) == n, n + 1, n_passed)
    out = jnp.asarray(gamma, jnp.float32) ** exp.astype(jnp.float32)
    return float(out) if isinstance(n_epoch, int) else out


def get_lr_schedule(
    decay: str,
    learning_rate: float,
    num_train_steps: int,
    warmup_ratio: float = 0.1,
    decay_epochs: Sequence[int] = (),
    steps_per_epoch: int = 0,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """`decay='multi_step'` derives the epoch from the step counter exactly
    like the reference's per-step `n_epoch = batch*global_step/total_examples`
    recomputation (`run_video_retrieval.py:450-459`), so the schedule stays a
    pure function of the optimizer step and lives inside jit."""
    warmup_steps = int(warmup_ratio * num_train_steps)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        if decay == "linear":
            lr = learning_rate * warmup_linear(step, warmup_steps, num_train_steps)
        elif decay == "invsqrt":
            lr = learning_rate * noam_schedule(step, warmup_steps)
        elif decay == "constant":
            lr = jnp.asarray(learning_rate, jnp.float32)
        elif decay == "multi_step":
            assert steps_per_epoch > 0 and decay_epochs, (
                "multi_step decay needs steps_per_epoch and step_decay_epochs"
            )
            n_epoch = jnp.floor(step / steps_per_epoch).astype(jnp.int32)
            lr = learning_rate * multi_step_schedule(n_epoch, decay_epochs)
        else:
            raise ValueError(f"unknown decay {decay!r}")
        # reference safeguard: never emit lr <= 0 (`sched.py:44-46`)
        return jnp.maximum(lr, 1e-8)

    return sched


# ---- param projections ----------------------------------------------------
def project_temp(params, lo: float = 0.001, hi: float = 0.5):
    """In-place clamp of the contrastive temperature after each update,
    mirroring `self.temp.clamp_(0.001, 0.5)` (`alpro_models.py:80-81`)."""
    if "temp" in params:
        params = dict(params)
        params["temp"] = jnp.clip(params["temp"], lo, hi)
    return params


def _wd_mask(params) -> dict:
    """True where weight decay applies: 2D+ kernels/embeddings only — never
    biases, LayerNorm scales, cls/pos/time tokens, or the temperature."""

    def mask_leaf(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        joined = "/".join(str(n) for n in names)
        if any(
            k in joined
            for k in ("bias", "scale", "temp", "cls_token", "pos_embed", "time_embed")
        ):
            return False
        return jnp.ndim(leaf) >= 2

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def _scale_by_adam_dtypes(
    b1: float, b2: float, eps: float, mu_dtype=None, nu_dtype=None
) -> optax.GradientTransformation:
    """optax.scale_by_adam with independent storage dtypes for BOTH moments.

    optax only exposes ``mu_dtype``; the second moment is the other half of
    the optimizer-state HBM traffic (docs/PERF.md measured ~5.8 ms/step for
    the first moment alone on the flagship train step). Math matches optax:
    moments are updated in the gradient dtype (fp32 here), cast on store,
    upcast on read; bias correction divides by (1 - b^t) at count t.
    """
    mu_dtype = jnp.dtype(mu_dtype) if mu_dtype else None
    nu_dtype = jnp.dtype(nu_dtype) if nu_dtype else None

    def init_fn(params):
        mu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params
        )
        nu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=nu_dtype or p.dtype), params
        )
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu
        )

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)

        # Moment math runs at the wider of grad dtype and fp32 (optax promotes
        # too); never downcast the fp32 accumulator to a bf16 grad's dtype.
        def new_mu(g, m):
            ct = jnp.promote_types(g.dtype, jnp.float32)
            return b1 * m.astype(ct) + (1.0 - b1) * g.astype(ct)

        def new_nu(g, v):
            ct = jnp.promote_types(g.dtype, jnp.float32)
            return b2 * v.astype(ct) + (1.0 - b2) * jnp.square(g.astype(ct))

        mu = jax.tree_util.tree_map(new_mu, updates, state.mu)
        nu = jax.tree_util.tree_map(new_nu, updates, state.nu)
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        out = jax.tree_util.tree_map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu, nu
        )
        mu = jax.tree_util.tree_map(
            lambda m: m.astype(mu_dtype) if mu_dtype else m, mu
        )
        nu = jax.tree_util.tree_map(
            lambda v: v.astype(nu_dtype) if nu_dtype else v, nu
        )
        return out, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(
    learning_rate_schedule: Callable,
    betas=(0.9, 0.98),
    eps: float = 1e-6,
    weight_decay: float = 0.0,
    apply_weight_decay: bool = False,
    grad_norm: Optional[float] = None,
    accum_steps: int = 1,
    mu_dtype: Optional[str] = None,
    nu_dtype: Optional[str] = None,
) -> optax.GradientTransformation:
    """`accum_steps > 1` wraps in optax.MultiSteps: gradients average over k
    micro-batches before one optimizer update — the reference's
    gradient_accumulation_steps with delayed allreduce
    (`run_video_retrieval.py:438-447`); under GSPMD the grads psum every
    micro-step instead, which is equivalent math with more comm (acceptable:
    comm rides ICI and overlaps).

    `mu_dtype='bfloat16'` stores the AdamW first moment in bf16 (optax
    rounds on write, upcasts in the update): halves the m-state HBM
    footprint/traffic. `nu_dtype` is the same knob for the second moment
    (not offered by optax; routed through `_scale_by_adam_dtypes`) — more
    numerically delicate since sqrt(nu) sets the per-parameter step scale,
    so it stays a separate opt-in. Default None keeps fp32, matching the
    reference's fp32 optimizer state under apex O2 (`amp.initialize`,
    `run_video_retrieval.py:329-331`)."""
    txs = []
    if grad_norm is not None and grad_norm > 0:
        txs.append(optax.clip_by_global_norm(grad_norm))
    wd = weight_decay if apply_weight_decay else 0.0
    if nu_dtype:
        # optax.adamw == scale_by_adam ∘ add_decayed_weights ∘ -lr scaling;
        # recompose with the dtype-aware moments kernel.
        txs.append(_scale_by_adam_dtypes(
            betas[0], betas[1], eps, mu_dtype=mu_dtype, nu_dtype=nu_dtype,
        ))
        # Always include the decay transform (wd may be 0.0) so the opt_state
        # pytree structure matches optax.adamw regardless of the wd value —
        # keeps checkpoints interchangeable across the nu_dtype flag toggle
        # with wd=0 trees differing only in moment dtype.
        txs.append(optax.add_decayed_weights(wd, mask=_wd_mask))
        txs.append(optax.scale_by_learning_rate(learning_rate_schedule))
    else:
        txs.append(
            optax.adamw(
                learning_rate=learning_rate_schedule,
                b1=betas[0],
                b2=betas[1],
                eps=eps,
                weight_decay=wd,
                mask=_wd_mask if wd > 0 else None,
                mu_dtype=jnp.dtype(mu_dtype) if mu_dtype else None,
            )
        )
    tx = optax.chain(*txs)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx
