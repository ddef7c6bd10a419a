"""Selective rematerialization policies for per-block gradient checkpointing.

The reference's grad-ckpt (`src/utils/grad_ckpt.py:23-42`) is all-or-nothing:
the whole block forward is recomputed in backward. On TPU the recompute is
~1/3 of step FLOPs plus the temporal-relayout copies twice over, so we expose
jax.checkpoint *policies* that keep the memory win while skipping the most
expensive recompute:

- ``nothing``: `nothing_saveable` — the reference-equivalent full recompute.
- ``dots``: `dots_with_no_batch_dims_saveable` — every non-batched matmul
  output is kept; backward recomputes only elementwise/LN/reshape glue.
  Largest memory of the three (the MLP hidden and qkv blow-ups are saved).
- ``names``: `save_only_these_names` over the tags below — the two attention
  outputs per TimeSformer block (and the BERT attention context) are kept;
  scores/softmax/PV and the relayout copies are never recomputed, while the
  MLP hidden (the big buffer) still is. Cheapest targeted middle ground:
  one (B, T, N, D) bf16 residual per attention per block.
"""

from __future__ import annotations

import jax

# tag names used with jax.ad_checkpoint.checkpoint_name inside the blocks
TS_TEMPORAL_ATTN = "ts_temporal_attn_out"
TS_SPATIAL_ATTN = "ts_spatial_attn_out"
BERT_ATTN = "bert_attn_out"

SAVED_NAMES = (TS_TEMPORAL_ATTN, TS_SPATIAL_ATTN, BERT_ATTN)

REMAT_POLICIES = ("nothing", "dots", "dots_all", "dots_names", "names",
                  "dots_rng", "dots_ln", "dots_ln_offload", "dots_ln_names")

# LayerNorm per-row statistics (mean, raw variance) tagged in
# ops/layers.py::layernorm_apply — 1/D the activation size, so saving them
# is nearly free while removing the fp32 convert+reduce statistics pass
# from every backward recompute.
LN_STAT = "ln_stat"

# PRNG bit-generation primitives: their outputs are the dropout/droppath
# mask bits. Under a policy that doesn't save them, every backward re-runs
# the generators (visible in the train profile's elementwise fusions even
# with the cheap rbg impl).
_RNG_PRIMS = frozenset(
    ("rng_bit_generator", "threefry2x32", "random_bits", "random_fold_in")
)


def _rng_bits_saveable(prim, *_, **__):
    return getattr(prim, "name", None) in _RNG_PRIMS


def resolve_remat_policy(name: str):
    """Map a config string to a jax.checkpoint policy callable."""
    if name == "nothing":
        return jax.checkpoint_policies.nothing_saveable
    if name == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if name == "dots_rng":
        # dots ∪ PRNG bits: backward recompute never re-generates dropout
        # masks; costs one bits-array per dropout/droppath site per block
        return jax.checkpoint_policies.save_from_both_policies(
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            _rng_bits_saveable,
        )
    if name == "dots_ln":
        # dots ∪ LN statistics: backward recompute substitutes the saved
        # (rows, 1) mean / raw-variance instead of re-reducing the
        # fp32-converted activations — the statistics pass (not the
        # normalize multiply) is the slow-population cost of each LN site.
        return jax.checkpoint_policies.save_from_both_policies(
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            jax.checkpoint_policies.save_only_these_names(LN_STAT),
        )
    if name == "dots_ln_names":
        # dots_ln ∪ the tagged attention outputs. With the Pallas custom_vjp
        # attention kernels, this is the policy that stops the rematted
        # backward from re-running the kernel forward: the kernel's output
        # is saved by name and its bwd residual (the packed qkv) is a dot
        # output already saved by `dots`, so partial-eval DCEs the second
        # kernel launch entirely.
        return jax.checkpoint_policies.save_from_both_policies(
            resolve_remat_policy("dots_ln"),
            jax.checkpoint_policies.save_only_these_names(*SAVED_NAMES),
        )
    if name == "dots_ln_offload":
        # dots_ln, plus the per-block attention outputs moved to pinned HOST
        # memory instead of recomputed or held in HBM: the backward DMAs
        # them back, trading HBM residency for PCIe/offload traffic
        # (jax.checkpoint_policies.save_and_offload_only_these_names).
        offload = jax.checkpoint_policies.save_and_offload_only_these_names(
            names_which_can_be_saved=[],
            names_which_can_be_offloaded=list(SAVED_NAMES),
            offload_src="device", offload_dst="pinned_host",
        )
        base = resolve_remat_policy("dots_ln")

        def policy(prim, *args, **params):
            o = offload(prim, *args, **params)
            if not isinstance(o, bool) or o:
                return o  # Offloadable (or save) for the tagged names
            return base(prim, *args, **params)

        return policy
    if name == "dots_all":
        # every dot output incl. batched attention einsums — largest memory
        return jax.checkpoint_policies.dots_saveable
    if name == "dots_names":
        return jax.checkpoint_policies.save_from_both_policies(
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            jax.checkpoint_policies.save_only_these_names(*SAVED_NAMES),
        )
    if name == "names":
        return jax.checkpoint_policies.save_only_these_names(*SAVED_NAMES)
    raise ValueError(
        f"remat_policy must be one of {REMAT_POLICIES}, got {name!r}"
    )
