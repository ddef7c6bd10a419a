"""TimeSformer video encoder with divided space-time attention, TPU-native.

Re-designed (not translated) from the reference ViT-B/16 TimeSformer
(`/root/reference/src/modeling/timesformer/vit.py`). Differences in *shape
bookkeeping*, not math:

  * Internal token layout is (B, T, N, D) with the CLS token carried
    separately as (B, 1, D), instead of the reference's flattened patch-major
    (B, 1 + N·T, D) layout (`vit.py:136-213`). The per-block math — temporal
    attention over T at each patch location, spatial attention over 1+N per
    frame with the CLS replicated per frame and frame-averaged back, then MLP —
    is identical; tests/test_timesformer.py checks equivalence against an
    independent NumPy transcription of the flattened-layout algorithm.
  * Patch embedding is patch-extract + matmul (MXU-shaped) rather than a
    strided conv; the converted conv kernel is bit-identical
    (`checkpoint/torch_convert.py`).
  * Input is channels-last (B, T, H, W, C) — the TPU-preferred layout — vs the
    reference's (B, C, T, H, W).

Parity-relevant reference details preserved:
  * the shared CLS init token is cls_token + pos_embed[0] (`vit.py:321-347`:
    every (b, t) CLS row is identical before the first block, so the reference
    keeping "the first B rows" equals keeping one CLS per sample);
  * spatial/temporal position embeddings are nearest-interpolated at call time
    when the input geometry differs from the trained one (`vit.py:328-361`);
  * the final LayerNorm runs *before* temporal pooling (`vit.py:372` then
    `vit.py:475-503`);
  * stochastic-depth rates follow linspace(0, drop_path_rate, depth)
    (`vit.py:272-273`), with per-(b·n) masks in temporal attention, per-(b·t)
    masks in spatial attention and per-b masks for the MLP, matching the
    reference's reshaped-batch DropPath.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from alpro_tpu.ops.layers import LayerNorm, Mlp


@dataclasses.dataclass(frozen=True)
class TimeSformerConfig:
    img_size: int = 224
    patch_size: int = 16
    num_frames: int = 8
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    ln_eps: float = 1e-6
    # spatial attention lowering: 'auto' (TPU → 'fused_qkv', else 'xla') |
    # 'xla' (bshd einsum) | 'fused_qkv' (packed-qkv Pallas kernel,
    # ops/pallas_qkv_attn.py — consumes the qkv projection output directly,
    # no head-split copies or sequence pads; in-model embed 103.3 → 90.8
    # ms/batch on v5e) | 'pallas' (per-head kernel, pallas_attn.py, slower)
    attn_impl: str = "auto"
    # temporal attention lowering: 'auto' (TPU → 'fused_qkv', else 'xla') |
    # 'xla' (relayout to (B·N, T, D) + einsum) | 'fused_qkv' (packed-qkv
    # δ-roll Pallas kernel in the native (B, T, N, 3D) layout — no relayouts
    # and no tile-padded (T, T) score buffers; in-model embed 103.3 → 89.0
    # ms/batch on v5e) | 'circulant'/'packed' (XLA variants, measured slower,
    # kept as records — docs/PERF.md) | 'fused_ln_qkv' (block-level: LN rides
    # the qkv matmul + folded proj·temporal_fc; measured slower in-model than
    # 'fused_qkv' — kept as a record)
    temporal_attn_impl: str = "auto"
    # block-tail lowering: 'auto' (TPU + deterministic → 'fused', else
    # 'xla') | 'xla' | 'fused' (LN→fc1→GELU→fc2→residual in one Pallas
    # kernel, one HBM round-trip — ops/pallas_ln_mlp.py)
    mlp_impl: str = "auto"
    # 'divided_space_time' (ALPRO default) | 'joint_space_time' | 'space_only'
    # (`vit.py:110-111,140-143`)
    attention_type: str = "divided_space_time"
    # uint8 inputs normalize inside the model with these stats (CLIP defaults,
    # `config_release/*.json` img_pixel_mean/std)
    pixel_mean: tuple = (0.48145466, 0.4578275, 0.40821073)
    pixel_std: tuple = (0.26862954, 0.26130258, 0.27577711)
    # fuse normalize+patchify+embed into one Pallas kernel for uint8 inputs.
    # Only 'on' enables it; 'auto' currently resolves to the XLA path (the
    # fused kernel crashes the compiler at some shapes — docs/PARITY.md).
    fused_patchify: str = "auto"
    # fold the uint8 /255-mean/std normalization into the patch-embed matmul:
    # (v·a) @ W + (c @ W + b) with per-column a, c constants — the patchify
    # relayout then moves 1-byte uint8 instead of 4-byte fp32 (4× less copy
    # traffic) and the separate normalize pass disappears into the embed dot.
    # 'auto' → on for bf16 compute (uint8 0–255 is exact in bf16; fp32 keeps
    # the literal normalize-then-matmul order so parity tests stay bit-stable)
    # | 'on' | 'off'. Mathematically identical (all-linear), differs only in
    # float association.
    fold_uint8_norm: str = "auto"
    # rematerialize each block on the backward pass (the reference's
    # per-block CheckpointFunction, `src/utils/grad_ckpt.py:23-42` used at
    # `timesformer/vit.py:150-208`); on TPU this trades HBM for FLOPs
    gradient_checkpointing: bool = False
    # what the remat keeps: 'nothing' (full recompute, reference-equivalent)
    # | 'dots' (keep matmul outputs) | 'names' (keep the two attention
    # outputs per block — see models/remat.py for the measured trade-offs)
    remat_policy: str = "nothing"
    # lax.scan over the block stack instead of a 12×-unrolled python loop:
    # one compiled block body → ~12× smaller HLO and much faster compiles
    # (this sandbox's remote-compile relay rejects oversized payloads —
    # docs/PERF.md). Changes the param tree (blocks_{i}/* → blocks/block/*
    # stacked on axis 0); convert with `models.scan_utils.stack_block_params`.
    scan_blocks: bool = False
    # sequence-parallel long-video mode: name of the mesh axis the temporal
    # attention's frame dim is sharded over (the 2D dp×sp layout,
    # `core/mesh.py::axis_names_for_shape`). Implemented as a GSPMD sharding
    # constraint on the (B·N, T, D) relayout — XLA inserts the K/V
    # all-gather, exactly the `parallel/seq_parallel.py` schedule — and only
    # active when a mesh carrying the axis is ambient at trace time
    # (`core.mesh.maybe_shard_axis`); otherwise compiles unchanged. No
    # reference counterpart (SURVEY.md §2.10: the reference replicates T).
    sp_axis: Optional[str] = None

    @property
    def patches_per_side(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.patches_per_side ** 2

    @classmethod
    def from_reference_cfg(cls, video_enc_cfg: dict, img_size: int, num_frm: int):
        """Build from a `config_release/timesformer_*.json`-style dict."""
        return cls(
            img_size=img_size,
            patch_size=video_enc_cfg.get("patch_size", 16),
            num_frames=num_frm,
            drop_rate=video_enc_cfg.get("drop_rate", 0.0),
            attn_drop_rate=video_enc_cfg.get("attn_drop_rate", 0.0),
            drop_path_rate=video_enc_cfg.get("drop_path_rate", 0.1),
            gradient_checkpointing=bool(
                video_enc_cfg.get("gradient_checkpointing", False)
            ),
        )


def _nearest_resize_1d(x: jnp.ndarray, new_len: int) -> jnp.ndarray:
    """Nearest interp along axis 1 of (1, L, D) with torch F.interpolate
    semantics: idx = floor(i * L / new_len) (`helpers.py:370-375`)."""
    old_len = x.shape[1]
    idx = jnp.floor(jnp.arange(new_len) * (old_len / new_len)).astype(jnp.int32)
    return jnp.take(x, idx, axis=1)


def _nearest_resize_2d(x: jnp.ndarray, new_h: int, new_w: int) -> jnp.ndarray:
    """Nearest interp of (1, P, P, D) grid → (1, new_h, new_w, D)
    (`vit.py:328-342` runtime spatial resize)."""
    old_h, old_w = x.shape[1], x.shape[2]
    idx_h = jnp.floor(jnp.arange(new_h) * (old_h / new_h)).astype(jnp.int32)
    idx_w = jnp.floor(jnp.arange(new_w) * (old_w / new_w)).astype(jnp.int32)
    return jnp.take(jnp.take(x, idx_h, axis=1), idx_w, axis=2)


class VitAttention(nn.Module):
    """qkv-fused projection attention (checkpoint layout: one (3D, D) qkv)."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32
    attn_drop_rate: float = 0.0
    proj_drop_rate: float = 0.0
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        from alpro_tpu.ops.attention import _on_tpu, multi_head_attention_bshd

        B, S, D = x.shape
        head_dim = D // self.num_heads
        init = nn.initializers.truncated_normal(0.02)
        qkv = nn.Dense(3 * D, dtype=self.dtype, kernel_init=init, name="qkv")(x)
        use_dropout = self.attn_drop_rate > 0.0 and not deterministic
        impl = self.attn_impl
        if impl == "auto":
            # measured in-model on v5e (docs/PERF.md round 2): the packed-qkv
            # kernel takes the full embed 103.3 → 90.8 ms/batch; S bound keeps
            # the in-VMEM (S, S) fp32 score tile comfortably on-chip.
            # Deterministic-only: under training the custom_vjp's stacked qkv
            # residuals exceeded HBM at flagship batch (measured OOM by 0.5 G)
            # — training keeps XLA unless 'fused_qkv' is set explicitly.
            impl = (
                "fused_qkv"
                if (_on_tpu() and S <= 640 and deterministic)
                else "xla"
            )
        if impl == "fused_qkv" and (
            use_dropout or (_on_tpu() and (D % 128 != 0 or 128 % head_dim != 0))
        ):
            impl = "xla"  # kernel supports neither attn-dropout nor odd dims
        if impl == "fused_qkv":
            # packed-qkv kernel: consumes the projection output directly —
            # no head-split slicing copies, no sequence pads, scores never
            # leave VMEM (ops/pallas_qkv_attn.py)
            from alpro_tpu.ops.pallas_qkv_attn import fused_attention_qkv

            out = fused_attention_qkv(qkv, self.num_heads)
        else:
            qkv = qkv.reshape(B, S, 3, self.num_heads, head_dim)
            drng = self.make_rng("dropout") if use_dropout else None
            out = multi_head_attention_bshd(
                qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2],
                impl=impl,
                dropout_rate=self.attn_drop_rate,
                dropout_rng=drng,
                deterministic=deterministic,
            )
            out = out.reshape(B, S, D)
        out = nn.Dense(D, dtype=self.dtype, kernel_init=init, name="proj")(out)
        out = nn.Dropout(self.proj_drop_rate)(out, deterministic=deterministic)
        return out


class TemporalNativeLayoutAttention(nn.Module):
    """Temporal attention over T in the native (B, T, N, D) layout —
    parameter-compatible with `VitAttention` (same qkv/proj Dense names and
    shapes, so checkpoints are interchangeable with the relayout+einsum
    path). `impl`: 'fused_qkv' (packed-qkv δ-roll Pallas kernel — the fast
    path on TPU, ops/pallas_qkv_attn.py), 'packed' (MXU-packed
    block-diagonal tiles) or 'circulant' (δ-roll identity in XLA; both
    measured slower, kept as records)."""

    num_heads: int
    impl: str = "packed"
    dtype: jnp.dtype = jnp.float32
    proj_drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        from alpro_tpu.ops.pallas_temporal_attn import (
            temporal_attention_circulant,
            temporal_attention_packed,
        )

        D = x.shape[-1]
        init = nn.initializers.truncated_normal(0.02)
        qkv = nn.Dense(3 * D, dtype=self.dtype, kernel_init=init, name="qkv")(x)
        if self.impl == "fused_qkv":
            from alpro_tpu.ops.pallas_qkv_attn import (
                fused_temporal_attention_qkv,
            )

            out = fused_temporal_attention_qkv(qkv, self.num_heads)
        elif self.impl == "packed":
            out = temporal_attention_packed(qkv, self.num_heads)
        else:
            out = temporal_attention_circulant(qkv, self.num_heads)
        out = nn.Dense(D, dtype=self.dtype, kernel_init=init, name="proj")(out)
        return nn.Dropout(self.proj_drop_rate)(out, deterministic=deterministic)


def _temporal_auto_impl(T, D, num_heads, deterministic, sp_axis,
                        on_tpu) -> str:
    """Resolve temporal_attn_impl='auto' — measured on v5e (docs/PERF.md):
    the packed-qkv δ-roll kernel with the folded proj·temporal_fc output
    matmul is the serving winner (68.7 → 66.8 ms/batch over plain
    fused_qkv). Constraints that force the XLA relayout+einsum path:

    * T > 8 — on merit: the kernel is legal at any T (the patch axis is
      N-blocked to stay inside the scoped-vmem envelope —
      `pallas_qkv_attn._temporal_n_block`), but its δ-band VPU work scales
      with T², so at the QA config's T=16 it measured 8.39 ms vs XLA's
      7.27 ms standalone (B=16, round 4 — docs/PERF.md);
    * training (`not deterministic`) — no attention-dropout path, and the
      custom_vjp residuals OOM at flagship batch (docs/PERF.md);
    * lane-illegal dims (D % 128, head_dim not a 128 divisor);
    * sp sharding — the sp mesh axis shards T via the XLA path.
    """
    ok = (
        on_tpu
        and T <= 8
        and D % 128 == 0
        and 128 % (D // num_heads) == 0
        and deterministic
        and not sp_axis
    )
    return "fused_qkv_fold" if ok else "xla"


class DividedSTBlock(nn.Module):
    """One divided space-time block operating on (cls (B,1,D), x (B,T,N,D))."""

    cfg: TimeSformerConfig
    drop_path: float
    dtype: jnp.dtype = jnp.float32
    # reference init zeroes temporal_fc for every block except the first
    # (`vit.py:289-298`)
    zero_temporal_fc: bool = False

    def _drop_path(self, value, mask_shape, deterministic, rate=None):
        rate = self.drop_path if rate is None else rate
        if deterministic or (isinstance(rate, float) and rate == 0.0):
            return value
        keep_prob = 1.0 - rate  # rate may be a traced scalar under nn.scan
        keep = jax.random.bernoulli(
            self.make_rng("droppath"), keep_prob, mask_shape
        )
        return value * keep.astype(value.dtype) / jnp.asarray(
            keep_prob, value.dtype
        )

    @nn.compact
    def __call__(self, cls, x, deterministic: bool = True, drop_path_rate=None):
        """drop_path_rate: optional traced override of the static
        `drop_path` attribute — used by the scanned-blocks path, where the
        per-block stochastic-depth rate is a scan input."""
        dp_rate = self.drop_path if drop_path_rate is None else drop_path_rate
        cfg = self.cfg
        B, T, N, D = x.shape

        # ---- temporal attention over T at each patch location ----
        t_impl = cfg.temporal_attn_impl
        if t_impl == "auto":
            from alpro_tpu.ops.attention import _on_tpu

            t_impl = _temporal_auto_impl(
                T, D, cfg.num_heads, deterministic, cfg.sp_axis, _on_tpu()
            )
        if (
            t_impl
            in ("fused_ln_qkv", "fused_block", "fused_qkv_fold", "fused_qkv_proj")
            and deterministic
        ):
            # fully fused serving path: temporal_norm1 rides the qkv matmul
            # (fused_ln_matmul), attention stays in VMEM (packed-qkv δ-roll
            # kernel), and proj→temporal_fc — two back-to-back (D, D)
            # matmuls with no nonlinearity between — fold into one:
            # (a·Wp + bp)·Wt + bt = a·(Wp Wt) + (bp Wt + bt).
            from alpro_tpu.ops.layers import AttnParams, DenseParams, LNParams
            from alpro_tpu.ops.pallas_ln_mlp import fused_ln_matmul
            from alpro_tpu.ops.pallas_qkv_attn import (
                fused_temporal_attention_qkv,
            )

            ln_s, ln_b = LNParams(name="temporal_norm1")(D)
            (qkv_k, qkv_b), (proj_k, proj_b) = AttnParams(name="temporal_attn")(D)
            tfc_k, tfc_b = DenseParams(
                D, zero_kernel=self.zero_temporal_fc, name="temporal_fc"
            )(D)
            wp = proj_k.astype(self.dtype)
            wt = tfc_k.astype(self.dtype)
            w_eff = jnp.dot(wp, wt)
            b_eff = jnp.dot(proj_b.astype(self.dtype), wt) + tfc_b.astype(
                self.dtype
            )
            if t_impl == "fused_block":
                # whole-chain mega-kernel: qkv never leaves VMEM. Mosaic
                # needs the N-block dim divisible by 8 — N=196 has no such
                # divisor ≤64 and the full-N block overflows VMEM, so pad N
                # to the next multiple of 8 (196→200 ⇒ Nt=40). Temporal
                # attention never mixes across N and LN is per-token, so pad
                # locations are garbage-in/garbage-out and slice away clean.
                from alpro_tpu.ops.pallas_fused_block import (
                    fused_temporal_block,
                )

                Np = -(-N // 8) * 8
                xin = x
                if Np != N and jax.default_backend() == "tpu":
                    xin = jnp.pad(x, ((0, 0), (0, 0), (0, Np - N), (0, 0)))
                xout = fused_temporal_block(
                    xin, ln_s, ln_b,
                    qkv_k.astype(self.dtype), qkv_b.astype(self.dtype),
                    w_eff, b_eff, cfg.num_heads, eps=cfg.ln_eps,
                )
                x = xout[:, :, :N, :] if xin is not x else xout
            elif t_impl == "fused_qkv_proj":
                # XLA LN + qkv matmul; attention + folded projection in one
                # kernel taking the full-width qkv block (contiguous reads,
                # in-kernel head windows, fp32 partial accumulation). N pads
                # to a multiple of 8 for Mosaic block tiling.
                from alpro_tpu.ops.layers import layernorm_apply
                from alpro_tpu.ops.pallas_qkv_attn import (
                    fused_temporal_attention_qkv_proj,
                )

                xt = layernorm_apply(x, ln_s, ln_b, cfg.ln_eps, self.dtype)
                Np = -(-N // 8) * 8
                if Np != N and jax.default_backend() == "tpu":
                    xt = jnp.pad(
                        xt, ((0, 0), (0, 0), (0, Np - N), (0, 0))
                    )
                qkv = (
                    jnp.dot(xt, qkv_k.astype(self.dtype))
                    + qkv_b.astype(self.dtype)
                )
                y = fused_temporal_attention_qkv_proj(
                    qkv, w_eff, b_eff, cfg.num_heads
                )
                x = x + y[:, :, :N, :].astype(x.dtype)
            else:
                if t_impl == "fused_qkv_fold":
                    # XLA LN + XLA qkv matmul (both measured faster than the
                    # ln_matmul kernel), folded output projection
                    from alpro_tpu.ops.layers import layernorm_apply

                    xt = layernorm_apply(x, ln_s, ln_b, cfg.ln_eps, self.dtype)
                    qkv = (
                        jnp.dot(xt, qkv_k.astype(self.dtype))
                        + qkv_b.astype(self.dtype)
                    )
                else:
                    qkv = fused_ln_matmul(
                        x, ln_s, ln_b,
                        qkv_k.astype(self.dtype), qkv_b.astype(self.dtype),
                        eps=cfg.ln_eps,
                    )
                t_att = fused_temporal_attention_qkv(qkv, cfg.num_heads)
                x = x + (jnp.dot(t_att, w_eff) + b_eff).astype(x.dtype)
            t_fused_done = True
        else:
            t_fused_done = False
        if t_fused_done:
            pass
        elif t_impl in (
            "circulant", "packed", "fused_qkv", "fused_ln_qkv", "fused_block",
            "fused_qkv_fold", "fused_qkv_proj",
        ):
            xt = LayerNorm(cfg.ln_eps, dtype=self.dtype, name="temporal_norm1")(x)
            t_out = TemporalNativeLayoutAttention(
                cfg.num_heads,
                impl=(
                    "fused_qkv"
                    if t_impl in (
                        "fused_ln_qkv", "fused_block", "fused_qkv_fold",
                        "fused_qkv_proj",
                    )
                    else t_impl
                ),
                dtype=self.dtype,
                proj_drop_rate=cfg.drop_rate, name="temporal_attn",
            )(xt, deterministic)  # (B, T, N, D), no relayout
        else:
            xt = LayerNorm(cfg.ln_eps, dtype=self.dtype, name="temporal_norm1")(x)
            xt = jnp.moveaxis(xt, 1, 2).reshape(B * N, T, D)
            if cfg.sp_axis:
                # long-video sequence parallelism: frame axis sharded over
                # the sp mesh axis; GSPMD all-gathers K/V inside the
                # attention (no-op without an ambient sp mesh)
                from alpro_tpu.core.mesh import maybe_shard_axis

                xt = maybe_shard_axis(xt, cfg.sp_axis, 1)
            t_out = VitAttention(
                cfg.num_heads,
                dtype=self.dtype,
                attn_drop_rate=cfg.attn_drop_rate,
                proj_drop_rate=cfg.drop_rate,
                attn_impl="xla",  # T <= 16: too small for the fused kernel
                name="temporal_attn",
            )(xt, deterministic)
            if cfg.sp_axis:
                from alpro_tpu.core.mesh import maybe_shard_axis

                t_out = maybe_shard_axis(t_out, cfg.sp_axis, 1)
            t_out = jnp.moveaxis(t_out.reshape(B, N, T, D), 1, 2)  # (B, T, N, D)
        if not t_fused_done:
            # remat tag: with remat_policy='names' the backward pass reuses
            # this (B, T, N, D) residual instead of recomputing the temporal
            # attention (and its relayout copies) — models/remat.py
            t_out = checkpoint_name(
                t_out, "ts_temporal_attn_out"
            )
            t_out = self._drop_path(t_out, (B, 1, N, 1), deterministic, dp_rate)
            t_out = nn.Dense(
                D, dtype=self.dtype,
                kernel_init=(
                    nn.initializers.zeros if self.zero_temporal_fc
                    else nn.initializers.truncated_normal(0.02)
                ),
                name="temporal_fc",
            )(t_out)
            x = x + t_out

        # ---- spatial attention over (1 + N) per frame ----
        # 'auto' resolution lives in VitAttention (single source of truth);
        # the block-level branches below trigger only on explicit impl
        # values. 'cls_sideband' (kernel takes the shared CLS row as a
        # sideband input — no (B,T,1+N,D) concat, no offset-1 slice, cls
        # proj once per sample) measured BELOW the concat default in-model
        # (241.8 v2 / 232.7 v1 vs 253.2 clips/s, docs/PERF.md round 3): the
        # extra per-cell input streams and second output cost more than the
        # removed concat/slice. Kept as a tested opt-in.
        s_impl = cfg.attn_impl
        if s_impl == "cls_sideband" and deterministic:
            from alpro_tpu.ops.layers import AttnParams, LNParams, layernorm_apply
            from alpro_tpu.ops.pallas_qkv_attn import fused_attention_qkv_cls

            ln_s, ln_b = LNParams(name="norm1")(D)
            (qkv_k, qkv_b), (proj_k, proj_b) = AttnParams(name="attn")(D)
            wk = qkv_k.astype(self.dtype)
            wb = qkv_b.astype(self.dtype)
            xn = layernorm_apply(x, ln_s, ln_b, cfg.ln_eps, self.dtype)
            cn = layernorm_apply(cls, ln_s, ln_b, cfg.ln_eps, self.dtype)
            qkv_x = (jnp.dot(xn, wk) + wb).reshape(B * T, N, 3 * D)
            qkv_c = jnp.dot(cn, wk) + wb  # (B, 1, 3D)
            att_x, att_c = fused_attention_qkv_cls(
                qkv_x, qkv_c, cfg.num_heads, T
            )
            wp = proj_k.astype(self.dtype)
            bp = proj_b.astype(self.dtype)
            s_x = (jnp.dot(att_x, wp) + bp).astype(x.dtype)
            # mean over frames commutes with the linear proj; droppath is
            # identity on this deterministic path (reference tail:
            # `vit.py:165-208` — proj per frame, then mean over T for cls)
            c_mean = jnp.mean(
                att_c.reshape(B, T, D).astype(jnp.float32), axis=1,
                keepdims=True,
            ).astype(self.dtype)
            x = x + s_x.reshape(B, T, N, D)
            cls = cls + (jnp.dot(c_mean, wp) + bp).astype(cls.dtype)
            return self._mlp_tail(cls, x, deterministic, dp_rate)
        cls_rep = jnp.broadcast_to(cls[:, None, :, :], (B, T, 1, D)).astype(
            x.dtype
        )
        xs = jnp.concatenate([cls_rep, x], axis=2)  # (B, T, 1+N, D)
        if (
            s_impl in ("fused_ln_qkv", "fused_block", "fused_qkv_proj")
            and deterministic
        ):
            # fused serving path: norm1 rides the qkv matmul, packed-qkv
            # attention, then the proj matmul
            from alpro_tpu.ops.layers import AttnParams, LNParams

            ln_s, ln_b = LNParams(name="norm1")(D)
            (qkv_k, qkv_b), (proj_k, proj_b) = AttnParams(name="attn")(D)
            if s_impl == "fused_qkv_proj":
                # XLA LN + qkv matmul; attention + projection in one kernel
                # taking the full-width qkv block (contiguous reads)
                from alpro_tpu.ops.layers import layernorm_apply
                from alpro_tpu.ops.pallas_qkv_attn import (
                    fused_attention_qkv_proj,
                )

                xs_n = layernorm_apply(xs, ln_s, ln_b, cfg.ln_eps, self.dtype)
                qkv_s = (
                    jnp.dot(xs_n, qkv_k.astype(self.dtype))
                    + qkv_b.astype(self.dtype)
                ).reshape(B * T, 1 + N, 3 * D)
                s_out = fused_attention_qkv_proj(
                    qkv_s, proj_k.astype(self.dtype),
                    proj_b.astype(self.dtype), cfg.num_heads,
                ).reshape(B, T, 1 + N, D).astype(x.dtype)
            elif s_impl == "fused_block":
                # whole-chain mega-kernel: qkv never leaves VMEM
                from alpro_tpu.ops.pallas_fused_block import (
                    fused_spatial_block,
                )

                s_out = fused_spatial_block(
                    xs.reshape(B * T, 1 + N, D), ln_s, ln_b,
                    qkv_k.astype(self.dtype), qkv_b.astype(self.dtype),
                    proj_k.astype(self.dtype), proj_b.astype(self.dtype),
                    cfg.num_heads, eps=cfg.ln_eps, residual=False,
                ).reshape(B, T, 1 + N, D)
            else:
                from alpro_tpu.ops.pallas_ln_mlp import fused_ln_matmul
                from alpro_tpu.ops.pallas_qkv_attn import fused_attention_qkv

                qkv_s = fused_ln_matmul(
                    xs, ln_s, ln_b,
                    qkv_k.astype(self.dtype), qkv_b.astype(self.dtype),
                    eps=cfg.ln_eps,
                )
                s_att = fused_attention_qkv(
                    qkv_s.reshape(B * T, 1 + N, 3 * D), cfg.num_heads
                )
                s_out = jnp.dot(
                    s_att, proj_k.astype(self.dtype)
                ) + proj_b.astype(self.dtype)
                s_out = s_out.astype(x.dtype).reshape(B, T, 1 + N, D)
        else:
            xs_n = LayerNorm(cfg.ln_eps, dtype=self.dtype, name="norm1")(xs)
            s_out = VitAttention(
                cfg.num_heads,
                dtype=self.dtype,
                attn_drop_rate=cfg.attn_drop_rate,
                proj_drop_rate=cfg.drop_rate,
                attn_impl=(
                    "fused_qkv"
                    if s_impl in ("fused_ln_qkv", "fused_block", "fused_qkv_proj")
                    # explicit cls_sideband under training: the kernel is
                    # deterministic-only, so defer to VitAttention's auto
                    else ("auto" if s_impl == "cls_sideband" else s_impl)
                ),
                name="attn",
            )(xs_n.reshape(B * T, 1 + N, D), deterministic)
            s_out = s_out.reshape(B, T, 1 + N, D)
        s_out = checkpoint_name(s_out, "ts_spatial_attn_out")
        s_out = self._drop_path(s_out, (B, T, 1, 1), deterministic, dp_rate)
        cls_res = jnp.mean(s_out[:, :, 0, :], axis=1, keepdims=True)  # (B,1,D)
        x = x + s_out[:, :, 1:, :]
        cls = cls + cls_res
        return self._mlp_tail(cls, x, deterministic, dp_rate)

    def _mlp_tail(self, cls, x, deterministic, dp_rate):
        """---- MLP (pointwise; shared per-sample droppath mask) ----"""
        cfg = self.cfg
        B, T, N, D = x.shape
        hidden = int(D * cfg.mlp_ratio)
        mlp_impl = cfg.mlp_impl
        if mlp_impl == "auto":
            # fused LN→MLP→residual kernel: one HBM round-trip for the whole
            # block tail (docs/PERF.md round 2 — the LN convert+reduce and
            # the materialized GELU hidden are slow-path traffic XLA keeps).
            # Deterministic-only: dropout/droppath live on the XLA path.
            from alpro_tpu.ops.attention import _on_tpu

            mlp_impl = (
                "fused"
                if (
                    _on_tpu() and deterministic
                    and D % 128 == 0 and hidden % 128 == 0
                )
                else "xla"
            )
        if mlp_impl == "fused" and deterministic:
            # deterministic-only (like every fused path): the kernel has no
            # dropout/droppath; explicit 'fused' under training falls back to
            # the module path rather than silently dropping regularization
            from alpro_tpu.ops.layers import LNParams, MlpParams
            from alpro_tpu.ops.pallas_ln_mlp import fused_ln_mlp

            # parameter twins: identical tree to the LayerNorm("norm2") /
            # Mlp("mlp") modules of the XLA branch, so checkpoints and init
            # are interchangeable between impls
            scale, bias = LNParams(name="norm2")(D)
            (k1, b1), (k2, b2) = MlpParams(hidden, name="mlp")(D)
            # two calls instead of concat([cls_rows, x_rows]): the reshape of
            # the contiguous (B,T,N,D) carry is free, so the patch rows reach
            # the kernel with no copy; the B cls rows ride a tiny padded
            # block. Removes one full-tensor concat write per block
            # (docs/PERF.md round 3); per-row math unchanged.
            kw = dict(
                w1=k1.astype(self.dtype), b1=b1.astype(self.dtype),
                w2=k2.astype(self.dtype), b2=b2.astype(self.dtype),
            )
            x = fused_ln_mlp(
                x.reshape(B * T * N, D), scale, bias,
                kw["w1"], kw["b1"], kw["w2"], kw["b2"], eps=cfg.ln_eps,
            ).reshape(B, T, N, D)
            cls = fused_ln_mlp(
                cls.reshape(B, D), scale, bias,
                kw["w1"], kw["b1"], kw["w2"], kw["b2"], eps=cfg.ln_eps,
            ).reshape(B, 1, D)
            return cls, x
        norm2 = LayerNorm(cfg.ln_eps, dtype=self.dtype, name="norm2")
        mlp = Mlp(
            hidden,
            dropout_rate=cfg.drop_rate,
            dtype=self.dtype,
            name="mlp",
        )
        y_cls = norm2(cls)
        y_x = norm2(x)
        mlp_cls = mlp(y_cls, deterministic)
        mlp_x = mlp(y_x, deterministic)
        if not deterministic and not (
            isinstance(dp_rate, float) and dp_rate == 0.0
        ):
            keep_prob = 1.0 - dp_rate
            keep = jax.random.bernoulli(
                self.make_rng("droppath"), keep_prob, (B, 1, 1)
            ).astype(x.dtype) / jnp.asarray(keep_prob, x.dtype)
            mlp_cls = mlp_cls * keep
            mlp_x = mlp_x * keep[:, :, None, :]
        cls = cls + mlp_cls
        x = x + mlp_x
        return cls, x


class _ScanDividedBlock(nn.Module):
    """Scan body wrapping one DividedSTBlock under the fixed name 'block'.

    Under nn.scan the per-block stochastic-depth rate arrives as a traced
    scan input; `zero_temporal_fc=True` uniformly (the reference zeroes it
    for every block except the first — a from-scratch-init-only difference;
    the CLI init path initializes the unrolled model and stacks, preserving
    the reference init exactly, see `scan_utils.stack_block_params`)."""

    cfg: TimeSformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, dpr, deterministic):
        cls, x = carry
        cls, x = DividedSTBlock(
            self.cfg, drop_path=0.0, dtype=self.dtype,
            zero_temporal_fc=True, name="block",
        )(cls, x, deterministic, drop_path_rate=dpr)
        return (cls, x), None


class JointBlock(nn.Module):
    """Plain pre-norm ViT block over the full token sequence — used for the
    joint_space_time and space_only attention variants (`vit.py:140-143`)."""

    cfg: TimeSformerConfig
    drop_path: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y, deterministic: bool = True):
        cfg = self.cfg

        def dp(v):
            if deterministic or self.drop_path == 0.0:
                return v
            keep_prob = 1.0 - self.drop_path
            keep = jax.random.bernoulli(
                self.make_rng("droppath"), keep_prob,
                (v.shape[0],) + (1,) * (v.ndim - 1),
            )
            return v * keep.astype(v.dtype) / keep_prob

        a = VitAttention(
            cfg.num_heads, dtype=self.dtype,
            attn_drop_rate=cfg.attn_drop_rate, proj_drop_rate=cfg.drop_rate,
            attn_impl=cfg.attn_impl, name="attn",
        )(LayerNorm(cfg.ln_eps, dtype=self.dtype, name="norm1")(y), deterministic)
        y = y + dp(a)
        m = Mlp(
            int(y.shape[-1] * cfg.mlp_ratio), dropout_rate=cfg.drop_rate,
            dtype=self.dtype, name="mlp",
        )(LayerNorm(cfg.ln_eps, dtype=self.dtype, name="norm2")(y), deterministic)
        return y + dp(m)


class PatchEmbed(nn.Module):
    """Patch embedding with two input paths sharing one (p·p·C, D) kernel:
    pre-extracted patch vectors (XLA), or raw uint8 frames through the fused
    normalize+patchify+matmul Pallas kernel."""

    cfg: TimeSformerConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        K = cfg.patch_size * cfg.patch_size * 3
        self.kernel = self.param(
            "kernel", nn.initializers.truncated_normal(0.02),
            (K, cfg.embed_dim),
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (cfg.embed_dim,)
        )

    def __call__(self, patches: jnp.ndarray, uint8_norm: bool = False) -> jnp.ndarray:
        if uint8_norm:
            # fold the /255-mean/std normalize into the embed matmul: with
            # per-column a_k = 1/(255·std_{k%C}), c_k = -mean_{k%C}/std_{k%C},
            #   norm(v) @ W + b = v @ (a ⊙ W) + (c @ W + b).
            # Patch columns are (ph, pw, c)-ordered, so column k ↔ channel
            # k % C (same layout as the reference's strided conv kernel).
            cfg = self.cfg
            p = cfg.patch_size
            mean = jnp.asarray(cfg.pixel_mean, jnp.float32)
            std = jnp.asarray(cfg.pixel_std, jnp.float32)
            a = jnp.tile(1.0 / (255.0 * std), p * p)  # (K,)
            c = jnp.tile(-mean / std, p * p)
            w_eff = (self.kernel * a[:, None]).astype(self.dtype)
            b_eff = (self.bias + c @ self.kernel).astype(self.dtype)
            return patches.astype(self.dtype) @ w_eff + b_eff
        out = patches.astype(self.dtype) @ self.kernel.astype(self.dtype)
        return out + self.bias.astype(self.dtype)

    def fused(self, raw_uint8: jnp.ndarray) -> jnp.ndarray:
        from alpro_tpu.ops.pallas_preprocess import fused_patchify_embed

        return fused_patchify_embed(
            raw_uint8,
            self.kernel.astype(self.dtype),
            self.bias.astype(self.dtype),
            tuple(self.cfg.pixel_mean),
            tuple(self.cfg.pixel_std),
        )


class TimeSformer(nn.Module):
    cfg: TimeSformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        pixels: jnp.ndarray,
        pooling: str = "temporal",
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """pixels — one of:
          * (B, T, H, W, C) uint8 raw frames (normalized on device with
            cfg.pixel_mean/std, the reference's GPU ImageNorm role);
          * (B, T, H, W, C) pre-normalized float;
          * (B, T, N, p·p·C) pre-patchified uint8/float from the native media
            lib (`media/decoder.cpp::alpro_repack_patches`) — skips the
            on-device patchify transpose entirely.

        Returns (B, 1+N, D) for pooling in {temporal, spatial}, or
        (B, T, 1+N, D) for pooling == 'none'.
        """
        cfg = self.cfg
        p = cfg.patch_size
        D = cfg.embed_dim
        pe = PatchEmbed(cfg, dtype=self.dtype, name="patch_embed")

        fold = cfg.fold_uint8_norm == "on" or (
            cfg.fold_uint8_norm == "auto" and self.dtype == jnp.bfloat16
        )
        if pixels.ndim == 4:  # pre-patchified (B, T, N, K)
            B, T, N, K = pixels.shape
            C = K // (p * p)
            side = int(round(N ** 0.5))
            hp, wp = side, side
            v = pixels
            if v.dtype == jnp.uint8:
                if fold:
                    x = pe(v, uint8_norm=True)
                else:
                    # per-column stats: column k ↔ channel k % C
                    mean_k = jnp.tile(
                        jnp.asarray(cfg.pixel_mean, jnp.float32), p * p
                    )
                    std_k = jnp.tile(
                        jnp.asarray(cfg.pixel_std, jnp.float32), p * p
                    )
                    v = (v.astype(jnp.float32) / 255.0 - mean_k) / std_k
                    x = pe(v)
            else:
                x = pe(v)
        else:
            B, T, H, W, C = pixels.shape
            hp, wp = H // p, W // p
            N = hp * wp
            use_fused = cfg.fused_patchify == "on"
            if pixels.dtype == jnp.uint8 and use_fused:
                x = pe.fused(pixels)
            elif pixels.dtype == jnp.uint8 and fold:
                # patchify relayout on the 1-byte uint8 tensor (4× less copy
                # traffic than the fp32 relayout below); the normalize rides
                # the embed matmul via the folded weights
                v = pixels.reshape(B, T, hp, p, wp, p, C)
                v = v.transpose(0, 1, 2, 4, 3, 5, 6).reshape(B, T, N, p * p * C)
                x = pe(v, uint8_norm=True)
            else:
                if pixels.dtype == jnp.uint8:
                    mean = jnp.asarray(cfg.pixel_mean, jnp.float32)
                    std = jnp.asarray(cfg.pixel_std, jnp.float32)
                    pixels = (pixels.astype(jnp.float32) / 255.0 - mean) / std
                # patch extraction in (ph, pw, c) order — bit-equivalent to
                # the reference's strided conv
                v = pixels.reshape(B, T, hp, p, wp, p, C)
                v = v.transpose(0, 1, 2, 4, 3, 5, 6).reshape(B, T, N, p * p * C)
                x = pe(v)

        cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, D)
        )
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, cfg.num_patches + 1, D),
        )
        # zeros, matching the reference init (`vit.py:266-268`: trunc-normal is
        # applied to pos_embed/cls_token only; time_embed starts at zero)
        time_embed = self.param(
            "time_embed", nn.initializers.zeros, (1, cfg.num_frames, D)
        )

        pos_cls, pos_patch = pos_embed[:, :1], pos_embed[:, 1:]
        if N != cfg.num_patches:
            side = cfg.patches_per_side
            grid = pos_patch.reshape(1, side, side, D)
            pos_patch = _nearest_resize_2d(grid, hp, wp).reshape(1, N, D)
        te = time_embed if T == cfg.num_frames else _nearest_resize_1d(time_embed, T)

        cls = (cls_token + pos_cls).astype(self.dtype)
        cls = jnp.broadcast_to(cls, (B, 1, D))
        x = x + pos_patch[:, None, :, :].astype(x.dtype)
        x = nn.Dropout(cfg.drop_rate)(x, deterministic=deterministic)
        cls = nn.Dropout(cfg.drop_rate)(cls, deterministic=deterministic)
        if cfg.attention_type != "space_only":
            x = x + te[:, :, None, :].astype(x.dtype)
            x = nn.Dropout(cfg.drop_rate)(x, deterministic=deterministic)

        dpr = [
            cfg.drop_path_rate * i / max(cfg.depth - 1, 1)
            for i in range(cfg.depth)
        ]
        if cfg.attention_type == "divided_space_time":
            if cfg.scan_blocks:
                body = _ScanDividedBlock
                if cfg.gradient_checkpointing:
                    from alpro_tpu.models.remat import resolve_remat_policy

                    body = nn.remat(
                        body, static_argnums=(3,), prevent_cse=False,
                        policy=resolve_remat_policy(cfg.remat_policy),
                    )
                scanned = nn.scan(
                    body,
                    variable_axes={"params": 0},
                    split_rngs={"params": True, "dropout": True, "droppath": True},
                    in_axes=(0, nn.broadcast),
                    length=cfg.depth,
                )(cfg, dtype=self.dtype, name="blocks")
                (cls, x), _ = scanned(
                    (cls, x), jnp.asarray(dpr, jnp.float32), deterministic
                )
            else:
                block_cls = DividedSTBlock
                if cfg.gradient_checkpointing:
                    from alpro_tpu.models.remat import resolve_remat_policy

                    block_cls = nn.remat(
                        DividedSTBlock, static_argnums=(3,),
                        policy=resolve_remat_policy(cfg.remat_policy),
                    )
                for i in range(cfg.depth):
                    cls, x = block_cls(
                        cfg, drop_path=dpr[i], dtype=self.dtype,
                        zero_temporal_fc=(i > 0), name=f"blocks_{i}",
                    )(cls, x, deterministic)
        elif cfg.attention_type == "joint_space_time":
            y = jnp.concatenate([cls, x.reshape(B, T * N, D)], axis=1)
            for i in range(cfg.depth):
                y = JointBlock(
                    cfg, drop_path=dpr[i], dtype=self.dtype, name=f"blocks_{i}"
                )(y, deterministic)
            cls, x = y[:, :1], y[:, 1:].reshape(B, T, N, D)
        elif cfg.attention_type == "space_only":
            # each frame runs independently; temporal mean-pool of everything
            # (incl. CLS) afterwards (`vit.py:368-371`)
            cls_rep = jnp.broadcast_to(cls[:, None, :, :], (B, T, 1, D)).astype(x.dtype)
            y = jnp.concatenate([cls_rep, x], axis=2).reshape(B * T, 1 + N, D)
            for i in range(cfg.depth):
                y = JointBlock(
                    cfg, drop_path=dpr[i], dtype=self.dtype, name=f"blocks_{i}"
                )(y, deterministic)
            y = y.reshape(B, T, 1 + N, D).mean(axis=1)
            cls, x = y[:, :1], y[:, 1:][:, None, :, :]  # T collapsed to 1
            T = 1
        else:
            raise ValueError(f"invalid attention_type {cfg.attention_type!r}")

        norm = LayerNorm(cfg.ln_eps, dtype=self.dtype, name="norm")
        cls = norm(cls)
        x = norm(x)

        if pooling == "temporal":
            pooled = jnp.mean(x, axis=1)  # (B, N, D)
            return jnp.concatenate([cls, pooled], axis=1)
        if pooling == "spatial":
            pooled = jnp.mean(x, axis=2)  # (B, T, D)
            return jnp.concatenate([cls, pooled], axis=1)
        if pooling == "none":
            cls_rep = jnp.broadcast_to(cls[:, None, :, :], (B, T, 1, D))
            return jnp.concatenate([cls_rep, x], axis=2)
        raise ValueError(f"invalid pooling {pooling!r}")
