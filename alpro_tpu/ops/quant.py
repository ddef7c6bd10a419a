"""Int8 weight quantization for the serving path.

The reference serves fp16 (apex O2) and has no quantized path; this is a
TPU-native extension. Two rungs:

  * **w8 storage** (`quantize_tree` / `dequantize_tree`): every matmul
    `kernel` leaf is stored int8 with a per-output-channel fp32 scale and
    dequantized to the compute dtype *inside* jit — XLA fuses the
    convert+rescale into the consuming dot, so HBM holds (and the weight
    loads stream) 1 byte/weight instead of 2. Numerics: symmetric
    per-channel round-to-nearest, max error scale/2 per weight.
  * **w8a8 math** (`int8_dense`): dynamic per-row activation quantization
    + an s8×s8→s32 `lax.dot_general`, which lowers to the MXU's native
    int8 path (2× the bf16 rate on v5e). Used by the measured serving
    experiments; accuracy-sensitive callers stay on w8.

Scales live per OUTPUT channel (axis -1), reducing over the contraction
axis (-2) only, so scanned-stacked kernels (L, in, out) keep per-(L, out)
scales. 1-D leaves (LayerNorm, biases), embeddings, and non-kernel leaves
are never touched.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class QTensor:
    """An int8-quantized weight: ``dequant() == q * scale`` in `dtype`.

    Registered as a pytree node so quantized trees flow through jit /
    device_put unchanged; `dtype` is static aux data.
    """

    def __init__(self, q, scale, dtype=jnp.bfloat16):
        self.q = q          # int8, original kernel shape
        self.scale = scale  # fp32, shape = kernel.shape with axis -2 == 1
        self.dtype = jnp.dtype(dtype)

    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim

    def dequant(self):
        return (self.q.astype(jnp.float32) * self.scale).astype(self.dtype)

    def tree_flatten(self):
        return (self.q, self.scale), self.dtype

    @classmethod
    def tree_unflatten(cls, aux, children):
        q, scale = children
        return cls(q, scale, aux)

    def __repr__(self):
        return f"QTensor(shape={tuple(self.q.shape)}, dtype={self.dtype})"


def quantize_weight(w, dtype=jnp.bfloat16) -> QTensor:
    """Symmetric per-output-channel int8 quantization of a matmul kernel.

    Reduces |w| over the contraction axis (-2) only — leading axes (e.g.
    a scan-stacked layer axis) keep independent scales. Zero channels
    (e.g. the zero-init `temporal_fc`) get scale 0 and dequantize to 0.
    """
    w = np.asarray(jax.device_get(w), dtype=np.float32)
    amax = np.max(np.abs(w), axis=-2, keepdims=True)
    scale = amax / 127.0
    safe = np.where(scale == 0.0, 1.0, scale)
    q = np.clip(np.rint(w / safe), -127, 127).astype(np.int8)
    return QTensor(jnp.asarray(q), jnp.asarray(scale.astype(np.float32)),
                   dtype)


def _is_kernel_path(path) -> bool:
    last = path[-1]
    key = getattr(last, "key", None)
    return key == "kernel"


def quantize_tree(params, dtype=jnp.bfloat16, min_elems: int = 1 << 12):
    """Replace every `kernel` leaf (ndim 2/3, ≥ `min_elems` elements) with a
    QTensor; all other leaves pass through (cast fp32→`dtype` like the
    serving bf16 policy). Returns a tree `dequantize_tree` inverts."""

    def _q(path, x):
        if (
            _is_kernel_path(path)
            and getattr(x, "ndim", 0) in (2, 3)
            and x.size >= min_elems
            and jnp.issubdtype(x.dtype, jnp.floating)
        ):
            return quantize_weight(x, dtype)
        if getattr(x, "dtype", None) == jnp.float32:
            return jnp.asarray(x, dtype)
        return x

    return jax.tree_util.tree_map_with_path(_q, params)


def dequantize_tree(qparams):
    """QTensor leaves → dense arrays (trace-time; XLA fuses the int8 load +
    rescale into each consuming matmul, so HBM keeps the int8 copy)."""
    return jax.tree.map(
        lambda x: x.dequant() if isinstance(x, QTensor) else x,
        qparams,
        is_leaf=lambda x: isinstance(x, QTensor),
    )


def wrap_dequant(fn: Callable) -> Callable:
    """`fn(params, *a, **kw)` → the same fn taking a quantized tree as its
    first argument. Jit the *wrapped* function so dequantization happens
    on-device per call (weights stay int8 at rest)."""

    def wrapped(qparams, *args, **kwargs):
        return fn(dequantize_tree(qparams), *args, **kwargs)

    return wrapped


# --------------------------------------------------------------------------
# w8a8: dynamic activation quantization + int8 MXU dot
# --------------------------------------------------------------------------
def quantize_acts(x, axis: int = -1) -> Tuple[Any, Any]:
    """Dynamic symmetric per-row int8 quantization of activations: returns
    (x_int8, row_scale) with row_scale shaped like x with `axis` == 1."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.where(amax == 0.0, 1.0, amax) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def int8_dense(x, qw: QTensor, bias=None):
    """y = x @ W (+ bias) with both operands int8 on the MXU.

    x: (..., in) float; qw: QTensor of a 2-D (in, out) kernel. The s8×s8
    dot accumulates in int32 (`preferred_element_type`), then rescales by
    row_scale ⊗ channel_scale in fp32 and casts back to qw.dtype. v5e's
    int8 MXU path runs at 2× the bf16 FLOP rate; accuracy costs one
    dynamic-range quantization of the activations per call.
    """
    assert qw.ndim == 2, "int8_dense expects an unstacked (in, out) kernel"
    xq, xs = quantize_acts(x, axis=-1)
    acc = jax.lax.dot_general(
        xq, qw.q,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * xs * qw.scale  # (..., out) * (...,1) * (1,out)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(qw.dtype)
