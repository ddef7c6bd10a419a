"""Layout-equivalence test for the TimeSformer.

The model keeps tokens as (B, T, N, D) with a separate CLS; the reference
algorithm works on a flattened patch-major (B, 1 + N*T, D) sequence
(`/root/reference/src/modeling/timesformer/vit.py:136-213,321-377,475-503`).
This file contains an independent NumPy transcription of the flattened-layout
algorithm; both must produce identical outputs from identical weights.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alpro_tpu.checkpoint.torch_convert import convert_timesformer
from alpro_tpu.models.timesformer import TimeSformer, TimeSformerConfig


# ---------------------------------------------------------------------------
# NumPy reference (flattened patch-major layout, torch-style (out,in) weights)
# ---------------------------------------------------------------------------
def np_ln(x, w, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def np_softmax(x):
    m = x.max(-1, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(-1, keepdims=True)


def np_attn(x, sd, pfx, num_heads):
    B, S, D = x.shape
    hd = D // num_heads
    qkv = x @ sd[pfx + "qkv.weight"].T + sd[pfx + "qkv.bias"]
    qkv = qkv.reshape(B, S, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = np_softmax((q @ k.transpose(0, 1, 3, 2)) * (hd ** -0.5))
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, S, D)
    return out @ sd[pfx + "proj.weight"].T + sd[pfx + "proj.bias"]


def np_mlp(x, sd, pfx):
    from scipy.special import erf

    h = x @ sd[pfx + "fc1.weight"].T + sd[pfx + "fc1.bias"]
    h = 0.5 * h * (1.0 + erf(h / np.sqrt(2.0)))
    return h @ sd[pfx + "fc2.weight"].T + sd[pfx + "fc2.bias"]


def np_block(x, sd, pfx, B, T, Hs, Ws, num_heads, eps):
    N = Hs * Ws
    # temporal over T at each patch location
    xt = x[:, 1:].reshape(B, Hs, Ws, T, -1).reshape(B * N, T, -1)
    res_t = np_attn(
        np_ln(xt, sd[pfx + "temporal_norm1.weight"], sd[pfx + "temporal_norm1.bias"], eps),
        sd, pfx + "temporal_attn.", num_heads,
    )
    res_t = res_t.reshape(B, N * T, -1)
    res_t = res_t @ sd[pfx + "temporal_fc.weight"].T + sd[pfx + "temporal_fc.bias"]
    xt_full = x[:, 1:] + res_t

    # spatial over (1+N) per frame, CLS replicated then frame-averaged
    init_cls = x[:, :1]
    cls_rep = np.repeat(init_cls, T, axis=0).reshape(B * T, 1, -1)
    xs = xt_full.reshape(B, Hs, Ws, T, -1).transpose(0, 3, 1, 2, 4).reshape(B * T, N, -1)
    xs = np.concatenate([cls_rep, xs], axis=1)
    res_s = np_attn(
        np_ln(xs, sd[pfx + "norm1.weight"], sd[pfx + "norm1.bias"], eps),
        sd, pfx + "attn.", num_heads,
    )
    cls_out = res_s[:, 0].reshape(B, T, -1).mean(axis=1, keepdims=True)
    res_p = res_s[:, 1:].reshape(B, T, Hs, Ws, -1).transpose(0, 2, 3, 1, 4).reshape(B, N * T, -1)

    x = np.concatenate([init_cls, xt_full], axis=1) + np.concatenate(
        [cls_out, res_p], axis=1
    )
    y = np_ln(x, sd[pfx + "norm2.weight"], sd[pfx + "norm2.bias"], eps)
    return x + np_mlp(y, sd, pfx + "mlp.")


def np_timesformer(pixels, sd, cfg: TimeSformerConfig):
    B, T, H, W, C = pixels.shape
    p = cfg.patch_size
    Hs, Ws = H // p, W // p
    N = Hs * Ws
    D = cfg.embed_dim
    eps = cfg.ln_eps

    conv_w = sd["patch_embed.proj.weight"]  # (D, C, p, p)
    patches = pixels.reshape(B, T, Hs, p, Ws, p, C).transpose(0, 1, 2, 4, 6, 3, 5)
    z = np.einsum("bthwcij,dcij->bthwd", patches, conv_w) + sd["patch_embed.proj.bias"]
    z = z.reshape(B * T, N, D)

    cls = np.broadcast_to(sd["cls_token"], (B * T, 1, D))
    x = np.concatenate([cls, z], axis=1) + sd["pos_embed"]

    cls_tokens = x[:B, :1, :][:, 0, :][:, None, :]  # reference vit.py:347
    xr = x[:, 1:].reshape(B, T, N, D).transpose(0, 2, 1, 3).reshape(B * N, T, D)
    xr = xr + sd["time_embed"]
    xr = xr.reshape(B, N, T, D).reshape(B, N * T, D)
    x = np.concatenate([cls_tokens, xr], axis=1)

    for i in range(cfg.depth):
        x = np_block(x, sd, f"blocks.{i}.", B, T, Hs, Ws, cfg.num_heads, eps)

    x = np_ln(x, sd["norm.weight"], sd["norm.bias"], eps)
    cls = x[:, :1]
    rest = x[:, 1:].reshape(B, Hs, Ws, T, D).transpose(0, 3, 1, 2, 4).reshape(B, T, N, D)
    pooled = rest.mean(axis=1)
    return np.concatenate([cls, pooled], axis=1)


def random_vit_state_dict(cfg: TimeSformerConfig, rng: np.random.RandomState):
    D = cfg.embed_dim
    sd = {
        "cls_token": rng.randn(1, 1, D).astype(np.float32) * 0.02,
        "pos_embed": rng.randn(1, cfg.num_patches + 1, D).astype(np.float32) * 0.02,
        "time_embed": rng.randn(1, cfg.num_frames, D).astype(np.float32) * 0.02,
        "patch_embed.proj.weight": rng.randn(D, 3, cfg.patch_size, cfg.patch_size).astype(np.float32) * 0.05,
        "patch_embed.proj.bias": rng.randn(D).astype(np.float32) * 0.02,
        "norm.weight": 1 + rng.randn(D).astype(np.float32) * 0.01,
        "norm.bias": rng.randn(D).astype(np.float32) * 0.01,
    }
    for i in range(cfg.depth):
        pfx = f"blocks.{i}."
        for ln in ("norm1", "norm2", "temporal_norm1"):
            sd[pfx + ln + ".weight"] = 1 + rng.randn(D).astype(np.float32) * 0.01
            sd[pfx + ln + ".bias"] = rng.randn(D).astype(np.float32) * 0.01
        for attn in ("attn", "temporal_attn"):
            sd[pfx + attn + ".qkv.weight"] = rng.randn(3 * D, D).astype(np.float32) * 0.05
            sd[pfx + attn + ".qkv.bias"] = rng.randn(3 * D).astype(np.float32) * 0.01
            sd[pfx + attn + ".proj.weight"] = rng.randn(D, D).astype(np.float32) * 0.05
            sd[pfx + attn + ".proj.bias"] = rng.randn(D).astype(np.float32) * 0.01
        sd[pfx + "temporal_fc.weight"] = rng.randn(D, D).astype(np.float32) * 0.05
        sd[pfx + "temporal_fc.bias"] = rng.randn(D).astype(np.float32) * 0.01
        sd[pfx + "mlp.fc1.weight"] = rng.randn(4 * D, D).astype(np.float32) * 0.05
        sd[pfx + "mlp.fc1.bias"] = rng.randn(4 * D).astype(np.float32) * 0.01
        sd[pfx + "mlp.fc2.weight"] = rng.randn(D, 4 * D).astype(np.float32) * 0.05
        sd[pfx + "mlp.fc2.bias"] = rng.randn(D).astype(np.float32) * 0.01
    return sd


SMALL = TimeSformerConfig(
    img_size=48, patch_size=16, num_frames=3, embed_dim=24, depth=2, num_heads=4
)


def test_layout_equivalence_vs_flattened_numpy_reference():
    rng = np.random.RandomState(0)
    sd = random_vit_state_dict(SMALL, rng)
    pixels = rng.randn(2, 3, 48, 48, 3).astype(np.float32)

    want = np_timesformer(pixels, sd, SMALL)

    model = TimeSformer(SMALL)
    params = {"params": convert_timesformer(sd, prefix="", depth=SMALL.depth)}
    got = np.asarray(model.apply(params, jnp.asarray(pixels), pooling="temporal"))

    assert got.shape == want.shape == (2, 1 + 9, 24)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_pos_and_time_embed_runtime_resize():
    """Different input geometry than the trained config must nearest-resize
    embeddings (reference `vit.py:328-361`), not crash."""
    rng = np.random.RandomState(1)
    sd = random_vit_state_dict(SMALL, rng)
    model = TimeSformer(SMALL)
    params = {"params": convert_timesformer(sd, prefix="", depth=SMALL.depth)}
    pixels = jnp.asarray(rng.randn(1, 5, 32, 32, 3).astype(np.float32))
    out = model.apply(params, pixels, pooling="temporal")
    assert out.shape == (1, 1 + 4, 24)


def test_pooling_modes():
    rng = np.random.RandomState(2)
    sd = random_vit_state_dict(SMALL, rng)
    model = TimeSformer(SMALL)
    params = {"params": convert_timesformer(sd, prefix="", depth=SMALL.depth)}
    pixels = jnp.asarray(rng.randn(2, 3, 48, 48, 3).astype(np.float32))
    t = model.apply(params, pixels, pooling="temporal")
    s = model.apply(params, pixels, pooling="spatial")
    n = model.apply(params, pixels, pooling="none")
    assert t.shape == (2, 10, 24)
    assert s.shape == (2, 4, 24)
    assert n.shape == (2, 3, 10, 24)
    # 'none' carries the same CLS on every frame
    np.testing.assert_allclose(n[:, 0, 0], n[:, 1, 0], atol=1e-6)


def test_droppath_and_dropout_train_mode_runs():
    cfg = TimeSformerConfig(
        img_size=32, patch_size=16, num_frames=2, embed_dim=16, depth=2,
        num_heads=2, drop_rate=0.1, attn_drop_rate=0.1, drop_path_rate=0.2,
    )
    model = TimeSformer(cfg)
    pixels = jnp.zeros((2, 2, 32, 32, 3))
    params = model.init({"params": jax.random.PRNGKey(0)}, pixels)
    out = model.apply(
        params, pixels, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1), "droppath": jax.random.PRNGKey(2)},
    )
    assert out.shape == (2, 5, 16)
    assert np.isfinite(np.asarray(out)).all()
