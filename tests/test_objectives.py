"""Unit tests for the four training objectives."""

import numpy as np
import jax
import jax.numpy as jnp

from alpro_tpu.objectives import (
    build_prompt_bank,
    masked_patch_mean,
    mlm_loss,
    mpm_loss,
    pseudo_labels_from_feats,
    sample_hard_negatives,
    vtc_loss,
    vtm_loss_from_logits,
)


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_vtc_loss_matches_manual_ce():
    rng = np.random.RandomState(0)
    vf = _norm(rng.randn(6, 8)).astype(np.float32)
    tf = _norm(rng.randn(6, 8)).astype(np.float32)
    temp = 0.07
    loss, sv2t, st2v = vtc_loss(jnp.asarray(vf), jnp.asarray(tf), temp)

    sim = vf @ tf.T / temp

    def ce(s):
        logp = s - np.log(np.exp(s - s.max(1, keepdims=True)).sum(1, keepdims=True)) - s.max(1, keepdims=True)
        return -np.mean(np.diag(logp))

    want = (ce(sim) + ce(sim.T)) / 2
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sv2t), sim, rtol=1e-4)


def test_vtc_perfect_alignment_low_loss():
    rng = np.random.RandomState(1)
    f = _norm(rng.randn(8, 16)).astype(np.float32)
    aligned, _, _ = vtc_loss(jnp.asarray(f), jnp.asarray(f), 0.01)
    shuffled, _, _ = vtc_loss(
        jnp.asarray(f), jnp.asarray(np.roll(f, 1, axis=0)), 0.01
    )
    assert float(aligned) < 0.01 < float(shuffled)


def test_vtc_stop_gather_grad_changes_grads_not_value():
    rng = np.random.RandomState(2)
    vf = jnp.asarray(_norm(rng.randn(4, 8)).astype(np.float32))
    tf = jnp.asarray(_norm(rng.randn(4, 8)).astype(np.float32))

    f_full = lambda v: vtc_loss(v, tf, 0.07, stop_gather_grad=False)[0]
    f_ref = lambda v: vtc_loss(v, tf, 0.07, stop_gather_grad=True)[0]
    np.testing.assert_allclose(float(f_full(vf)), float(f_ref(vf)), rtol=1e-6)
    g_full = jax.grad(f_full)(vf)
    g_ref = jax.grad(f_ref)(vf)
    assert not np.allclose(np.asarray(g_full), np.asarray(g_ref))


def test_hard_negatives_never_self():
    rng = np.random.RandomState(3)
    B = 16
    sim = jnp.asarray(rng.randn(B, B).astype(np.float32) * 3)
    for seed in range(5):
        nt, nv = sample_hard_negatives(jax.random.PRNGKey(seed), sim, sim.T)
        assert not np.any(np.asarray(nt) == np.arange(B))
        assert not np.any(np.asarray(nv) == np.arange(B))


def test_hard_negatives_local_blocks():
    rng = np.random.RandomState(4)
    B, blocks = 16, 4
    sim = jnp.asarray(rng.randn(B, B).astype(np.float32))
    nt, nv = sample_hard_negatives(
        jax.random.PRNGKey(0), sim, sim.T, num_local_blocks=blocks
    )
    blk = np.arange(B) // (B // blocks)
    assert np.all(blk[np.asarray(nt)] == blk)
    assert np.all(blk[np.asarray(nv)] == blk)


def test_hard_negatives_prefer_high_similarity():
    B = 8
    sim = np.full((B, B), -10.0, np.float32)
    sim[:, 3] = 10.0  # column 3 overwhelmingly likely
    np.fill_diagonal(sim, 0)
    nt, _ = sample_hard_negatives(jax.random.PRNGKey(0), jnp.asarray(sim), jnp.asarray(sim))
    nt = np.asarray(nt)
    assert np.all(nt[np.arange(B) != 3] == 3)
    assert nt[3] != 3


def test_vtm_loss_labels():
    pos = jnp.asarray([[0.0, 5.0]] * 4)   # confidently "match"
    neg = jnp.asarray([[5.0, 0.0]] * 8)   # confidently "no match"
    loss, logits, labels = vtm_loss_from_logits(pos, neg)
    assert float(loss) < 0.05
    assert logits.shape == (12, 2)
    np.testing.assert_array_equal(np.asarray(labels), [1] * 4 + [0] * 8)


def test_mlm_loss_ignores_minus100():
    logits = jnp.asarray(np.random.RandomState(5).randn(2, 4, 7).astype(np.float32))
    labels = jnp.asarray([[1, -100, 3, -100], [-100, -100, -100, 2]])
    loss = mlm_loss(logits, labels)
    # manual: only 3 positions contribute
    lp = jax.nn.log_softmax(logits, axis=-1)
    want = -(lp[0, 0, 1] + lp[0, 2, 3] + lp[1, 3, 2]) / 3
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-5)


def test_mlm_loss_all_ignored_is_finite():
    logits = jnp.zeros((2, 3, 7))
    labels = jnp.full((2, 3), -100)
    assert np.isfinite(float(mlm_loss(logits, labels)))


def test_prompt_bank_template_ensembling():
    d = 4
    ents, templates = 3, 2

    # fake encoder: feature = one-hot-ish from the first token id
    def enc(ids, mask):
        f = jax.nn.one_hot(ids[:, 0] % d, d) + 0.1
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    ids = jnp.arange(ents * templates)[:, None] * jnp.ones((1, 3), jnp.int32)
    mask = jnp.ones_like(ids)
    bank = build_prompt_bank(enc, ids, mask, ents, chunk_size=2)
    assert bank.shape == (ents, d)
    # row e must be the mean of encodings of rows e and e+ents
    want0 = (np.asarray(enc(ids[0:1], mask[0:1]))[0] + np.asarray(enc(ids[3:4], mask[3:4]))[0]) / 2
    np.testing.assert_allclose(np.asarray(bank[0]), want0, rtol=1e-5)


def test_pseudo_labels_and_ignore():
    bank = jnp.asarray(np.eye(4, 6, dtype=np.float32))
    feats = jnp.asarray(
        [[1.0, 0, 0, 0, 0, 0], [0.25, 0.25, 0.25, 0.25, 0, 0]], jnp.float32
    )
    soft, ignore = pseudo_labels_from_feats(feats, bank, temp=0.05, ignore_threshold=0.9)
    assert soft.shape == (2, 4)
    assert bool(ignore[0]) is False     # confident → keep
    assert bool(ignore[1]) is True      # uniform → ignore
    np.testing.assert_allclose(np.asarray(soft).sum(1), 1.0, rtol=1e-5)


def test_masked_patch_mean():
    B, Lt, h, w, D = 2, 3, 2, 2, 5
    N = h * w
    hidden = jnp.asarray(np.arange(B * (Lt + 1 + N) * D, dtype=np.float32).reshape(B, Lt + 1 + N, D))
    masks = np.ones((B, h, w), np.float32)
    masks[0, 0, 0] = 0  # patch 0 erased in sample 0
    masks[1, :, :] = 0  # all erased in sample 1
    out = masked_patch_mean(hidden, jnp.asarray(masks), Lt)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(hidden[0, Lt + 1]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out[1]), np.asarray(hidden[1, Lt + 1 :]).mean(0), rtol=1e-6
    )


def test_mpm_loss_ignore_normalization():
    logits = jnp.asarray(np.random.RandomState(6).randn(4, 5).astype(np.float32))
    soft = jax.nn.softmax(jnp.asarray(np.random.RandomState(7).randn(4, 5).astype(np.float32)))
    ignore = jnp.asarray([False, True, False, True])
    loss = mpm_loss(logits, soft, ignore)
    ce = -np.sum(
        np.asarray(jax.nn.log_softmax(logits, 1)) * np.asarray(soft), axis=1
    )
    want = (ce[0] + ce[2]) / 2
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)
