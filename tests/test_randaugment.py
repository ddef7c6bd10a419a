"""Temporally consistent RandAugment tests."""

import numpy as np

from alpro_tpu.data.randaugment import (
    OPS,
    RandomAugment,
    TemporalConsistentRandomAugment,
)


def _clip(t=4, h=32, w=32, seed=0):
    return np.random.RandomState(seed).randint(0, 255, (t, h, w, 3)).astype(np.uint8)


def test_same_ops_applied_to_every_frame():
    """Static clip (all frames identical) must stay static after augment —
    the temporal-consistency property."""
    frame = _clip(1)[0]
    clip = np.repeat(frame[None], 4, axis=0)
    aug = TemporalConsistentRandomAugment(N=2, M=5, rng=np.random.default_rng(0))
    for _ in range(10):
        out = aug(clip)
        assert out.shape == clip.shape and out.dtype == np.uint8
        for t in range(1, 4):
            np.testing.assert_array_equal(out[0], out[t])


def test_deterministic_with_seeded_rng():
    clip = _clip()
    a = TemporalConsistentRandomAugment(rng=np.random.default_rng(7))(clip)
    b = TemporalConsistentRandomAugment(rng=np.random.default_rng(7))(clip)
    np.testing.assert_array_equal(a, b)


def test_all_ops_run():
    clip = _clip(2)
    for name in OPS:
        aug = TemporalConsistentRandomAugment(
            N=1, M=5, augs=[name], rng=np.random.default_rng(0)
        )
        out = aug(clip)
        assert out.shape == clip.shape


def test_identity_level_one_enhances_are_noop():
    # M such that enhance factor == 1.0 → (1.0-0.1)/1.8*10 = 5
    clip = _clip(2)
    for name in ["Contrast", "Brightness", "Color"]:
        aug = TemporalConsistentRandomAugment(
            N=1, M=5, augs=[name], rng=np.random.default_rng(0)
        )
        out = aug(clip)
        assert np.abs(out.astype(int) - clip.astype(int)).max() <= 2


def test_p_one_skips_everything():
    clip = _clip()
    aug = TemporalConsistentRandomAugment(
        N=2, M=5, p=1.0, rng=np.random.default_rng(0)
    )
    np.testing.assert_array_equal(aug(clip), clip)


def test_random_augment_single_image():
    img = _clip(1)[0]
    out = RandomAugment(N=2, M=5, rng=np.random.default_rng(1))(img)
    assert out.shape == img.shape
