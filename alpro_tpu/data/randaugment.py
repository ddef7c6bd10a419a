"""RandAugment with temporally consistent application.

Equivalent surface to the reference `src/datasets/randaugment.py` (cv2-based):
`TemporalConsistentRandomAugment` samples one op sequence per *clip* and
applies it identically to every frame (`randaugment.py:323-361`), so motion
cues survive augmentation. Implemented on PIL/numpy (no cv2 in this image).

Magnitude semantics follow the reference level maps (`randaugment.py:219-276`,
MAX_LEVEL=10): enhance factor = level/10*1.8 + 0.1, shear = level/10*0.3,
translate = level/10*translate_const px, rotate = level/10*30°,
solarize threshold = level/10*256, posterize bits = level/10*4.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

MAX_LEVEL = 10
TRANSLATE_CONST = 10
ROTATE_MAX_DEG = 30


def _enhance_factor(level: float) -> float:
    return (level / MAX_LEVEL) * 1.8 + 0.1


def _identity(img: Image.Image, level: float) -> Image.Image:
    return img


def _autocontrast(img, level):
    return ImageOps.autocontrast(img)


def _equalize(img, level):
    return ImageOps.equalize(img)


def _rotate(img, level):
    return img.rotate(-(level / MAX_LEVEL) * ROTATE_MAX_DEG, resample=Image.BILINEAR)


def _hflip(img, level):
    return img.transpose(Image.FLIP_LEFT_RIGHT)


def _solarize(img, level):
    return ImageOps.solarize(img, int((level / MAX_LEVEL) * 256))


def _posterize(img, level):
    bits = max(1, int((level / MAX_LEVEL) * 4))
    return ImageOps.posterize(img, bits)


def _color(img, level):
    return ImageEnhance.Color(img).enhance(_enhance_factor(level))


def _contrast(img, level):
    return ImageEnhance.Contrast(img).enhance(_enhance_factor(level))


def _brightness(img, level):
    return ImageEnhance.Brightness(img).enhance(_enhance_factor(level))


def _sharpness(img, level):
    return ImageEnhance.Sharpness(img).enhance(_enhance_factor(level))


def _shear_x(img, level):
    f = (level / MAX_LEVEL) * 0.3
    return img.transform(img.size, Image.AFFINE, (1, f, 0, 0, 1, 0),
                         resample=Image.BILINEAR)


def _shear_y(img, level):
    f = (level / MAX_LEVEL) * 0.3
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, f, 1, 0),
                         resample=Image.BILINEAR)


def _translate_x(img, level):
    off = (level / MAX_LEVEL) * TRANSLATE_CONST
    return img.transform(img.size, Image.AFFINE, (1, 0, off, 0, 1, 0),
                         resample=Image.BILINEAR)


def _translate_y(img, level):
    off = (level / MAX_LEVEL) * TRANSLATE_CONST
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, 0, 1, off),
                         resample=Image.BILINEAR)


OPS = {
    "Identity": _identity,
    "AutoContrast": _autocontrast,
    "Equalize": _equalize,
    "Rotate": _rotate,
    "HorizontalFlip": _hflip,
    "Solarize": _solarize,
    "Posterize": _posterize,
    "Color": _color,
    "Contrast": _contrast,
    "Brightness": _brightness,
    "Sharpness": _sharpness,
    "ShearX": _shear_x,
    "ShearY": _shear_y,
    "TranslateX": _translate_x,
    "TranslateY": _translate_y,
}

DEFAULT_VIDEO_AUGS = [
    "Identity", "Contrast", "Brightness", "Sharpness", "ShearX", "ShearY",
    "TranslateX", "TranslateY", "Rotate", "HorizontalFlip",
]


class TemporalConsistentRandomAugment:
    """Sample N ops (without replacement) once per clip; apply the same
    sequence to every frame. p is the per-op skip probability (0 = always)."""

    def __init__(
        self,
        N: int = 2,
        M: int = 5,
        p: float = 0.0,
        augs: Optional[Sequence[str]] = None,
        rng: Optional[np.random.Generator] = None,
    ):
        self.N = N
        self.M = M
        self.p = p
        self.augs = list(augs) if augs else DEFAULT_VIDEO_AUGS
        for a in self.augs:
            assert a in OPS, f"unknown augmentation {a!r}"
        self.rng = rng or np.random.default_rng()

    def __call__(self, frames: np.ndarray) -> np.ndarray:
        """frames: (T, H, W, 3) uint8 → augmented (T, H, W, 3) uint8."""
        assert frames.shape[-1] == 3, "expect (T, H, W, 3) RGB"
        names = self.rng.choice(self.augs, self.N, replace=False)
        apply = self.rng.random(self.N) > self.p
        out = np.empty_like(frames)
        for t in range(frames.shape[0]):
            img = Image.fromarray(frames[t])
            for name, a in zip(names, apply):
                if a:
                    img = OPS[name](img, self.M)
            out[t] = np.asarray(img)
        return out


class RandomAugment(TemporalConsistentRandomAugment):
    """Per-image variant (CC3M image pipeline, `randaugment.py:363+`)."""

    def __call__(self, img: np.ndarray) -> np.ndarray:
        return super().__call__(img[None])[0]
