"""Host-side video/image transforms (numpy; SIMD C++ versions in alpro_tpu/media).

The normalize step itself runs **on device** inside the jitted step via
`normalize_pixels` (fused by XLA into the patch-embed matmul's producer) —
the equivalent of the reference's GPU `ImageNorm` prefetch normalize
(`/root/reference/src/datasets/data_utils.py:437-457`): divide by 255 then
(x - mean) / std with CLIP pixel statistics (`config_release/*.json`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

IMAGE_MEAN_CLIP = (0.48145466, 0.4578275, 0.40821073)
IMAGE_STD_CLIP = (0.26862954, 0.26130258, 0.27577711)


def normalize_pixels(pixels, mean=IMAGE_MEAN_CLIP, std=IMAGE_STD_CLIP):
    """uint8-or-float (…, H, W, C) in [0, 255] → normalized float.

    Works on numpy arrays and jax arrays alike (pure arithmetic)."""
    mean = np.asarray(mean, dtype=np.float32)
    std = np.asarray(std, dtype=np.float32)
    return (pixels / 255.0 - mean) / std


def resize_shorter_side(frames: np.ndarray, size: int) -> np.ndarray:
    """(T, H, W, C) uint8 → resized so min(H, W) == size (bilinear, PIL)."""
    from PIL import Image

    T, H, W, C = frames.shape
    if H < W:
        nh, nw = size, max(1, round(W * size / H))
    else:
        nh, nw = max(1, round(H * size / W)), size
    if (nh, nw) == (H, W):
        return frames
    out = np.empty((T, nh, nw, C), dtype=frames.dtype)
    for t in range(T):
        out[t] = np.asarray(
            Image.fromarray(frames[t]).resize((nw, nh), Image.BILINEAR)
        )
    return out


def random_square_crop(
    frames: np.ndarray, size: int, rng: Optional[np.random.Generator] = None
) -> np.ndarray:
    """Temporally consistent random square crop
    (`data_utils.py:310-339` VideoRandomSquareCrop)."""
    rng = rng or np.random.default_rng()
    T, H, W, C = frames.shape
    assert H >= size and W >= size, f"crop {size} from {H}x{W}"
    top = int(rng.integers(0, H - size + 1))
    left = int(rng.integers(0, W - size + 1))
    return frames[:, top : top + size, left : left + size, :]


def center_square_crop(frames: np.ndarray, size: int) -> np.ndarray:
    T, H, W, C = frames.shape
    top = (H - size) // 2
    left = (W - size) // 2
    return frames[:, top : top + size, left : left + size, :]


def random_resized_crop(
    img: np.ndarray,
    size: int,
    rng: Optional[np.random.Generator] = None,
    scale: Tuple[float, float] = (0.2, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> np.ndarray:
    """torchvision RandomResizedCrop semantics on a single (H, W, C) uint8
    image: sample a crop box (10 tries of area ∈ scale·HW and log-uniform
    aspect ∈ ratio, else the in-range center fallback) then bicubic-resize to
    (size, size). The reference CC3M image pipeline's first transform
    (`dataset_pretrain_sparse.py:136-139`, scale=(0.2, 1.0), BICUBIC)."""
    from PIL import Image

    rng = rng or np.random.default_rng()
    H, W = img.shape[:2]
    area = H * W
    log_ratio = (np.log(ratio[0]), np.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect = np.exp(rng.uniform(log_ratio[0], log_ratio[1]))
        w = int(round(np.sqrt(target_area * aspect)))
        h = int(round(np.sqrt(target_area / aspect)))
        if 0 < w <= W and 0 < h <= H:
            top = int(rng.integers(0, H - h + 1))
            left = int(rng.integers(0, W - w + 1))
            break
    else:  # center fallback with clamped aspect (torchvision's)
        in_ratio = W / H
        if in_ratio < ratio[0]:
            w, h = W, int(round(W / ratio[0]))
        elif in_ratio > ratio[1]:
            h, w = H, int(round(H * ratio[1]))
        else:
            w, h = W, H
        top, left = (H - h) // 2, (W - w) // 2
    crop = img[top : top + h, left : left + w]
    return np.asarray(
        Image.fromarray(crop).resize((size, size), Image.BICUBIC)
    )


def random_hflip(
    img: np.ndarray, rng: Optional[np.random.Generator] = None, p: float = 0.5
) -> np.ndarray:
    """RandomHorizontalFlip (reference CC3M pipeline,
    `dataset_pretrain_sparse.py:138`)."""
    rng = rng or np.random.default_rng()
    return img[:, ::-1] if rng.random() < p else img
