"""ctypes binding for libalpro_media.so (built from decoder.cpp via make)."""

from __future__ import annotations

import ctypes
import dataclasses
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libalpro_media.so")


def _ensure_built() -> str:
    if not os.path.exists(_SO):
        try:
            subprocess.run(
                ["make", "-C", _DIR, "libalpro_media.so"],
                check=True, capture_output=True, text=True,
            )
        except subprocess.CalledProcessError as e:
            raise RuntimeError(
                f"failed to build libalpro_media.so:\n{e.stdout}\n{e.stderr}"
            ) from e
    return _SO


@dataclasses.dataclass
class VideoInfo:
    num_frames: int
    width: int
    height: int
    fps: float


class MediaDecoder:
    def __init__(self):
        self._lib = ctypes.CDLL(_ensure_built())
        self._lib.alpro_probe.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_double),
        ]
        self._lib.alpro_probe.restype = ctypes.c_int
        self._lib.alpro_decode_frames.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        self._lib.alpro_decode_frames.restype = ctypes.c_int
        self._lib.alpro_encode_test_video.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        self._lib.alpro_encode_test_video.restype = ctypes.c_int
        self._lib.alpro_repack_patches.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        self._lib.alpro_repack_patches.restype = ctypes.c_int

    def probe(self, path: str) -> Optional[VideoInfo]:
        nf = ctypes.c_int64()
        w = ctypes.c_int()
        h = ctypes.c_int()
        fps = ctypes.c_double()
        rc = self._lib.alpro_probe(
            path.encode(), ctypes.byref(nf), ctypes.byref(w), ctypes.byref(h),
            ctypes.byref(fps),
        )
        if rc != 0:
            return None
        return VideoInfo(nf.value, w.value, h.value, fps.value)

    def decode_frames(
        self,
        path: str,
        indices: Sequence[int],
        out_h: int = 0,
        out_w: int = 0,
    ) -> Optional[np.ndarray]:
        """Decode the given frame indices → (n, out_h, out_w, 3) uint8 RGB.
        out_h/out_w of 0 keep the native size."""
        info = self.probe(path)
        if info is None:
            return None
        oh = out_h or info.height
        ow = out_w or info.width
        idx = np.ascontiguousarray(np.asarray(indices, dtype=np.int64))
        out = np.empty((len(idx), oh, ow, 3), dtype=np.uint8)
        rc = self._lib.alpro_decode_frames(
            path.encode(),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx), ow, oh,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc != 0:
            return None
        return out

    def encode_test_video(self, path: str, w=128, h=96, n_frames=30, seed=0) -> bool:
        return self._lib.alpro_encode_test_video(path.encode(), w, h, n_frames, seed) == 0

    def repack_patches(self, frames: np.ndarray, patch_size: int = 16) -> np.ndarray:
        """(T, H, W, C) uint8 → (T, N, p·p·C) uint8 patch-major layout
        (the MXU-ready form the patch embedding consumes)."""
        frames = np.ascontiguousarray(frames, dtype=np.uint8)
        T, H, W, C = frames.shape
        p = patch_size
        out = np.empty((T, (H // p) * (W // p), p * p * C), dtype=np.uint8)
        rc = self._lib.alpro_repack_patches(
            frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            T, H, W, C, p,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc != 0:
            raise ValueError(f"repack failed (rc={rc}): H/W not divisible by {p}")
        return out
