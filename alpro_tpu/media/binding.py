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
            ctypes.c_int, ctypes.c_int64,
        ]
        self._lib.alpro_encode_test_video.restype = ctypes.c_int
        self._lib.alpro_repack_patches.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        self._lib.alpro_repack_patches.restype = ctypes.c_int
        self._lib.alpro_open.argtypes = [ctypes.c_char_p]
        self._lib.alpro_open.restype = ctypes.c_void_p
        self._lib.alpro_handle_info.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_double),
        ]
        self._lib.alpro_handle_info.restype = ctypes.c_int
        self._lib.alpro_read.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        self._lib.alpro_read.restype = ctypes.c_int
        self._lib.alpro_close.argtypes = [ctypes.c_void_p]
        self._lib.alpro_close.restype = None
        self._lib.alpro_tok_create.argtypes = [ctypes.c_char_p, ctypes.c_int]
        self._lib.alpro_tok_create.restype = ctypes.c_void_p
        self._lib.alpro_tok_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
        ]
        self._lib.alpro_tok_encode.restype = ctypes.c_int
        self._lib.alpro_tok_destroy.argtypes = [ctypes.c_void_p]
        self._lib.alpro_tok_destroy.restype = None

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
        native_size: Optional[tuple] = None,
    ) -> Optional[np.ndarray]:
        """Decode the given frame indices → (n, out_h, out_w, 3) uint8 RGB.
        out_h/out_w of 0 keep the native size; callers that already probed
        pass `native_size=(h, w)` to avoid a second container parse."""
        if not (out_h and out_w):
            if native_size is None:
                info = self.probe(path)
                if info is None:
                    return None
                native_size = (info.height, info.width)
            out_h = out_h or native_size[0]
            out_w = out_w or native_size[1]
        oh, ow = out_h, out_w
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

    def encode_test_video(self, path: str, w=128, h=96, n_frames=30, seed=0,
                          start_pts: int = 0) -> bool:
        """start_pts != 0 (in 1/25s units) writes a stream whose first
        timestamp is offset — the nonzero-start-container decode case
        (container inferred from the extension; use .ts for MPEG-TS)."""
        return self._lib.alpro_encode_test_video(
            path.encode(), w, h, n_frames, seed, start_pts
        ) == 0

    def open_video(self, path: str) -> Optional["DecoderHandle"]:
        """Reusable decoder handle: the container probe + codec open +
        swscale setup amortize across `read` calls (decord's VideoReader
        stays open per dataset item the same way,
        `/root/reference/src/datasets/dataset_base.py:137-182`; the one-shot
        `decode_frames` re-pays that cost per clip — measured in
        benchmarks/decode_scaling.py). Returns None if the file can't be
        opened. Handles are NOT thread-safe; use one per worker."""
        h = self._lib.alpro_open(path.encode())
        if not h:
            return None
        return DecoderHandle(self._lib, h)

    def make_tokenizer(self, vocab_path: str, lowercase: bool = True) -> "NativeWordPiece":
        return NativeWordPiece(self._lib, vocab_path, lowercase)

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


class DecoderHandle:
    """Open demux/codec/scaler contexts over one container; see
    MediaDecoder.open_video. Context-manager friendly."""

    def __init__(self, lib, handle):
        self._lib = lib
        self._h = handle

    @property
    def info(self) -> VideoInfo:
        nf = ctypes.c_int64()
        w = ctypes.c_int()
        h = ctypes.c_int()
        fps = ctypes.c_double()
        rc = self._lib.alpro_handle_info(
            self._h, ctypes.byref(nf), ctypes.byref(w), ctypes.byref(h),
            ctypes.byref(fps),
        )
        if rc != 0:
            raise ValueError("handle closed")
        return VideoInfo(nf.value, w.value, h.value, fps.value)

    def read(self, indices: Sequence[int], out_h: int = 0,
             out_w: int = 0) -> Optional[np.ndarray]:
        """Decode frame indices → (n, out_h, out_w, 3) uint8 RGB. Reads are
        independent (each seeks to its first target): backward targets,
        repeats, and reads after a prior read hit EOF all work."""
        if self._h is None:
            raise ValueError("handle closed")
        if not (out_h and out_w):
            info = self.info
            out_h = out_h or info.height
            out_w = out_w or info.width
        idx = np.ascontiguousarray(np.asarray(indices, dtype=np.int64))
        out = np.empty((len(idx), out_h, out_w, 3), dtype=np.uint8)
        rc = self._lib.alpro_read(
            self._h,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx), out_w, out_h,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc != 0:
            return None
        return out

    def close(self):
        if self._h is not None:
            self._lib.alpro_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeWordPiece:
    """C++ WordPiece tokenizer exposing the collator-facing surface
    (same contract as data/tokenization.py::WordPieceTokenizer)."""

    def __init__(self, lib, vocab_path: str, lowercase: bool = True):
        self._lib = lib
        self._h = lib.alpro_tok_create(vocab_path.encode(), int(lowercase))
        if not self._h:
            raise ValueError(f"failed to load vocab from {vocab_path}")
        # mirror the special ids by reading the vocab file
        self.vocab = {}
        with open(vocab_path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                self.vocab[line.rstrip("\r\n")] = i  # match the C loader (CRLF-safe)
        self.pad_token_id = self.vocab["[PAD]"]
        self.unk_token_id = self.vocab["[UNK]"]
        self.cls_token_id = self.vocab["[CLS]"]
        self.sep_token_id = self.vocab["[SEP]"]
        self.mask_token_id = self.vocab["[MASK]"]
        self._special = {
            self.pad_token_id, self.unk_token_id, self.cls_token_id,
            self.sep_token_id, self.mask_token_id,
        }

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    def __call__(self, texts, max_length: int = 40, padding: str = "max_length"):
        ids = np.full((len(texts), max_length), self.pad_token_id, np.int32)
        mask = np.zeros((len(texts), max_length), np.int32)
        for i, t in enumerate(texts):
            n = self._lib.alpro_tok_encode(
                self._h, t.encode(), max_length,
                ids[i].ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
            mask[i, :n] = 1
        return {"input_ids": ids, "attention_mask": mask}

    def get_special_tokens_mask(self, ids, already_has_special_tokens=True):
        return [1 if int(i) in self._special else 0 for i in ids]

    def __del__(self):
        try:
            self._lib.alpro_tok_destroy(self._h)
        except Exception:
            pass


_DECODER_SINGLETON = None


def get_decoder() -> "MediaDecoder":
    """Process-wide cached MediaDecoder: dlopen + ctypes prototype setup once,
    not per batch (the decoder object is stateless; each call opens its own
    demux context, so sharing across threads is safe)."""
    global _DECODER_SINGLETON
    if _DECODER_SINGLETON is None:
        _DECODER_SINGLETON = MediaDecoder()
    return _DECODER_SINGLETON
