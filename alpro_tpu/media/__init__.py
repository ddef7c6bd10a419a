"""Media: video decode backends.

The reference decodes with decord (C++/FFmpeg, seek-and-decode sampled frames
with in-decoder resize — `/root/reference/src/datasets/dataset_base.py:137-182`).
Here the equivalent native path is `alpro_tpu/media/decoder.cpp`: an
FFmpeg-based C++ library (built to libalpro_media.so) that seeks, decodes only
the sampled frames, and swscale-resizes — exposed through ctypes with zero
copies on the Python side. A `.npy`/`.npz` raw-clip backend covers synthetic
fixtures and tests (no codecs involved).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from alpro_tpu.data.sampling import fit_num_frames, sample_frame_indices


def _time_window(vlen: int, start_time, end_time, fps) -> tuple:
    """Timestamp → frame-index window, reference-exact
    (`dataset_base.py:145-152`): requires fps > 0 when either bound is given;
    indices clamp to vlen."""
    if start_time or end_time:
        assert fps and fps > 0, (
            "must provide video fps if specifying start and end time"
        )
        start_idx = min(int((start_time or 0) * fps), vlen)
        end_idx = min(int((end_time or vlen / fps) * fps), vlen)
        return start_idx, end_idx
    return 0, vlen


def _sample_fitted(vlen, num_frm, sampling, rng, start_time=None,
                   end_time=None, fps=-1) -> Optional[np.ndarray]:
    """Reference-exact sampling adapted to the static-shape pipeline: a
    sampler raise (short video under `uniform`/`rand`, zero `nlvl_rand`
    stride, empty time window) maps to None → resample-another-video,
    matching the reference's try/except around decode
    (`dataset_base.py:175-177`); index counts ≠ num_frm (the reference feeds
    those to torch as-is) are evenly fitted."""
    # the fps precondition is a CONFIG error, not a data error: raised
    # outside the try so a dataset of ts-windowed rows with fps unset fails
    # loudly instead of silently resampling/zero-scoring every row
    # (deliberate deviation: the reference's blanket except swallows its own
    # assert, `dataset_base.py:145,175-177`)
    start_idx, end_idx = _time_window(vlen, start_time, end_time, fps)
    if end_idx <= start_idx:
        return None
    try:
        idx = sample_frame_indices(
            vlen, num_frm, sampling, rng, start_idx=start_idx, end_idx=end_idx
        )
        if len(idx) == 0:
            return None
    except Exception:
        return None
    return fit_num_frames(idx, num_frm)


class NpyVideoBackend:
    """Reads (T, H, W, C) uint8 clips from .npy/.npz files."""

    def read(
        self,
        path: str,
        num_frm: int,
        sampling: str = "uniform",
        rng: Optional[np.random.Generator] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        start_time: Optional[float] = None,
        end_time: Optional[float] = None,
        fps: float = -1,
    ) -> Optional[np.ndarray]:
        try:
            if path.endswith(".npz"):
                frames = np.load(path)["frames"]
            else:
                frames = np.load(path)
        except Exception:
            return None
        vlen = frames.shape[0]
        idx = _sample_fitted(vlen, num_frm, sampling, rng,
                             start_time, end_time, fps)
        if idx is None:
            return None
        clip = frames[idx]
        if height and width and clip.shape[1:3] != (height, width):
            from alpro_tpu.data.transforms import resize_shorter_side

            clip = resize_shorter_side(clip, min(height, width))
        return clip


class FFmpegVideoBackend:
    """ctypes wrapper over libalpro_media.so (see alpro_tpu/media/decoder.cpp)."""

    def __init__(self):
        from alpro_tpu.media.binding import MediaDecoder

        self._dec = MediaDecoder()

    def read(self, path, num_frm, sampling="uniform", rng=None,
             height=None, width=None, start_time=None, end_time=None,
             fps=-1):
        info = self._dec.probe(path)
        if info is None or info.num_frames <= 0:
            return None
        # timestamps against the container's own rate when none is forced
        # (decord resolves times through the container the same way)
        eff_fps = fps if (fps and fps > 0) else getattr(info, "fps", -1)
        idx = _sample_fitted(info.num_frames, num_frm, sampling, rng,
                             start_time, end_time, eff_fps)
        if idx is None:
            return None
        return self._dec.decode_frames(
            path, idx, height or 0, width or 0,
            native_size=(info.height, info.width),  # no second probe
        )


def get_video_backend(name: str = "auto"):
    if name == "npy":
        return NpyVideoBackend()
    if name == "ffmpeg":
        return FFmpegVideoBackend()
    if name == "auto":
        try:
            return FFmpegVideoBackend()
        except Exception:
            return NpyVideoBackend()
    raise ValueError(f"unknown video backend {name!r}")


def read_video(path: str, num_frm: int, sampling: str = "uniform",
               rng=None, height=None, width=None, backend=None,
               start_time=None, end_time=None, fps=-1):
    """`start_time`/`end_time` (seconds) + `fps` restrict sampling to the
    [start_idx, end_idx) frame window — the reference's timestamp-windowed
    decode (`dataset_base.py:137-152`)."""
    if backend is None:
        if path.endswith((".npy", ".npz")):
            backend = NpyVideoBackend()
        else:
            backend = get_video_backend("auto")
    return backend.read(path, num_frm, sampling, rng, height, width,
                        start_time=start_time, end_time=end_time, fps=fps)
