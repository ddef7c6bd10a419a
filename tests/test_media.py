"""Native media library tests: encode → probe → seek-decode → resize."""

import os

import numpy as np
import pytest

pytest.importorskip("ctypes")

from alpro_tpu.media.binding import MediaDecoder


@pytest.fixture(scope="module")
def decoder():
    try:
        return MediaDecoder()
    except RuntimeError as e:
        pytest.skip(f"media lib unavailable: {e}")


@pytest.fixture(scope="module")
def test_video(decoder, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("media") / "clip.avi")
    assert decoder.encode_test_video(path, w=128, h=96, n_frames=30, seed=7)
    return path


def test_probe(decoder, test_video):
    info = decoder.probe(test_video)
    assert info is not None
    assert info.num_frames == 30
    assert (info.width, info.height) == (128, 96)
    assert info.fps == pytest.approx(25.0, rel=0.01)


def test_decode_sampled_frames(decoder, test_video):
    idx = [0, 7, 15, 29]
    out = decoder.decode_frames(test_video, idx)
    assert out is not None
    assert out.shape == (4, 96, 128, 3)
    # frames differ over time (procedural pattern moves)
    assert not np.array_equal(out[0], out[3])


def test_decode_deterministic(decoder, test_video):
    a = decoder.decode_frames(test_video, [2, 9, 20])
    b = decoder.decode_frames(test_video, [2, 9, 20])
    np.testing.assert_array_equal(a, b)


def test_decode_unsorted_indices_map_to_slots(decoder, test_video):
    fwd = decoder.decode_frames(test_video, [3, 17])
    rev = decoder.decode_frames(test_video, [17, 3])
    np.testing.assert_array_equal(fwd[0], rev[1])
    np.testing.assert_array_equal(fwd[1], rev[0])


def test_decode_with_resize(decoder, test_video):
    out = decoder.decode_frames(test_video, [0, 10], out_h=64, out_w=80)
    assert out.shape == (2, 64, 80, 3)


def test_decode_repeated_index(decoder, test_video):
    out = decoder.decode_frames(test_video, [5, 5, 5])
    np.testing.assert_array_equal(out[0], out[1])
    np.testing.assert_array_equal(out[1], out[2])


def test_probe_missing_file(decoder):
    assert decoder.probe("/nonexistent/file.mp4") is None


def test_ffmpeg_backend_through_dataset(decoder, tmp_path):
    """FFmpegVideoBackend plugs into the dataset layer."""
    import json

    from alpro_tpu.data.datasets import RetrievalDataset
    from alpro_tpu.media import FFmpegVideoBackend

    vid_dir = tmp_path / "videos"
    vid_dir.mkdir()
    rows = []
    for i in range(3):
        decoder.encode_test_video(str(vid_dir / f"v{i}.avi"), 64, 64, 20, seed=i)
        rows.append({"vid_id": f"v{i}", "txt": "a dog runs", "txt_id": i})
    ds = RetrievalDataset(
        rows, str(vid_dir), num_frm=4, resize_size=48, crop_size=32,
        backend=FFmpegVideoBackend(),
    )
    ex = ds[0]
    assert ex["clip"].shape == (4, 32, 32, 3)
    assert ex["clip"].dtype == np.uint8
