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


def test_windowed_decode_equals_sliced_full_decode(decoder, test_video):
    """Timestamp window → [start_idx, end_idx) sampling window
    (`dataset_base.py:137-152`): a windowed read must return exactly the
    frames a full decode yields at the windowed indices."""
    from alpro_tpu.data.sampling import fit_num_frames, sample_frame_indices
    from alpro_tpu.media import FFmpegVideoBackend, read_video

    info = decoder.probe(test_video)
    fps = info.fps
    # window = seconds [1.0, 2.5) of a 30-frame clip
    start_t, end_t = 1.0, 2.5
    start_idx = min(int(start_t * fps), info.num_frames)
    end_idx = min(int(end_t * fps), info.num_frames)
    assert end_idx - start_idx >= 4

    windowed = read_video(
        test_video, 4, "uniform", backend=FFmpegVideoBackend(),
        start_time=start_t, end_time=end_t, fps=fps,
    )
    want_idx = fit_num_frames(
        sample_frame_indices(info.num_frames, 4, "uniform",
                             start_idx=start_idx, end_idx=end_idx),
        4,
    )
    assert want_idx.min() >= start_idx and want_idx.max() < end_idx
    full = decoder.decode_frames(test_video, list(range(info.num_frames)))
    np.testing.assert_array_equal(windowed, full[want_idx])


def test_windowed_decode_uses_container_fps_when_unset(decoder, test_video):
    """fps=-1 → the backend resolves timestamps through the container's own
    rate (the decord behaviour the reference relies on)."""
    from alpro_tpu.media import FFmpegVideoBackend, read_video

    info = decoder.probe(test_video)
    a = read_video(test_video, 4, "uniform", backend=FFmpegVideoBackend(),
                   start_time=0.5, end_time=2.0)
    b = read_video(test_video, 4, "uniform", backend=FFmpegVideoBackend(),
                   start_time=0.5, end_time=2.0, fps=info.fps)
    np.testing.assert_array_equal(a, b)


def test_windowed_decode_npy_and_ts_rows(tmp_path):
    """ts rows flow through the dataset layer; npy backend honors fps-based
    windows and an empty window maps to resample/None."""
    import json

    from alpro_tpu.data.datasets import RetrievalDataset
    from alpro_tpu.media import read_video

    frames = np.stack([
        np.full((8, 8, 3), i, np.uint8) for i in range(20)
    ])
    p = str(tmp_path / "v0.npy")
    np.save(p, frames)
    # window [1s, 2s) at 10 fps = frames [10, 20)
    clip = read_video(p, 4, "uniform", start_time=1.0, end_time=2.0, fps=10)
    assert clip is not None and clip.min() >= 10
    # empty window → None (caller resamples)
    assert read_video(p, 4, "uniform", start_time=5.0, end_time=6.0, fps=10) is None

    rows = [{"vid_id": "v0", "txt": "a dog runs", "txt_id": 0,
             "ts": [1.0, 2.0]}]
    ds = RetrievalDataset(
        rows, str(tmp_path), num_frm=4, resize_size=8, crop_size=8, fps=10,
        is_train=False,
    )
    ex = ds[0]
    assert ex["clip"].min() >= 10  # only windowed frames sampled


def test_decode_nonzero_start_container(tmp_path):
    """Containers whose stream starts at a nonzero pts (MPEG-TS, edit lists)
    must decode the same frame INDICES as a zero-start container — the
    decoder subtracts stream start_time when mapping pts→frame index
    (`decoder.cpp::alpro_decode_frames`); without it every target lands past
    'cur' and the EOF clamp silently fills all slots with the last frame."""
    from alpro_tpu.media.binding import MediaDecoder

    dec = MediaDecoder()
    base = str(tmp_path / "zero.nut")     # NUT preserves timestamps exactly
    shifted = str(tmp_path / "shift.nut")
    assert dec.encode_test_video(base, 64, 48, n_frames=20, seed=3)
    assert dec.encode_test_video(shifted, 64, 48, n_frames=20, seed=3,
                                 start_pts=250)  # +10 s at 25 fps
    idx = [0, 5, 12, 19]
    a = dec.decode_frames(base, idx)
    b = dec.decode_frames(shifted, idx)
    assert a is not None and b is not None
    # frames 1+ are byte-exact; frame 0 differs by ~1/255 mean (the NUT
    # muxer emits a slightly different first packet for an offset stream —
    # measured encode-side artifact, not an indexing error: each shifted
    # frame best-matches its OWN index with distance ~0)
    np.testing.assert_array_equal(a[1:], b[1:])
    assert np.abs(a[0].astype(int) - b[0].astype(int)).mean() < 3.0
    # and the frames genuinely differ from each other (not one clamped frame)
    assert np.abs(b[0].astype(int) - b[3].astype(int)).mean() > 5


def test_repack_patches_matches_numpy_layout(decoder):
    """C++ `repack_patches` == the numpy reshape/transpose mirror used by
    synthetic feeds (`bench.py::_repack_np`): (T, H, W, C) uint8 →
    (T, N, p·p·C) with (ph, pw, c)-ordered patch columns — the layout the
    patch-embed kernel and fold_uint8_norm assume."""
    rng = np.random.RandomState(7)
    p = 16
    frames = rng.randint(0, 255, (3, 48, 64, 3), dtype=np.uint8)
    got = decoder.repack_patches(frames, patch_size=p)
    T, H, W, C = frames.shape
    hp, wp = H // p, W // p
    want = (
        frames.reshape(T, hp, p, wp, p, C)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(T, hp * wp, p * p * C)
    )
    np.testing.assert_array_equal(got, want)


# --------------------------------------------------------------------------
# reusable decoder handle (alpro_open / alpro_read / alpro_close)
# --------------------------------------------------------------------------
def test_handle_info_matches_probe(decoder, test_video):
    with decoder.open_video(test_video) as h:
        info = h.info
        ref = decoder.probe(test_video)
        assert (info.num_frames, info.width, info.height) == (
            ref.num_frames, ref.width, ref.height)
        assert info.fps == pytest.approx(ref.fps)


def test_handle_read_matches_one_shot_decode(decoder, test_video):
    idx = [0, 7, 14, 29]
    one_shot = decoder.decode_frames(test_video, idx, 64, 80)
    with decoder.open_video(test_video) as h:
        got = h.read(idx, out_h=64, out_w=80)
    assert got is not None
    np.testing.assert_array_equal(got, one_shot)


def test_handle_reads_are_independent(decoder, test_video):
    """Backward targets, repeats, and reads after a prior read hit EOF all
    work on one handle (each read reseeks)."""
    with decoder.open_video(test_video) as h:
        a = h.read([20, 29], out_h=32, out_w=32)   # runs to EOF
        b = h.read([0, 1], out_h=32, out_w=32)     # backward after EOF
        c = h.read([5, 5, 2], out_h=32, out_w=32)  # repeats + unsorted
    for clip in (a, b, c):
        assert clip is not None
    np.testing.assert_array_equal(
        b, decoder.decode_frames(test_video, [0, 1], 32, 32))
    np.testing.assert_array_equal(
        c, decoder.decode_frames(test_video, [5, 5, 2], 32, 32))


def test_handle_output_size_switch(decoder, test_video):
    """The cached swscale context rebuilds when the output size changes."""
    with decoder.open_video(test_video) as h:
        a = h.read([3], out_h=48, out_w=48)
        b = h.read([3], out_h=96, out_w=128)
        c = h.read([3], out_h=48, out_w=48)
    assert a.shape == (1, 48, 48, 3) and b.shape == (1, 96, 128, 3)
    np.testing.assert_array_equal(a, c)
    np.testing.assert_array_equal(
        b, decoder.decode_frames(test_video, [3], 96, 128))


def test_handle_open_missing_file(decoder):
    assert decoder.open_video("/nonexistent/clip.mp4") is None


def test_handle_closed_read_raises(decoder, test_video):
    h = decoder.open_video(test_video)
    h.close()
    h.close()  # idempotent
    with pytest.raises(ValueError):
        h.read([0], out_h=32, out_w=32)


def test_eof_clamp_yields_last_decoded_pixels(decoder, tmp_path):
    """Targets at/past EOF clamp to the LAST DECODED frame's pixels. (The
    clamp previously scaled from the post-EOF-drain frame object, which
    avcodec_receive_frame had already unreffed — null planes, garbage
    output, 'bad src image pointers' warnings.) MJPEG-in-MP4 loses its
    final sample to a mov-demux quirk, making .mp4 fixtures the natural
    repro: index n-1 exercises the clamp."""
    path = str(tmp_path / "clamp.mp4")
    assert decoder.encode_test_video(path, w=64, h=64, n_frames=40, seed=11)
    full = decoder.decode_frames(path, list(range(39)), 64, 64)
    got = decoder.decode_frames(path, [0, 39, 500], 64, 64)
    np.testing.assert_array_equal(got[0], full[0])
    np.testing.assert_array_equal(got[1], full[38])  # clamp at EOF
    np.testing.assert_array_equal(got[2], full[38])  # clamp far past EOF
