"""Data-layer tests: samplers, masking, erase, tokenizer, datasets, loaders."""

import numpy as np
import pytest

from alpro_tpu.data import (
    mask_batch_text_tokens,
    random_erase,
    sample_frame_indices,
    normalize_pixels,
)
from alpro_tpu.data.datasets import (
    PretrainCollator,
    PretrainVideoDataset,
    RetrievalCollator,
    RetrievalDataset,
    RetrievalEvalDataset,
    VideoQADataset,
    load_jsonl,
)
from alpro_tpu.data.loader import BatchLoader, InfiniteIterator, MetaLoader
from alpro_tpu.data.tokenization import WordPieceTokenizer, make_test_vocab

from fixtures import make_tokenizer, write_qa_dataset, write_video_dataset


# ---- frame sampling ------------------------------------------------------
@pytest.mark.parametrize("strategy", ["uniform", "nlvl_uniform", "nlvl_rand", "rand", "headtail"])
def test_samplers_clean_in_range_and_count(strategy):
    rng = np.random.default_rng(0)
    for vlen in [8, 30, 100, 101]:
        idx = sample_frame_indices(vlen, 8, strategy, rng, exact=False)
        assert len(idx) == 8
        assert (idx >= 0).all() and (idx < vlen).all()


def test_uniform_exact_matches_reference_formula():
    """Reference `dataset_base.py:154`: np.arange(start, end, vlen/num_frm,
    dtype=int) on numpy-1.x == arange with start/stop/step cast to int.
    Asserted index-for-index over a (vlen, num_frm) grid, including counts
    > num_frm (the reference feeds those straight to the model)."""
    for vlen in [8, 16, 30, 31, 100, 101, 300, 997]:
        for num_frm in [2, 4, 8, 16]:
            if vlen < num_frm:
                continue
            expected = np.arange(0, int(vlen), int(vlen / num_frm))
            got = sample_frame_indices(vlen, num_frm, "uniform")
            np.testing.assert_array_equal(got, expected, err_msg=f"{vlen=} {num_frm=}")
    # the headline quirk: vlen=30, num_frm=8 -> step 3 -> TEN indices
    np.testing.assert_array_equal(
        sample_frame_indices(30, 8, "uniform"),
        [0, 3, 6, 9, 12, 15, 18, 21, 24, 27],
    )
    # start/end window (timestamped clips)
    np.testing.assert_array_equal(
        sample_frame_indices(30, 8, "uniform", start_idx=5, end_idx=25),
        np.arange(5, 25, 3),
    )
    # vlen < num_frm truncates the step to 0: reference numpy raises, the
    # dataset's try/except resamples
    with pytest.raises(ValueError):
        sample_frame_indices(5, 8, "uniform")


def test_nlvl_uniform_exact_matches_reference_formula():
    for vlen in [8, 30, 100, 101, 300]:
        for num_frm in [4, 8, 16]:
            expected = np.arange(0, vlen, vlen / num_frm).astype(int)
            got = sample_frame_indices(vlen, num_frm, "nlvl_uniform")
            np.testing.assert_array_equal(got, expected)
    # windowed: count != num_frm, exactly like the reference
    expected = np.arange(10, 50, 100 / 8).astype(int)
    got = sample_frame_indices(100, 8, "nlvl_uniform", start_idx=10, end_idx=50)
    np.testing.assert_array_equal(got, expected)


def test_headtail_exact_reference_counts():
    """Reference draws num_frm//2 from each half: odd num_frm yields
    num_frm-1 indices; head and tail sorted separately."""
    rng = np.random.default_rng(1)
    idx = sample_frame_indices(100, 8, "headtail", rng)
    assert len(idx) == 8
    assert (idx[:4] < 50).all() and (idx[4:] >= 50).all()
    assert (np.diff(idx[:4]) > 0).all() and (np.diff(idx[4:]) > 0).all()
    idx7 = sample_frame_indices(100, 7, "headtail", rng)
    assert len(idx7) == 6  # reference quirk: 2 * (7 // 2)


def test_rand_exact_raises_short():
    rng = np.random.default_rng(2)
    with pytest.raises(ValueError):
        sample_frame_indices(5, 8, "rand", rng)
    idx = sample_frame_indices(20, 8, "rand", rng)
    assert len(idx) == 8 and len(set(idx.tolist())) == 8


def test_uniform_deterministic():
    a = sample_frame_indices(100, 8, "uniform")
    b = sample_frame_indices(100, 8, "uniform")
    np.testing.assert_array_equal(a, b)


def test_fit_num_frames():
    from alpro_tpu.data.sampling import fit_num_frames

    idx = np.array([0, 3, 6, 9, 12, 15, 18, 21, 24, 27])
    fitted = fit_num_frames(idx, 8)
    assert len(fitted) == 8
    assert fitted[0] == 0 and fitted[-1] == 27
    assert (np.diff(fitted) > 0).all()
    np.testing.assert_array_equal(fit_num_frames(np.array([1, 2]), 4), [1, 2, 2, 2])
    np.testing.assert_array_equal(fit_num_frames(idx, 10), idx)


# ---- MLM masking ---------------------------------------------------------
def test_mlm_masking_statistics():
    tok = make_tokenizer()
    rng = np.random.default_rng(0)
    ids = np.full((200, 20), tok.convert_tokens_to_ids("dog"), dtype=np.int64)
    ids[:, 0] = tok.cls_token_id
    ids[:, -1] = tok.sep_token_id
    masked, labels = mask_batch_text_tokens(ids, tok, rng=rng)
    # special positions never masked
    assert (labels[:, 0] == -100).all() and (labels[:, -1] == -100).all()
    sel = labels != -100
    frac = sel.mean()
    assert 0.10 < frac < 0.20, frac  # ~15%
    # of masked: ~80% [MASK]
    frac_mask_tok = (masked[sel] == tok.mask_token_id).mean()
    assert 0.7 < frac_mask_tok < 0.9
    # unmasked positions unchanged
    assert (masked[~sel] == ids[~sel]).all()


def test_mlm_never_masks_padding():
    tok = make_tokenizer()
    ids = np.full((50, 10), tok.pad_token_id, dtype=np.int64)
    masked, labels = mask_batch_text_tokens(ids, tok, rng=np.random.default_rng(0))
    assert (labels == -100).all()
    np.testing.assert_array_equal(masked, ids)


# ---- random erase --------------------------------------------------------
def test_random_erase_patch_alignment():
    rng = np.random.default_rng(0)
    frames = rng.integers(1, 255, (4, 64, 64, 3)).astype(np.uint8)
    for seed in range(10):
        crop, mask, context = random_erase(
            frames, patch_size=16, rng=np.random.default_rng(seed)
        )
        assert mask.shape == (4, 4)
        assert crop.shape == frames.shape and context.shape == frames.shape
        # complementary: crop nonzero exactly where context zeroed
        erased = mask == 0
        assert erased.any() and (~erased).any()
        up = np.kron(erased, np.ones((16, 16), bool))  # patch grid → pixels
        assert (crop[:, ~up, :] == 0).all()
        np.testing.assert_array_equal(crop[:, up, :], frames[:, up, :])
        assert (context[:, up, :] == 0).all()
        np.testing.assert_array_equal(context[:, ~up, :], frames[:, ~up, :])


# ---- tokenizer -----------------------------------------------------------
def test_wordpiece_roundtrip():
    tok = make_tokenizer()
    enc = tok(["a dog runs", "the cat jumps"], max_length=8)
    assert enc["input_ids"].shape == (2, 8)
    assert enc["input_ids"][0, 0] == tok.cls_token_id
    assert tok.decode_pieces(enc["input_ids"][0]) == "a dog runs"
    # mask covers exactly the non-pad prefix
    row = enc["input_ids"][1]
    n = (row != tok.pad_token_id).sum()
    assert enc["attention_mask"][1, :n].all()
    assert not enc["attention_mask"][1, n:].any()


def test_wordpiece_subword_fallback():
    tok = make_tokenizer()
    pieces = tok.tokenize("dogcat")  # not a vocab word → subword pieces
    assert len(pieces) >= 2
    assert pieces[0] in tok.vocab and all(p in tok.vocab for p in pieces)


def test_truncation():
    tok = make_tokenizer()
    enc = tok(["a dog runs and jumps and runs and jumps"], max_length=5)
    assert enc["input_ids"].shape == (1, 5)
    assert enc["input_ids"][0, -1] == tok.sep_token_id


# ---- datasets + collators ------------------------------------------------
def test_retrieval_dataset_and_collator(tmp_path):
    ann, vid_dir, rows = write_video_dataset(str(tmp_path), n_videos=6)
    ds = RetrievalDataset(
        load_jsonl(ann), vid_dir, num_frm=4, resize_size=48, crop_size=32,
    )
    tok = make_tokenizer()
    col = RetrievalCollator(tok, max_txt_len=12)
    loader = BatchLoader(ds, col, batch_size=3)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["visual_inputs"].shape == (3, 4, 32, 32, 3)
    assert b["visual_inputs"].dtype == np.uint8
    assert b["text_input_ids"].shape == (3, 12)
    x = normalize_pixels(b["visual_inputs"].astype(np.float32))
    assert abs(float(x.mean())) < 3.0


def test_decode_failure_resamples(tmp_path):
    ann, vid_dir, rows = write_video_dataset(str(tmp_path), n_videos=4)
    import os

    # corrupt one file
    with open(os.path.join(vid_dir, "vid001.npy"), "wb") as f:
        f.write(b"not a numpy file")
    ds = RetrievalDataset(
        load_jsonl(ann), vid_dir, num_frm=2, resize_size=48, crop_size=32,
    )
    out = ds[1]  # must fall back to a different sample
    assert out["clip"].shape == (2, 32, 32, 3)


def test_retrieval_eval_dataset(tmp_path):
    ann, vid_dir, rows = write_video_dataset(str(tmp_path), n_videos=5)
    ds = RetrievalEvalDataset(
        load_jsonl(ann), vid_dir, num_frm=2, resize_size=48, crop_size=32,
    )
    assert len(ds) == 5
    assert len(ds.texts) == 5
    v = ds.get_video(0)
    assert v["clip"].shape == (2, 32, 32, 3)
    assert ds.gt_txt_id2vid_id[rows[0]["txt_id"]] == rows[0]["vid_id"]


def test_qa_dataset(tmp_path):
    ann, vid_dir, rows, ans2label = write_qa_dataset(str(tmp_path))
    ds = VideoQADataset(
        load_jsonl(ann), vid_dir, ans2label, num_frm=2, resize_size=48,
        crop_size=32,
    )
    ex = ds[0]
    assert ex["label"] == ans2label[rows[0]["answer"]]
    results = [{"question_id": r["question_id"], "answer": ans2label[r["answer"]]} for r in rows]
    metrics = ds.evaluate_qa(results)
    assert metrics["overall_acc"] == 1.0
    assert "what_acc" in metrics


def test_pretrain_collator_mlm_and_mpm(tmp_path):
    ann, vid_dir, rows = write_video_dataset(str(tmp_path), n_videos=4)
    ds = PretrainVideoDataset(
        load_jsonl(ann), vid_dir, num_frm=2, resize_size=48, crop_size=32,
    )
    tok = make_tokenizer()
    col = PretrainCollator(tok, max_txt_len=10, mlm=True, mpm=True, patch_size=16)
    loader = BatchLoader(ds, col, batch_size=2)
    b = next(iter(loader))
    assert b["mlm_text_input_ids"].shape == b["text_input_ids"].shape
    assert b["mpm_mask"].shape == (2, 2, 2)  # 32/16 grid
    assert b["crop_visual_inputs"].shape == b["visual_inputs"].shape
    assert (b["mlm_labels"][b["mlm_labels"] != -100] >= 0).all()


# ---- loaders -------------------------------------------------------------
def test_meta_loader_mixing_deterministic():
    la = [("a", i) for i in range(30)]
    lb = [("b", i) for i in range(10)]

    class L(list):
        pass

    m1 = MetaLoader({"a": la, "b": lb}, accum_steps=2, seed=7)
    m2 = MetaLoader({"a": la, "b": lb}, accum_steps=2, seed=7)
    seq1 = [next(m1)[0] for _ in range(40)]
    seq2 = [next(m2)[0] for _ in range(40)]
    assert seq1 == seq2
    # accum pairs share the task
    assert all(seq1[i] == seq1[i + 1] for i in range(0, 40, 2))
    assert 0.5 < seq1.count("a") / 40  # ~75% from dataset sizes


def test_infinite_iterator_cycles():
    it = InfiniteIterator([1, 2, 3])
    vals = [next(it) for _ in range(7)]
    assert vals == [1, 2, 3, 1, 2, 3, 1]


# ---- prompt templates ----------------------------------------------------
def test_prompt_templates_match_reference_verbatim():
    """Exact string parity with `get_video_prompt_templates` /
    `get_image_prompt_templates` (`/root/reference/src/pretrain/
    run_pretrain_sparse.py:326-362`), extracted from the reference source at
    test time so any drift fails loudly."""
    import ast
    import pathlib

    from alpro_tpu.cli.prompts import IMAGE_TEMPLATES, VIDEO_TEMPLATES

    ref = pathlib.Path("/root/reference/src/pretrain/run_pretrain_sparse.py")
    if not ref.exists():
        import pytest as _pytest

        _pytest.skip("reference tree not mounted")
    tree = ast.parse(ref.read_text())
    found = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name in (
            "get_video_prompt_templates", "get_image_prompt_templates",
        ):
            lists = [n for n in ast.walk(node) if isinstance(n, ast.List)]
            assert len(lists) == 1
            found[node.name] = [ast.literal_eval(e) for e in lists[0].elts]
    assert found["get_video_prompt_templates"] == VIDEO_TEMPLATES
    assert found["get_image_prompt_templates"] == IMAGE_TEMPLATES


# ---- worker-pool loader ----------------------------------------------------
def test_batchloader_workers_preserve_order_and_content():
    class SquareDataset:
        def __len__(self):
            return 37

        def __getitem__(self, i):
            return i * i

    collate = lambda items: list(items)
    kw = dict(batch_size=4, shuffle=True, drop_last=True, seed=5)
    serial = list(BatchLoader(SquareDataset(), collate, **kw))
    pooled = list(BatchLoader(SquareDataset(), collate, num_workers=3, **kw))
    assert serial == pooled


def test_threadsafe_rng_main_thread_matches_default_rng():
    from alpro_tpu.data.rng import ThreadSafeRng

    a = ThreadSafeRng(123)
    b = np.random.default_rng(123)
    assert a.integers(0, 1000) == b.integers(0, 1000)
    np.testing.assert_array_equal(a.random(5), b.random(5))


def test_threadsafe_rng_distinct_streams_per_thread():
    import threading

    from alpro_tpu.data.rng import ThreadSafeRng

    rng = ThreadSafeRng(7)
    draws = {}

    def worker(name):
        draws[name] = [float(rng.random()) for _ in range(50)]

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    flat = [tuple(v) for v in draws.values()]
    assert len(set(flat)) == 3  # independent streams, no shared state


def test_random_resized_crop_distribution():
    """Crop areas follow scale=(0.2, 1.0) of the source, aspect stays in
    (3/4, 4/3), output is always (size, size) bicubic
    (`dataset_pretrain_sparse.py:136-139` RandomResizedCrop semantics)."""
    from alpro_tpu.data.transforms import random_resized_crop

    rng = np.random.default_rng(0)
    # a gradient image so crops from different boxes differ
    img = np.arange(64 * 64 * 3, dtype=np.uint8).reshape(64, 64, 3)
    outs = [random_resized_crop(img, 32, rng) for _ in range(50)]
    assert all(o.shape == (32, 32, 3) and o.dtype == np.uint8 for o in outs)
    uniq = {o.tobytes() for o in outs}
    assert len(uniq) > 30, "crop boxes should vary"
    # scale=(1,1), ratio=(1,1): the crop is the full square image
    from PIL import Image

    full = np.asarray(Image.fromarray(img).resize((32, 32), Image.BICUBIC))
    got = random_resized_crop(img, 32, rng, scale=(1.0, 1.0), ratio=(1.0, 1.0))
    np.testing.assert_array_equal(got, full)


def test_random_hflip_probability():
    from alpro_tpu.data.transforms import random_hflip

    rng = np.random.default_rng(1)
    img = np.zeros((4, 4, 3), np.uint8)
    img[:, 0] = 255  # left column marked
    flips = sum(
        bool(random_hflip(img, rng)[0, -1, 0]) for _ in range(400)
    )
    assert 140 < flips < 260  # ~Binomial(400, .5)


def test_pretrain_image_dataset_reference_aug_pipeline(tmp_path):
    """Train: RandomResizedCrop + flip + RandAugment applied to the single
    image then repeated (all frames identical, crop-size output, draws
    differ); eval: deterministic resize + center crop."""
    import json

    from alpro_tpu.data.datasets import PretrainImageDataset

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(2)
    rows = []
    for i in range(3):
        arr = rng.integers(0, 255, size=(64, 80, 3), dtype=np.uint8)
        np.save(str(img_dir / f"img{i}.npy"), arr)
        rows.append({"vid_id": f"img{i}", "txt": "a dog runs"})

    ds = PretrainImageDataset(
        rows, str(img_dir), num_frm=3, resize_size=48, crop_size=32, seed=0,
        is_train=True,
    )
    ex = ds[0]
    clip = ex["clip"]
    assert clip.shape == (3, 32, 32, 3) and clip.dtype == np.uint8
    # transform-then-repeat: every frame identical (temporal consistency)
    np.testing.assert_array_equal(clip[0], clip[1])
    np.testing.assert_array_equal(clip[0], clip[2])
    # stochastic across draws
    draws = {ds[0]["clip"].tobytes() for _ in range(6)}
    assert len(draws) > 1

    ds_eval = PretrainImageDataset(
        rows, str(img_dir), num_frm=3, resize_size=48, crop_size=32, seed=0,
        is_train=False,
    )
    a, b = ds_eval[1]["clip"], ds_eval[1]["clip"]
    np.testing.assert_array_equal(a, b)
    assert a.shape == (3, 32, 32, 3)


def test_batchloader_shards_equal_size():
    """Shards pad with wrap-around like torch's DistributedSampler: every
    shard yields the SAME number of batches and __len__ agrees — lockstep
    multi-host consumers never desync (15 items, 2 shards, bs=4)."""

    class _Items:
        def __len__(self):
            return 15

        def __getitem__(self, i):
            return {"x": i}

    collate = lambda ex: {"x": np.asarray([e["x"] for e in ex])}  # noqa: E731
    per_shard = []
    for shard in (0, 1):
        loader = BatchLoader(_Items(), collate, batch_size=4, shuffle=False,
                             num_shards=2, shard_id=shard)
        batches = list(loader)
        assert len(batches) == len(loader)
        per_shard.append({int(v) for b in batches for v in b["x"]})
    assert len(per_shard[0]) and len(per_shard[1])
    # union covers the dataset (padding duplicates one wrapped index)
    assert per_shard[0] | per_shard[1] == set(range(15))


def test_device_prefetcher_propagates_worker_errors():
    from alpro_tpu.data.loader import DevicePrefetcher
    import pytest

    def gen():
        yield 1
        raise ValueError("corrupt video")

    pf = DevicePrefetcher(gen(), put=lambda x: x, depth=2)
    assert next(pf) == 1
    with pytest.raises(RuntimeError, match="prefetch worker failed") as ei:
        next(pf)
    assert isinstance(ei.value.__cause__, ValueError)


def test_device_prefetcher_close_unblocks_worker():
    from alpro_tpu.data.loader import DevicePrefetcher

    def gen():
        for i in range(100):
            yield i

    pf = DevicePrefetcher(gen(), put=lambda x: x, depth=2)
    assert next(pf) == 0
    pf.close()  # abandon early; worker must exit, not stay blocked on put
    assert not pf._thread.is_alive()


def test_meta_loader_rejects_all_empty():
    import pytest

    class _Empty:
        def __len__(self):
            return 0

        def __iter__(self):
            return iter(())

    with pytest.raises(AssertionError, match="zero weight"):
        MetaLoader({"a": _Empty(), "b": _Empty()})
