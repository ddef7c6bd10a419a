"""Synthetic data fixtures: procedurally generated clips + annotations
(no dataset downloads — SURVEY.md §4 implication (e))."""

import json
import os

import numpy as np

from alpro_tpu.data.tokenization import WordPieceTokenizer, make_test_vocab

CAPTIONS = [
    "a dog runs",
    "the cat jumps",
    "a man is playing ball",
    "the woman runs",
    "a red ball",
    "the blue dog jumps",
    "a person is playing",
    "the green cat runs",
]


def make_clip(rng, t=4, h=64, w=64, label=0):
    """Distinct per-label synthetic pattern so retrieval is learnable."""
    base = rng.integers(0, 255, size=(1, h, w, 3), dtype=np.uint8)
    clip = np.repeat(base, t, axis=0).astype(np.int16)
    clip += (np.arange(t)[:, None, None, None] * (label + 1) * 5) % 50
    return np.clip(clip, 0, 255).astype(np.uint8)


def write_video_dataset(root, n_videos=8, t=6, h=64, w=64, seed=0):
    os.makedirs(os.path.join(root, "videos"), exist_ok=True)
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_videos):
        vid = f"vid{i:03d}"
        np.save(
            os.path.join(root, "videos", f"{vid}.npy"),
            make_clip(rng, t=t, h=h, w=w, label=i),
        )
        rows.append({"vid_id": vid, "txt": CAPTIONS[i % len(CAPTIONS)], "txt_id": i})
    ann = os.path.join(root, "ann.jsonl")
    with open(ann, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return ann, os.path.join(root, "videos"), rows


def write_qa_dataset(root, n=8, t=4, h=64, w=64, seed=0):
    os.makedirs(os.path.join(root, "videos"), exist_ok=True)
    rng = np.random.default_rng(seed)
    answers = ["dog", "cat", "ball", "red"]
    types = ["what", "who", "how", "where", "when"]
    rows = []
    for i in range(n):
        vid = f"qvid{i:03d}"
        np.save(
            os.path.join(root, "videos", f"{vid}.npy"),
            make_clip(rng, t=t, h=h, w=w, label=i),
        )
        rows.append(
            {
                "question_id": i,
                "question": f"what is the {answers[i % 4]}",
                "answer": answers[i % 4],
                "answer_type": types[i % 5],
                "vid_id": vid,
            }
        )
    ann = os.path.join(root, "qa.jsonl")
    with open(ann, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    ans2label = {a: i for i, a in enumerate(answers)}
    return ann, os.path.join(root, "videos"), rows, ans2label


def write_multichoice_qa_dataset(root, n=8, t=4, h=64, w=64, seed=0,
                                 n_options=3):
    """TGIF action/transition-style rows: options list + int answer index."""
    os.makedirs(os.path.join(root, "videos"), exist_ok=True)
    rng = np.random.default_rng(seed)
    opts_pool = ["the dog runs", "the cat jumps", "a man is playing",
                 "the woman runs", "a red ball"]
    rows = []
    for i in range(n):
        vid = f"mcvid{i:03d}"
        np.save(
            os.path.join(root, "videos", f"{vid}.npy"),
            make_clip(rng, t=t, h=h, w=w, label=i),
        )
        opts = [opts_pool[(i + j) % len(opts_pool)] for j in range(n_options)]
        rows.append(
            {
                "question_id": i,
                "question": "what is happening",
                "options": opts,
                "answer": i % n_options,
                "vid_id": vid,
            }
        )
    ann = os.path.join(root, "mc_qa.jsonl")
    with open(ann, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return ann, os.path.join(root, "videos"), rows


def make_tokenizer():
    return WordPieceTokenizer(make_test_vocab())


def write_image_dataset(root, n=6, h=64, w=64, seed=0):
    """CC3M-style (image, caption) rows as .npy single frames."""
    import os
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        iid = f"img{i:03d}"
        np.save(os.path.join(img_dir, f"{iid}.npy"), make_clip(rng, t=1, h=h, w=w, label=i)[0])
        rows.append({"vid_id": iid, "txt": CAPTIONS[i % len(CAPTIONS)]})
    ann = os.path.join(root, "img_ann.jsonl")
    with open(ann, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return ann, img_dir, rows
