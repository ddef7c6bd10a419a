"""Tests for group-by batching and text-pivot labeling."""

import numpy as np

from alpro_tpu.data.datasets import mk_input_group
from alpro_tpu.data.masking import select_text_pivots
from fixtures import make_tokenizer


def test_mk_input_group_train():
    pairs = [("v0", i) for i in range(5)] + [("v1", i) for i in range(2)]
    groups = mk_input_group(pairs, max_n_example_per_group=2,
                            rng=np.random.default_rng(0))
    total = sum(len(exs) for _, exs in groups)
    assert total == 7
    assert all(len(exs) <= 2 for _, exs in groups)
    v0_groups = [g for g in groups if g[0] == "v0"]
    assert len(v0_groups) == 3  # 2+2+1


def test_mk_input_group_eval_singletons():
    pairs = [("v0", 0), ("v0", 1), ("v1", 2)]
    groups = mk_input_group(pairs, is_train=False)
    assert all(len(exs) == 1 for _, exs in groups)
    assert len(groups) == 3


def test_select_text_pivots_whole_words():
    tok = make_tokenizer()
    enc = tok(["a dog runs", "dogcat jumps"], max_length=10)
    ids = enc["input_ids"]
    ent2id = {"dog": 3, "runs": 7, "dogcat": 11}
    labels, word_start = select_text_pivots(
        ids, tok, ent2id, rng=np.random.default_rng(0)
    )
    # row 0: 'dog' and 'runs' labeled at their first-piece positions
    row0 = labels[0]
    assert set(row0[row0 != -100]) == {3, 7}
    # row 1: 'dogcat' splits into pieces; the label sits on the FIRST piece
    row1 = labels[1]
    lab_pos = np.where(row1 != -100)[0]
    assert len(lab_pos) == 1 and row1[lab_pos[0]] == 11
    assert word_start[1, lab_pos[0]]
    # the following ## pieces are not word starts
    assert not word_start[1, lab_pos[0] + 1]


def test_select_text_pivots_ignores_special():
    tok = make_tokenizer()
    enc = tok(["dog"], max_length=6)
    labels, ws = select_text_pivots(
        enc["input_ids"], tok, {"dog": 1}, rng=np.random.default_rng(0)
    )
    assert labels[0, 0] == -100  # CLS
    assert (labels[0] != -100).sum() == 1
