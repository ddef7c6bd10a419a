"""C++ WordPiece tokenizer must match the python reference implementation."""

import numpy as np
import pytest

from alpro_tpu.data.tokenization import make_test_vocab
from fixtures import make_tokenizer


@pytest.fixture(scope="module")
def c_tok(tmp_path_factory):
    try:
        from alpro_tpu.media.binding import MediaDecoder
    except Exception as e:
        pytest.skip(f"media lib unavailable: {e}")
    vocab_path = str(tmp_path_factory.mktemp("tok") / "vocab.txt")
    with open(vocab_path, "w") as f:
        for tok in make_test_vocab():
            f.write(tok + "\n")
    return MediaDecoder().make_tokenizer(vocab_path)


CASES = [
    "a dog runs",
    "the cat JUMPS",
    "dogcat",
    "a man is playing ball!",
    "",
    "xyz qqq unknownwordhere",
    "what who how where when",
    "a, b; c! d? e",
]


def test_matches_python_reference(c_tok):
    py = make_tokenizer()
    for max_len in (6, 12, 40):
        pe = py(CASES, max_length=max_len)
        ce = c_tok(CASES, max_length=max_len)
        np.testing.assert_array_equal(pe["input_ids"], ce["input_ids"])
        np.testing.assert_array_equal(pe["attention_mask"], ce["attention_mask"])


def test_special_token_surface(c_tok):
    enc = c_tok(["a dog"], max_length=8)
    row = enc["input_ids"][0]
    assert row[0] == c_tok.cls_token_id
    mask = c_tok.get_special_tokens_mask(row.tolist())
    assert mask[0] == 1 and mask[-1] == 1  # CLS and PAD are special


def test_usable_by_mlm_masker(c_tok):
    from alpro_tpu.data.masking import mask_batch_text_tokens

    enc = c_tok(["a dog runs and jumps"] * 20, max_length=10)
    masked, labels = mask_batch_text_tokens(
        enc["input_ids"].astype(np.int64), c_tok,
        rng=np.random.default_rng(0),
    )
    assert (labels[:, 0] == -100).all()
    assert (labels != -100).any()
