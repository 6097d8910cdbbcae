"""Golden BPE tokenizer tests.

Expected token ids were generated once from the reference tokenizer
(/root/reference/clip/simple_tokenizer.py, ftfy fix_text stubbed to
identity — it is the identity on all these inputs) and are hard-coded
here, so the test runs standalone.
"""

import numpy as np
import pytest

from mvlpt_tpu.tokenizer import get_tokenizer, tokenize

GOLDENS = [
    ("a photo of a cat.", [320, 1125, 539, 320, 2368, 269]),
    (
        "X X X X X X X X X X X X X X X X oxford pets.",
        [343] * 16 + [8824, 7663, 269],
    ),
    (
        "a centered satellite photo of Annual Crop Land.",
        [320, 24584, 10316, 1125, 539, 2906, 9955, 973, 269],
    ),
    (
        "This is a photo of a 1997 Dodge Caravan SE Minivan!!",
        [589, 533, 320, 1125, 539, 320, 272, 280, 280, 278, 12093, 18566, 611, 1810, 2451, 748],
    ),
    (
        "itap of a weird-looking dog, 100% cute élève",
        [529, 2728, 539, 320, 5613, 268, 1312, 1929, 267, 272, 271, 271, 260, 2242, 3459, 75, 12138, 563],
    ),
    ("graffiti of the number: 42", [11676, 539, 518, 2842, 281, 275, 273]),
    ("   spaces\tand\nnewlines   ", [9006, 537, 1218, 3418]),
    (
        "don't stop believin' <|startoftext|> hi <|endoftext|>",
        [847, 713, 1691, 4972, 530, 262, 49406, 1883, 49407],
    ),
]


def test_vocab_size():
    tok = get_tokenizer()
    assert tok.vocab_size == 49408
    assert tok.sot_token == 49406
    assert tok.eot_token == 49407


@pytest.mark.parametrize("text,expected", GOLDENS)
def test_encode_goldens(text, expected):
    assert get_tokenizer().encode(text) == expected


def test_tokenize_padding_and_specials():
    arr = tokenize(["a photo of a cat."], context_length=77)
    assert arr.shape == (1, 77)
    assert arr[0, 0] == 49406
    assert arr[0, 7] == 49407
    assert (arr[0, 8:] == 0).all()
    # EOT is the max id -> argmax recovers its position (clip/model.py:350)
    assert int(np.argmax(arr[0])) == 7


def test_tokenize_short_context_cut():
    # CUT_CONTEXTLEN passes shorter context lengths (mvlpt.py:305)
    arr = tokenize("a photo of a cat.", context_length=9)
    assert arr.shape == (1, 9)
    with pytest.raises(RuntimeError):
        tokenize("a photo of a cat.", context_length=7)
    truncated = tokenize("a photo of a cat.", context_length=7, truncate=True)
    assert truncated[0, -1] == 49407


def test_decode_roundtrip():
    tok = get_tokenizer()
    ids = tok.encode("a photo of a dog.")
    assert tok.decode(ids).strip() == "a photo of a dog ."
