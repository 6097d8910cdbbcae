"""Native C BPE core (mvlpt_tpu/native/bpetok.cpp) parity tests.

The native path must produce bit-identical token ids to the Python
encoder for every cleaned-lowercase-ASCII input, and must hand anything
else back to the Python path (returning None) rather than approximate
it."""

import os
import random
import string

import pytest

from mvlpt_tpu import native
from mvlpt_tpu.tokenizer.bpe import ClipBpeTokenizer, tokenize

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain not available here")


@pytest.fixture(scope="module")
def pair():
    tok_native = ClipBpeTokenizer()
    if tok_native._native is None:
        pytest.skip("native BPE did not initialize")
    os.environ["MVLPT_TPU_NO_NATIVE_BPE"] = "1"
    try:
        tok_py = ClipBpeTokenizer()
    finally:
        del os.environ["MVLPT_TPU_NO_NATIVE_BPE"]
    assert tok_py._native is None
    return tok_native, tok_py


CASES = [
    "a photo of a dog.",
    "A PHOTO of a Dog!!",                       # lowered before dispatch
    "it's a dog's life, isn't it?",             # contractions
    "class 123 number 9",                       # digits tokenized singly
    "hello-world_under.score",
    "don't!!!'s mix''d",                        # apostrophes inside runs
    "<|startoftext|> weird <|endoftext|>",      # special literals
    "'ll 'd 've 're 'm 's 't",
    "..,,;;''!!",
    "",
    "   ",
    "antidisestablishmentarianism",             # long merge chain
    "a  b\t c\n d",                             # whitespace collapse
    "price $5.99 (50% off)",
]

NON_ASCII = [
    "naïve café",                               # NFC + Python path
    "日本語 text",
    "emoji 🙂 here",
    "mixed ascii ünïcode tail",
    "ctrl\x01char",                             # control char punct-run
]


def test_ascii_cases_bit_identical(pair):
    tok_native, tok_py = pair
    for c in CASES:
        assert tok_native.encode(c) == tok_py.encode(c), c


def test_non_ascii_falls_back_and_matches(pair):
    tok_native, tok_py = pair
    for c in NON_ASCII:
        # equality is the contract; internally these route via Python
        assert tok_native.encode(c) == tok_py.encode(c), c


def test_ascii_fuzz_bit_identical(pair):
    tok_native, tok_py = pair
    rng = random.Random(0)
    alphabet = string.ascii_letters + string.digits + string.punctuation \
        + "  "
    for _ in range(300):
        s = "".join(rng.choice(alphabet)
                    for _ in range(rng.randint(0, 80)))
        assert tok_native.encode(s) == tok_py.encode(s), repr(s)


def test_tokenize_array_contract_unchanged(pair):
    # tokenize() golden behavior (SOT/EOT/padding/truncate) is covered by
    # test_tokenizer.py; here just confirm the native path flows through
    out = tokenize(["a photo of a cat."], context_length=77)
    assert out.shape == (1, 77)
    tok_native, _ = pair
    ids = tok_native.encode("a photo of a cat.")
    assert list(out[0][1:1 + len(ids)]) == ids


def test_native_handle_reports_specials(pair):
    tok_native, _ = pair
    assert tok_native._native.sot == tok_native.sot_token
    assert tok_native._native.eot == tok_native.eot_token
