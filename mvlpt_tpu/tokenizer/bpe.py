"""Byte-level BPE tokenizer, bit-exact with CLIP's text tokenization.

Behavioral contract (established against /root/reference/clip/
simple_tokenizer.py:62-132 and clip/clip.py:187-223, verified by golden
tests in tests/test_tokenizer.py):

  * GPT-2 byte->unicode mapping; merges read from the standard
    ``bpe_simple_vocab_16e6.txt.gz`` (49152-256-2+1 merge rules, final
    vocab size 49408 including ``<|startoftext|>``/``<|endoftext|>``).
  * Text cleanup: unicode NFC + double html-unescape + whitespace
    collapse + lowercase. (The reference additionally runs ftfy mojibake
    repair, which is the identity on well-formed text such as every
    classname/template in the benchmarks.)
  * ``tokenize``: SOT + BPE ids + EOT, zero-padded to ``context_length``
    (default 77, overridable — the CUT_CONTEXTLEN path passes shorter
    lengths, /root/reference/trainers/mvlpt.py:305).

The vocab file is resolved at runtime (env var / cache dirs) and can be
fetched with ``download_bpe_vocab``; it is pure data, identical for every
CLIP implementation.
"""

from __future__ import annotations

import gzip
import hashlib
import html
import os
import unicodedata
from functools import lru_cache

import numpy as np
import regex as re

BPE_VOCAB_FILENAME = "bpe_simple_vocab_16e6.txt.gz"
BPE_VOCAB_URL = (
    "https://github.com/openai/CLIP/raw/main/clip/bpe_simple_vocab_16e6.txt.gz"
)
SOT_TEXT = "<|startoftext|>"
EOT_TEXT = "<|endoftext|>"
_NUM_MERGES = 49152 - 256 - 2  # vocab 49408 = 256 bytes + 256 '</w>' + merges + 2 specials

_SEARCH_PATHS = (
    os.environ.get("MVLPT_TPU_BPE_PATH", ""),
    os.path.expanduser(f"~/.cache/mvlpt_tpu/{BPE_VOCAB_FILENAME}"),
    os.path.expanduser(f"~/.cache/clip/{BPE_VOCAB_FILENAME}"),
    os.path.join(os.path.dirname(__file__), "assets", BPE_VOCAB_FILENAME),
    f"/root/reference/clip/{BPE_VOCAB_FILENAME}",  # dev-box convenience
)


def find_bpe_vocab() -> str:
    for p in _SEARCH_PATHS:
        if p and os.path.isfile(p):
            return p
    raise FileNotFoundError(
        f"Cannot locate {BPE_VOCAB_FILENAME}. Set MVLPT_TPU_BPE_PATH or run "
        f"`python -m mvlpt_tpu.tokenizer.bpe download` (fetches {BPE_VOCAB_URL})."
    )


def download_bpe_vocab(dest: str | None = None) -> str:
    import urllib.request

    dest = dest or os.path.expanduser(f"~/.cache/mvlpt_tpu/{BPE_VOCAB_FILENAME}")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    urllib.request.urlretrieve(BPE_VOCAB_URL, dest)
    return dest


@lru_cache()
def _byte_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte->printable-unicode-char table."""
    keep = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    chars = keep[:]
    extra = 0
    for b in range(256):
        if b not in keep:
            keep.append(b)
            chars.append(256 + extra)
            extra += 1
    return dict(zip(keep, (chr(c) for c in chars)))


_WS_PAT = re.compile(r"\s+")  # precompiled: regex.sub() re-resolves
# flags on every call, which dominates encode() once BPE itself is native


def _clean_text(text: str) -> str:
    text = unicodedata.normalize("NFC", text)
    text = html.unescape(html.unescape(text))
    text = _WS_PAT.sub(" ", text)
    return text.strip()


class ClipBpeTokenizer:
    """Stateless-after-init BPE encoder/decoder over the CLIP vocab."""

    def __init__(self, bpe_path: str | None = None):
        bpe_path = bpe_path or find_bpe_vocab()
        with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
            raw = f.read()
        lines = raw.split("\n")
        merge_lines = lines[1 : _NUM_MERGES + 1]
        assert len(merge_lines) == _NUM_MERGES, len(merge_lines)
        merges = [tuple(line.split()) for line in merge_lines]

        self._byte_enc = _byte_to_unicode()
        self._byte_dec = {v: k for k, v in self._byte_enc.items()}

        base = list(self._byte_enc.values())
        vocab = base + [c + "</w>" for c in base]
        vocab.extend("".join(m) for m in merges)
        vocab.extend([SOT_TEXT, EOT_TEXT])

        self.encoder: dict[str, int] = {tok: i for i, tok in enumerate(vocab)}
        self.decoder: dict[int, str] = {i: tok for tok, i in self.encoder.items()}
        self._ranks: dict[tuple[str, str], int] = {m: i for i, m in enumerate(merges)}
        self._cache: dict[str, str] = {SOT_TEXT: SOT_TEXT, EOT_TEXT: EOT_TEXT}
        self._word_pat = re.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
            r"""[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            re.IGNORECASE,
        )

        # Native C fast path for cleaned lowercase ASCII (the common
        # case: every benchmark classname/template). Bit-identical ids
        # (tests/test_native_bpe.py); Python handles everything else.
        self._native = None
        if not os.environ.get("MVLPT_TPU_NO_NATIVE_BPE"):
            try:
                from mvlpt_tpu import native as _native_mod

                self._native = _native_mod.NativeBpe(
                    raw.encode("utf-8"))
                assert self._native.sot == self.sot_token
                assert self._native.eot == self.eot_token
            except Exception:  # toolchain-less host: silent Python path
                self._native = None

    @property
    def sot_token(self) -> int:
        return self.encoder[SOT_TEXT]

    @property
    def eot_token(self) -> int:
        return self.encoder[EOT_TEXT]

    @property
    def vocab_size(self) -> int:
        return len(self.encoder)

    def _apply_bpe(self, token: str) -> str:
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        parts = list(token[:-1]) + [token[-1] + "</w>"]
        if len(parts) == 1:
            out = parts[0]
            self._cache[token] = out
            return out
        while len(parts) > 1:
            pairs = [(parts[i], parts[i + 1]) for i in range(len(parts) - 1)]
            best = min(pairs, key=lambda p: self._ranks.get(p, float("inf")))
            if best not in self._ranks:
                break
            merged: list[str] = []
            i = 0
            while i < len(parts):
                if i < len(parts) - 1 and (parts[i], parts[i + 1]) == best:
                    merged.append(parts[i] + parts[i + 1])
                    i += 2
                else:
                    merged.append(parts[i])
                    i += 1
            parts = merged
        out = " ".join(parts)
        self._cache[token] = out
        return out

    def encode(self, text: str) -> list[int]:
        ids: list[int] = []
        text = _clean_text(text).lower()
        if self._native is not None and text.isascii():
            native_ids = self._native.encode(text)
            if native_ids is not None:
                return native_ids
        for word in re.findall(self._word_pat, text):
            word = "".join(self._byte_enc[b] for b in word.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._apply_bpe(word).split(" "))
        return ids

    def decode(self, ids) -> str:
        text = "".join(self.decoder[int(i)] for i in ids)
        raw = bytearray(self._byte_dec[c] for c in text)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")


_DEFAULT: ClipBpeTokenizer | None = None


def get_tokenizer() -> ClipBpeTokenizer:
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = ClipBpeTokenizer()
    return _DEFAULT


def tokenize(texts, context_length: int = 77, truncate: bool = False) -> np.ndarray:
    """Tokenize string(s) into an int32 array of shape (N, context_length).

    Matches /root/reference/clip/clip.py:187-223: SOT + BPE + EOT,
    zero-padded; raises on overflow unless ``truncate`` (which keeps the
    EOT as the final token).
    """
    if isinstance(texts, str):
        texts = [texts]
    tok = get_tokenizer()
    out = np.zeros((len(texts), context_length), dtype=np.int32)
    for row, text in enumerate(texts):
        ids = [tok.sot_token] + tok.encode(text) + [tok.eot_token]
        if len(ids) > context_length:
            if not truncate:
                raise RuntimeError(
                    f"Input {text!r} is too long for context length {context_length}"
                )
            ids = ids[:context_length]
            ids[-1] = tok.eot_token
        out[row, : len(ids)] = ids
    return out


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "download":
        path = download_bpe_vocab(sys.argv[2] if len(sys.argv) > 2 else None)
        digest = hashlib.sha256(open(path, "rb").read()).hexdigest()
        print(f"downloaded {path} sha256={digest}")
