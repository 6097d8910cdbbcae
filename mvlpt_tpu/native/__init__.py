"""ctypes binding + on-demand build for the native image-pipeline core.

``imagepipe.cpp`` supplies JPEG/PNG entropy decode and Pillow-exact
convolution resampling as a C library; this module compiles it once
(cached by source hash under ``~/.cache/mvlpt_tpu/native``, override with
``MVLPT_TPU_NATIVE_CACHE``) and exposes numpy-facing wrappers. ctypes
releases the GIL during each call, so the threaded DataLoader
(data/loader.py) parallelizes decode across cores exactly like the
reference's torch DataLoader workers do (feature.py:74-96) — but without
a torch dependency.

The fast path covers baseline/progressive JPEG (grayscale + YCbCr + RGB)
and non-interlaced 8-bit gray/RGB PNG; everything else reports
"unsupported" and callers fall back to PIL per image, keeping output
bit-identical to the pure-PIL backend in all cases.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

_SRC = Path(__file__).with_name("imagepipe.cpp")

OK = 0
UNSUPPORTED = 1
CORRUPT = 2
BADARGS = 3

FILTER_IDS = {"bilinear": 0, "bicubic": 1, "lanczos": 2}

_lib = None
_lib_error: str | None = None


class NativeUnavailable(RuntimeError):
    """The native core could not be built/loaded on this host."""


def _cache_dir() -> Path:
    env = os.environ.get("MVLPT_TPU_NATIVE_CACHE")
    if env:
        return Path(env)
    return Path.home() / ".cache" / "mvlpt_tpu" / "native"


def _build(src_path: Path = _SRC, stem: str = "imagepipe",
           link: tuple[str, ...] = ("-ljpeg", "-lpng")) -> Path:
    src = src_path.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    out = _cache_dir() / f"lib{stem}-{tag}.so"
    if out.exists():
        return out
    out.parent.mkdir(parents=True, exist_ok=True)
    with tempfile.NamedTemporaryFile(
            suffix=".so", dir=out.parent, delete=False) as tmp:
        tmp_path = Path(tmp.name)
    cmd = [
        "g++", "-O3", "-fPIC", "-shared", "-std=c++17", str(src_path),
        "-o", str(tmp_path), *link,
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        tmp_path.unlink(missing_ok=True)
        raise NativeUnavailable(f"g++ invocation failed: {e}") from e
    if proc.returncode != 0:
        tmp_path.unlink(missing_ok=True)
        raise NativeUnavailable(
            f"native {stem} build failed:\n{proc.stderr[-2000:]}")
    os.replace(tmp_path, out)  # atomic: concurrent builders race safely
    return out


def _load():
    global _lib, _lib_error
    if _lib is not None:
        return _lib
    if _lib_error is not None:
        raise NativeUnavailable(_lib_error)
    try:
        lib = ctypes.CDLL(str(_build()))
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.mvlpt_probe.argtypes = [u8p, ctypes.c_int64, i32p, i32p, i32p]
        lib.mvlpt_probe.restype = ctypes.c_int
        lib.mvlpt_decode.argtypes = [u8p, ctypes.c_int64, u8p,
                                     ctypes.c_int32, ctypes.c_int32]
        lib.mvlpt_decode.restype = ctypes.c_int
        lib.mvlpt_resample.argtypes = [
            u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, u8p,
        ]
        lib.mvlpt_resample.restype = ctypes.c_int
        lib.mvlpt_jpeg_scaled_dims.argtypes = [u8p, ctypes.c_int64,
                                               ctypes.c_int32, i32p, i32p]
        lib.mvlpt_jpeg_scaled_dims.restype = ctypes.c_int
        lib.mvlpt_decode_jpeg_scaled.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int32, u8p, ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.mvlpt_decode_jpeg_scaled.restype = ctypes.c_int
        lib.mvlpt_abi_version.restype = ctypes.c_int
        if lib.mvlpt_abi_version() != 1:
            raise NativeUnavailable("ABI version mismatch")
    except NativeUnavailable as e:
        _lib_error = str(e)
        raise
    except OSError as e:
        _lib_error = f"loading native imagepipe failed: {e}"
        raise NativeUnavailable(_lib_error) from e
    _lib = lib
    return lib


def available() -> bool:
    """True when the native core builds and loads on this host."""
    try:
        _load()
        return True
    except NativeUnavailable:
        return False


def _as_u8p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _buf_ptr(data: bytes):
    return ctypes.cast(ctypes.c_char_p(data),
                       ctypes.POINTER(ctypes.c_uint8))


def probe(data: bytes) -> tuple[int, int] | None:
    """(width, height) when the fast path can decode ``data`` bit-exactly
    vs PIL; None when the caller should fall back to PIL."""
    lib = _load()
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    fmt = ctypes.c_int32()
    rc = lib.mvlpt_probe(_buf_ptr(data), len(data), ctypes.byref(w),
                         ctypes.byref(h), ctypes.byref(fmt))
    if rc != OK or w.value <= 0 or h.value <= 0:
        return None
    # honor PIL's decompression-bomb guard: oversize headers route to
    # the PIL path, which warns/raises exactly as the python backend
    from PIL import Image

    max_pixels = Image.MAX_IMAGE_PIXELS
    if max_pixels is not None and w.value * h.value > max_pixels:
        return None
    return w.value, h.value


def decode(data: bytes, w: int, h: int) -> np.ndarray | None:
    """Decode to an (h, w, 3) uint8 RGB array; None -> PIL fallback."""
    lib = _load()
    out = np.empty((h, w, 3), np.uint8)
    rc = lib.mvlpt_decode(_buf_ptr(data), len(data), _as_u8p(out), w, h)
    return out if rc == OK else None


def decode_jpeg_scaled(data: bytes, num: int) -> np.ndarray | None:
    """DCT-domain scaled JPEG decode at scale num/8 (num in 1..8) — the
    fast path behind DATALOADER.NATIVE_FAST_JPEG. Roughly (num/8)^2 the
    IDCT work of a full decode; output pixels are libjpeg's scaled IDCT,
    not identical to full-decode-then-resample. Returns the (h', w', 3)
    uint8 array or None (caller falls back to the exact path).

    Measured accuracy impact (tests/test_native_pipe.py::
    test_fast_jpeg_feature_and_logit_delta, photo-like 1024x768 q90
    JPEGs downscaled to a small eval size): pixel MAE ~1.0/255 eval /
    ~0.5/255 train-crop, ViT feature cosine >= 0.99999, max |logit
    delta| ~0.09 at logit scale 100, argmax unchanged. Safe for
    training and routine eval (the augmentation RNG stream is identical
    — crops are drawn in original pixel coordinates); turn it off when
    bit-parity with the PIL pipeline is itself the requirement (golden
    regression runs, cross-backend A/B)."""
    lib = _load()
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    rc = lib.mvlpt_jpeg_scaled_dims(_buf_ptr(data), len(data), num,
                                    ctypes.byref(w), ctypes.byref(h))
    if rc != OK or w.value <= 0 or h.value <= 0:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.mvlpt_decode_jpeg_scaled(_buf_ptr(data), len(data), num,
                                      _as_u8p(out), w.value, h.value)
    return out if rc == OK else None


# ------------------------------------------------------------- tokenizer

_BPE_SRC = Path(__file__).with_name("bpetok.cpp")


class NativeBpe:
    """C BPE core (bpetok.cpp): word split + greedy merges for cleaned
    lowercase ASCII text, bit-identical ids to the Python encoder.
    ``encode`` returns None when the input needs the Python path."""

    def __init__(self, merges_text: bytes):
        try:
            self._lib = ctypes.CDLL(
                str(_build(_BPE_SRC, "bpetok", link=())))
        except NativeUnavailable:
            raise
        lib = self._lib
        lib.mvlpt_bpe_create.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.mvlpt_bpe_create.restype = ctypes.c_void_p
        lib.mvlpt_bpe_destroy.argtypes = [ctypes.c_void_p]
        lib.mvlpt_bpe_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        lib.mvlpt_bpe_encode.restype = ctypes.c_int32
        for name in ("mvlpt_bpe_sot", "mvlpt_bpe_eot"):
            fn = getattr(lib, name)
            fn.argtypes = [ctypes.c_void_p]
            fn.restype = ctypes.c_int32
        self._h = lib.mvlpt_bpe_create(merges_text, len(merges_text))
        if not self._h:
            raise NativeUnavailable("BPE vocab parse failed in native core")
        self.sot = lib.mvlpt_bpe_sot(self._h)
        self.eot = lib.mvlpt_bpe_eot(self._h)

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.mvlpt_bpe_destroy(h)
            self._h = None

    def encode(self, cleaned_ascii: str) -> list[int] | None:
        data = cleaned_ascii.encode("ascii", errors="strict")
        cap = max(64, 4 * len(data) + 8)
        buf = (ctypes.c_int32 * cap)()
        n = self._lib.mvlpt_bpe_encode(self._h, data, len(data), buf, cap)
        if n == -1:  # buffer too small (pathological) — one retry
            cap = 16 * max(1, len(data))
            buf = (ctypes.c_int32 * cap)()
            n = self._lib.mvlpt_bpe_encode(self._h, data, len(data), buf,
                                           cap)
        if n < 0:
            return None
        return list(buf[:n])


def resample(arr: np.ndarray, box: tuple[float, float, float, float],
             out_w: int, out_h: int, interpolation: str) -> np.ndarray:
    """Pillow-exact ``img.resize((out_w, out_h), filter, box=box)`` on an
    (h, w, 3) uint8 array."""
    lib = _load()
    filter_id = FILTER_IDS[interpolation]
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) uint8, got {arr.shape} "
                         f"{arr.dtype}")
    arr = np.ascontiguousarray(arr)
    in_h, in_w = arr.shape[:2]
    out = np.empty((out_h, out_w, 3), np.uint8)
    rc = lib.mvlpt_resample(
        _as_u8p(arr), in_w, in_h, float(box[0]), float(box[1]),
        float(box[2]), float(box[3]), out_w, out_h, filter_id, _as_u8p(out))
    if rc != OK:
        raise ValueError(f"mvlpt_resample failed (rc={rc}) for box={box} "
                         f"out=({out_w}, {out_h})")
    return out
