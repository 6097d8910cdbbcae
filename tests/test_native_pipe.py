"""Native C++ image pipeline (mvlpt_tpu/native) parity tests.

The native backend must be *bit-identical* to the PIL backend — decode
(same libjpeg-turbo/libpng code paths), resampling (Pillow's exact
fixed-point convolution algorithm), RRC/flip RNG draw order, and the
final normalize arithmetic. Every test here asserts exact equality, not
tolerances."""

import io
import random

import numpy as np
import pytest
from PIL import Image

from mvlpt_tpu import native
from mvlpt_tpu.data.native_transform import (
    NativeEvalTransform,
    NativeTrainTransform,
)
from mvlpt_tpu.data.transforms import EvalTransform, TrainTransform

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native imagepipe not buildable here")

_PIL_FILTERS = {"bilinear": Image.BILINEAR, "bicubic": Image.BICUBIC,
                "lanczos": Image.LANCZOS}


def _rand_rgb(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (*shape, 3),
                                                np.uint8)


def _encode(arr, fmt, **kw):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, fmt, **kw)
    return buf.getvalue()


# ---------------------------------------------------------------- decode

def test_jpeg_decode_bit_exact():
    for seed, shape, q in [(0, (48, 64), 90), (1, (131, 97), 75),
                           (2, (17, 301), 100)]:
        data = _encode(_rand_rgb(shape, seed), "JPEG", quality=q)
        w, h = native.probe(data)
        assert (w, h) == (shape[1], shape[0])
        ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        np.testing.assert_array_equal(native.decode(data, w, h), ref)


def test_jpeg_progressive_and_gray():
    arr = _rand_rgb((60, 80), 3)
    data = _encode(arr, "JPEG", quality=85, progressive=True)
    w, h = native.probe(data)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(native.decode(data, w, h), ref)

    gray = np.random.default_rng(4).integers(0, 256, (50, 70), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(gray, "L").save(buf, "JPEG", quality=92)
    data = buf.getvalue()
    w, h = native.probe(data)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(native.decode(data, w, h), ref)


def test_png_decode_bit_exact():
    arr = _rand_rgb((33, 57), 5)
    data = _encode(arr, "PNG")
    w, h = native.probe(data)
    np.testing.assert_array_equal(native.decode(data, w, h), arr)

    gray = np.random.default_rng(6).integers(0, 256, (40, 22), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(gray, "L").save(buf, "PNG")
    data = buf.getvalue()
    w, h = native.probe(data)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(native.decode(data, w, h), ref)


def test_unsupported_formats_probe_none():
    arr = _rand_rgb((20, 20), 7)
    pal = Image.fromarray(arr).convert("P")
    buf = io.BytesIO()
    pal.save(buf, "PNG")
    assert native.probe(buf.getvalue()) is None  # palette -> PIL fallback
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "WEBP")
    assert native.probe(buf.getvalue()) is None
    rgba = Image.fromarray(arr).convert("RGBA")
    buf = io.BytesIO()
    rgba.save(buf, "PNG")
    assert native.probe(buf.getvalue()) is None  # alpha -> PIL fallback
    assert native.probe(b"not an image") is None


# -------------------------------------------------------------- resample

def test_resample_matches_pil_exactly():
    arr = _rand_rgb((48, 64), 8)
    img = Image.fromarray(arr)
    for out in [(224, 224), (17, 31), (64, 48), (128, 24), (300, 7)]:
        for name, pf in _PIL_FILTERS.items():
            for box in [None, (3, 5, 60, 40), (0.5, 1.25, 63.5, 47.75),
                        (10, 10, 11, 11)]:
                ref = np.asarray(img.resize(out, pf, box=box))
                got = native.resample(arr, box or (0, 0, 64, 48),
                                      out[0], out[1], name)
                np.testing.assert_array_equal(
                    got, ref, err_msg=f"{out} {name} {box}")


def test_resample_identity_and_errors():
    arr = _rand_rgb((16, 16), 9)
    np.testing.assert_array_equal(
        native.resample(arr, (0, 0, 16, 16), 16, 16, "bicubic"), arr)
    with pytest.raises(ValueError):
        native.resample(arr, (0, 0, 20, 16), 8, 8, "bicubic")  # box OOB
    with pytest.raises(ValueError):
        native.resample(arr.astype(np.float32), (0, 0, 16, 16), 8, 8,
                        "bicubic")


# ------------------------------------------------------------ transforms

def _both_train(data, size=32, to_uint8=False, seed=123):
    kw = dict(size=size, to_uint8=to_uint8)
    a = TrainTransform(**kw)(Image.open(io.BytesIO(data)),
                             rng=random.Random(seed))
    b = NativeTrainTransform(**kw)(data, rng=random.Random(seed))
    return a, b


def test_train_transform_parity_jpeg():
    data = _encode(_rand_rgb((90, 120), 10), "JPEG", quality=95)
    for seed in range(6):  # several seeds -> both flip branches, crops
        for u8 in (False, True):
            a, b = _both_train(data, to_uint8=u8, seed=seed)
            assert a.dtype == b.dtype
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_transform_parity_fallback_format():
    # WEBP is off the native fast path: must fall back to PIL and still
    # produce the identical array for the identical rng
    buf = io.BytesIO()
    Image.fromarray(_rand_rgb((64, 64), 11)).save(buf, "WEBP", lossless=True)
    data = buf.getvalue()
    for seed in range(3):
        a, b = _both_train(data, seed=seed)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_transform_parity():
    for shape in [(90, 120), (120, 90), (31, 224), (224, 224), (500, 35)]:
        data = _encode(_rand_rgb(shape, sum(shape)), "JPEG", quality=92)
        img = Image.open(io.BytesIO(data))
        for size in (32, 224, 33):
            a = EvalTransform(size=size)(img)
            b = NativeEvalTransform(size=size)(data)
            np.testing.assert_array_equal(a, b)
        # ELEVATER warp mode (center_crop_mode=False), incl. rectangular
        for size in ((64, 64), (48, 80)):
            a = EvalTransform(size=size, center_crop_mode=False)(img)
            b = NativeEvalTransform(size=size, center_crop_mode=False)(data)
            np.testing.assert_array_equal(a, b)


def test_eval_transform_gray_png_parity():
    gray = np.random.default_rng(13).integers(0, 256, (77, 118), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(gray, "L").save(buf, "PNG")
    data = buf.getvalue()
    a = EvalTransform(size=48)(Image.open(io.BytesIO(data)))
    b = NativeEvalTransform(size=48)(data)
    np.testing.assert_array_equal(a, b)


def test_one_bit_png_falls_back():
    # PIL opens 1-bit PNGs as mode "1" and resize() forces NEAREST for
    # that mode — off the bit-exact fast path, so probe must reject
    bw = (np.random.default_rng(16).random((60, 80)) > 0.5)
    buf = io.BytesIO()
    Image.fromarray(bw).save(buf, "PNG")  # mode "1", bit_depth 1
    data = buf.getvalue()
    assert native.probe(data) is None
    a = EvalTransform(size=32)(Image.open(io.BytesIO(data)))
    b = NativeEvalTransform(size=32)(data)
    np.testing.assert_array_equal(a, b)


def test_truncated_jpeg_raises_like_pil():
    data = _encode(_rand_rgb((64, 64), 17), "JPEG", quality=90)
    cut = data[: len(data) // 2]  # header intact, scan truncated
    with pytest.raises(OSError):
        EvalTransform(size=32)(Image.open(io.BytesIO(cut)))
    # native: decode reports corrupt -> PIL fallback raises the same
    with pytest.raises(OSError):
        NativeEvalTransform(size=32)(cut)


def test_decompression_bomb_guard(monkeypatch):
    from PIL import Image as PILImage

    data = _encode(_rand_rgb((64, 48), 18), "JPEG", quality=90)
    monkeypatch.setattr(PILImage, "MAX_IMAGE_PIXELS", 1000)  # 64*48 > 2x
    assert native.probe(data) is None  # oversize headers -> PIL path
    with pytest.raises(PILImage.DecompressionBombError):
        NativeEvalTransform(size=32)(data)


def test_fast_jpeg_mode():
    # fast mode: DCT-scaled decode for large JPEGs — same shapes, close
    # pixels (documented as not bit-identical), and the augmentation RNG
    # stream must be unchanged (crop params sampled in original coords)
    small = _rand_rgb((96, 128), 12)
    big = np.asarray(Image.fromarray(small).resize((1024, 768),
                                                   Image.BICUBIC))
    data = _encode(big, "JPEG", quality=90)

    exact = NativeTrainTransform(size=64, to_uint8=True)
    fast = NativeTrainTransform(size=64, to_uint8=True, fast_jpeg=True)
    for seed in range(4):
        a = np.asarray(exact(data, rng=random.Random(seed)))
        b = np.asarray(fast(data, rng=random.Random(seed)))
        assert a.shape == b.shape == (64, 64, 3)
        # same crop/flip -> small decode-scale differences only
        assert np.abs(a.astype(int) - b.astype(int)).mean() < 8.0

    ev_exact = NativeEvalTransform(size=64, to_uint8=True)(data)
    ev_fast = NativeEvalTransform(size=64, to_uint8=True,
                                  fast_jpeg=True)(data)
    assert ev_fast.shape == (64, 64, 3)
    assert np.abs(ev_exact.astype(int) - ev_fast.astype(int)).mean() < 8.0

    # rng draw alignment with the PIL path survives fast mode: the draw
    # AFTER the transform must be identical across all three backends
    streams = []
    for t in (TrainTransform(size=64),):
        r = random.Random(7)
        t(Image.open(io.BytesIO(data)), rng=r)
        streams.append(r.random())
    for t in (exact, fast):
        r = random.Random(7)
        t(data, rng=r)
        streams.append(r.random())
    assert streams[0] == streams[1] == streams[2]


# ------------------------------------------------------- loader / config

def test_native_backend_end_to_end(tmp_path):
    from mvlpt_tpu.config.defaults import get_cfg_default
    from mvlpt_tpu.data.loader import build_data_loader
    from mvlpt_tpu.data.datum import Datum
    from mvlpt_tpu.data.transforms import build_transform

    items = []
    rng = np.random.default_rng(14)
    for i in range(10):
        p = tmp_path / f"im_{i}.jpg"
        Image.fromarray(rng.integers(0, 256, (40 + i, 50, 3),
                                     np.uint8)).save(p, quality=90)
        items.append(Datum(impath=str(p), label=i % 3))

    def batches(backend, is_train):
        cfg = get_cfg_default()
        cfg.defrost()
        cfg.DATALOADER.BACKEND = backend
        cfg.DATALOADER.NUM_WORKERS = 2
        cfg.INPUT.SIZE = (32, 32)
        cfg.INPUT.TRANSFORMS = ("random_resized_crop", "random_flip",
                                "normalize")
        cfg.SEED = 3
        tfm = build_transform(cfg, is_train=is_train)
        loader = build_data_loader(cfg, items, 4, tfm, is_train=is_train)
        return list(loader)

    for is_train in (True, False):
        ref = batches("python", is_train)
        got = batches("native", is_train)
        assert len(ref) == len(got) and len(ref) > 0
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(r["image"], g["image"])
            np.testing.assert_array_equal(r["label"], g["label"])


def test_native_backend_composes_with_host_shards(tmp_path):
    # multi-host decode sharding keys augmentation on the GLOBAL index;
    # the native transform must preserve that (shards reassemble to the
    # exact single-host batches, bit-for-bit)
    from mvlpt_tpu.data.loader import DataLoader, _TransformedDataset
    from mvlpt_tpu.data.datum import Datum
    from mvlpt_tpu.data.native_transform import NativeTrainTransform

    items = []
    rng = np.random.default_rng(15)
    for i in range(16):
        p = tmp_path / f"im_{i}.jpg"
        Image.fromarray(rng.integers(0, 256, (48, 36, 3),
                                     np.uint8)).save(p, quality=90)
        items.append(Datum(impath=str(p), label=i % 4))

    def epoch(host_shard):
        ds = _TransformedDataset(items, NativeTrainTransform(size=24,
                                                             to_uint8=True))
        return list(DataLoader(ds, batch_size=8, shuffle=True,
                               num_workers=0, seed=5, drop_last=True,
                               host_shard=host_shard))

    full = epoch(None)
    shards = [epoch((h * 4, 4)) for h in range(2)]
    assert len(full) == len(shards[0]) > 0
    for b, gbatch in enumerate(full):
        merged = np.concatenate([shards[h][b]["image"] for h in range(2)])
        np.testing.assert_array_equal(merged, gbatch["image"])


def test_native_backend_fails_loudly_when_unavailable(monkeypatch):
    from mvlpt_tpu.config.defaults import get_cfg_default
    from mvlpt_tpu.data.transforms import build_transform

    monkeypatch.setattr(native, "available", lambda: False)
    cfg = get_cfg_default()
    cfg.defrost()
    cfg.DATALOADER.BACKEND = "native"
    with pytest.raises(RuntimeError, match="native"):
        build_transform(cfg, is_train=False)


def test_fast_jpeg_feature_and_logit_delta():
    """Quantify NATIVE_FAST_JPEG's effect where it matters — features
    and logits, not pixels (VERDICT r3 item 8). Photo-like large JPEGs
    through a ViT tower, exact vs DCT-scaled decode: feature cosine
    similarity must stay >0.995 and the logit argmax unchanged.
    Measured here (random-weight tiny tower, 6 photo-like 1024x768
    JPEGs): eval pixel MAE ~1.0/255 (train-crop ~0.5/255), feature
    cosine >=0.99999, max |logit delta| 0.09 at logit scale 100 —
    recorded in native/__init__.py:decode_jpeg_scaled."""
    import jax.numpy as jnp

    import jax
    from mvlpt_tpu.core import clip as clip_core
    from mvlpt_tpu.core.clip import CLIPConfig, init_clip_params

    clip_cfg = CLIPConfig(
        embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=8, transformer_width=64, transformer_heads=2,
        transformer_layers=2, vision_heads_override=2)
    backbone = init_clip_params(jax.random.PRNGKey(0), clip_cfg)
    text = np.random.default_rng(1).normal(size=(8, 32)).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)

    exact_t = NativeEvalTransform(size=32)
    fast_t = NativeEvalTransform(size=32, fast_jpeg=True)

    def feats(arrs):
        x = jnp.asarray(np.stack(arrs))  # transforms emit (H, W, 3)
        f = np.asarray(clip_core.encode_image(backbone, x, clip_cfg),
                       np.float32)
        return f / np.linalg.norm(f, axis=-1, keepdims=True)

    rng = np.random.default_rng(5)
    datas = []
    for i in range(6):
        # photo-like content: smooth gradients + texture (pure noise is
        # the worst case for DCT truncation and unrepresentative)
        yy, xx = np.mgrid[0:768, 0:1024]
        base = (np.stack([np.sin(yy / 97.0 + i), np.cos(xx / 61.0),
                          np.sin((xx + yy) / 151.0)], -1) + 1) * 110
        img = np.clip(base + rng.normal(0, 12, base.shape), 0,
                      255).astype(np.uint8)
        datas.append(_encode(img, "JPEG", quality=90))

    f_exact = feats([exact_t(d) for d in datas])
    f_fast = feats([fast_t(d) for d in datas])
    cos = (f_exact * f_fast).sum(-1)
    assert cos.min() > 0.995, cos
    logit_delta = np.abs(100.0 * (f_exact - f_fast) @ text.T)
    assert (np.argmax(f_exact @ text.T, -1)
            == np.argmax(f_fast @ text.T, -1)).all()
    assert logit_delta.max() < 1.0, logit_delta.max()
