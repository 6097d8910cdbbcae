"""EfficientNet feature extractor (timm layout).

Completes the reference's timm branch: ``get_model`` wraps timm
efficientnets in ``EvalModel`` — everything up to the classifier —
returning pooled features (trainers/vision_benchmark/evaluation/
feature.py:251-255).  This is the native-torch timm variant
(symmetric conv padding, BN eps 1e-5, SiLU); the ``tf_*`` checkpoints
with TensorFlow asymmetric-SAME padding are a different family and are
rejected by name in models/zoo.py.

Architecture (B0 base, compound-scaled): MBConv inverted residuals
with depthwise kxk convs and squeeze-excitation (ratio 0.25 of block
INPUT channels), stage strides (1,2,2,2,1,2,1), stem 3x3/2 conv, 1x1
head conv to 1280·width, global average pool.  Params are plain nested
dicts converted from timm state dicts (checkpoint/zoo_convert.py);
frozen inference mode, NHWC, HWIO kernels.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from mvlpt_tpu.core.zoo import _bn, _conv  # shared folded-BN / torch-pad conv

__all__ = ["EffNetConfig", "EFFNET_CONFIGS", "effnet_features",
           "init_effnet_params"]

# per stage: (n_blocks, kernel, stride, expand_ratio, c_out) — B0 table
_B0_STAGES = ((1, 3, 1, 1, 16), (2, 3, 2, 6, 24), (2, 5, 2, 6, 40),
              (3, 3, 2, 6, 80), (3, 5, 1, 6, 112), (4, 5, 2, 6, 192),
              (1, 3, 1, 6, 320))


def _round_channels(c: float, divisor: int = 8) -> int:
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return new_c


def _scaled(width_mult: float, depth_mult: float, res: int) -> "EffNetConfig":
    stages = tuple(
        (int(math.ceil(n * depth_mult)), k, s, t,
         _round_channels(c * width_mult))
        for (n, k, s, t, c) in _B0_STAGES)
    return EffNetConfig(
        stages=stages,
        stem_ch=_round_channels(32 * width_mult),
        head_ch=_round_channels(1280 * width_mult),
        input_resolution=res)


@dataclasses.dataclass(frozen=True)
class EffNetConfig:
    stages: tuple = _B0_STAGES
    stem_ch: int = 32
    head_ch: int = 1280
    se_ratio: float = 0.25
    input_resolution: int = 224


EFFNET_CONFIGS = {
    "efficientnet_b0": _scaled(1.0, 1.0, 224),
    "efficientnet_b1": _scaled(1.0, 1.1, 240),
    "efficientnet_b2": _scaled(1.1, 1.2, 260),
    "efficientnet_b3": _scaled(1.2, 1.4, 300),
    "efficientnet_b4": _scaled(1.4, 1.8, 380),
}


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _se(x, p):
    pooled = x.mean(axis=(1, 2))  # (B, C)
    r = _silu(pooled @ p["reduce_w"].astype(x.dtype)
              + p["reduce_b"].astype(x.dtype))
    gate = jax.nn.sigmoid(r @ p["expand_w"].astype(x.dtype)
                          + p["expand_b"].astype(x.dtype))
    return x * gate[:, None, None, :]


def _ds_block(x, p, stride):
    """DepthwiseSeparableConv (stage 0): dw -> SE -> pw-linear."""
    c = x.shape[-1]
    out = _silu(_bn(_conv(x, p["conv_dw"], stride, groups=c), p["bn1"]))
    out = _se(out, p["se"])
    out = _bn(_conv(out, p["conv_pw"]), p["bn2"])
    if out.shape == x.shape and stride == 1:
        out = out + x
    return out


def _ir_block(x, p, stride):
    """InvertedResidual: pw-expand -> dw -> SE -> pw-linear."""
    out = _silu(_bn(_conv(x, p["conv_pw"]), p["bn1"]))
    mid = out.shape[-1]
    out = _silu(_bn(_conv(out, p["conv_dw"], stride, groups=mid), p["bn2"]))
    out = _se(out, p["se"])
    out = _bn(_conv(out, p["conv_pwl"]), p["bn3"])
    if out.shape == x.shape and stride == 1:
        out = out + x
    return out


def effnet_features(params: dict, images: jax.Array,
                    cfg: EffNetConfig) -> jax.Array:
    """(B, H, W, 3) preprocessed floats -> (B, head_ch) pooled features
    (EvalModel children()[:-1]: classifier dropped)."""
    x = images.astype(params["conv_stem"].dtype)
    x = _silu(_bn(_conv(x, params["conv_stem"], stride=2), params["bn1"]))
    for stage_params, (n, k, s, t, c) in zip(params["stages"], cfg.stages):
        for j, p in enumerate(stage_params):
            stride = s if j == 0 else 1
            block = _ds_block if "conv_pwl" not in p else _ir_block
            x = block(x, p, stride)
    x = _silu(_bn(_conv(x, params["conv_head"]), params["bn2"]))
    return x.mean(axis=(1, 2))


def init_effnet_params(rng: jax.Array, cfg: EffNetConfig,
                       dtype=jnp.float32) -> dict:
    """Random init with timm shapes (offline testing)."""
    n_blocks = sum(n for (n, *_rest) in cfg.stages)
    keys = iter(jax.random.split(rng, 4 + 6 * n_blocks))

    def conv(kh, kw, cin, cout):
        fan = kh * kw * cin
        return jax.random.normal(
            next(keys), (kh, kw, cin, cout), dtype) * fan ** -0.5

    def bn(c):
        return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype),
                "mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}

    def se(mid, rd):
        return {"reduce_w": jax.random.normal(next(keys), (mid, rd), dtype)
                * mid ** -0.5,
                "reduce_b": jnp.zeros((rd,), dtype),
                "expand_w": jax.random.normal(next(keys), (rd, mid), dtype)
                * rd ** -0.5,
                "expand_b": jnp.zeros((mid,), dtype)}

    params = {"conv_stem": conv(3, 3, 3, cfg.stem_ch), "bn1": bn(cfg.stem_ch),
              "stages": []}
    c_in = cfg.stem_ch
    for (n, k, s, t, c_out) in cfg.stages:
        stage = []
        for j in range(n):
            rd = max(1, int(c_in * cfg.se_ratio))
            if t == 1:
                p = {"conv_dw": conv(k, k, 1, c_in), "bn1": bn(c_in),
                     "se": se(c_in, rd),
                     "conv_pw": conv(1, 1, c_in, c_out), "bn2": bn(c_out)}
            else:
                mid = c_in * t
                p = {"conv_pw": conv(1, 1, c_in, mid), "bn1": bn(mid),
                     "conv_dw": conv(k, k, 1, mid), "bn2": bn(mid),
                     "se": se(mid, rd),
                     "conv_pwl": conv(1, 1, mid, c_out), "bn3": bn(c_out)}
            stage.append(p)
            c_in = c_out
        params["stages"].append(stage)
    params["conv_head"] = conv(1, 1, c_in, cfg.head_ch)
    params["bn2"] = bn(cfg.head_ch)
    return params
