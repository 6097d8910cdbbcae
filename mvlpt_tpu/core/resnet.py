"""CLIP's ModifiedResNet visual tower (functional, inference-mode).

Behavioral equivalent of /root/reference/clip/model.py:10-150
(Bottleneck with anti-aliased avgpool strides, 3-conv stem, QKV
attention pooling). In the MVLPT surface the RN towers serve the
linear-probe / feature-extraction path only (lpclip uses RN50,
lpclip/feat_extractor.py:145); prompt tuning is ViT-only, matching the
reference's own assumption (mvlpt.py:47).

The backbone is frozen everywhere it is used, so BatchNorm runs in
inference mode with the checkpoint's running statistics. Layout is NHWC
(TPU-native); convolutions are HWIO.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from mvlpt_tpu.core import layers


@dataclasses.dataclass(frozen=True)
class RNConfig:
    layers: tuple[int, int, int, int] = (3, 4, 6, 3)  # RN50
    output_dim: int = 1024
    width: int = 64
    input_resolution: int = 224
    heads: int = 32  # width * 32 // 64


def _bn(x, p, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    scale = (p["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    bias = (p["bias"].astype(jnp.float32)
            - p["mean"].astype(jnp.float32) * p["scale"].astype(jnp.float32) * inv
            ).astype(x.dtype)
    return x * scale + bias


def _conv(x, kernel, stride=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def _avgpool(x, k):
    return jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1),
        "VALID").astype(x.dtype) / (k * k)


def _bottleneck(x, p, stride):
    out = jax.nn.relu(_bn(_conv(x, p["conv1"]["kernel"]), p["bn1"]))
    out = jax.nn.relu(_bn(_conv(out, p["conv2"]["kernel"]), p["bn2"]))
    if stride > 1:  # anti-aliased stride: avgpool THEN 1x1 conv
        out = _avgpool(out, stride)
    out = _bn(_conv(out, p["conv3"]["kernel"]), p["bn3"])
    if "downsample" in p:
        identity = _avgpool(x, stride) if stride > 1 else x
        identity = _bn(_conv(identity, p["downsample"]["conv"]["kernel"]),
                       p["downsample"]["bn"])
    else:
        identity = x
    return jax.nn.relu(out + identity)


def attention_pool(x, p, n_heads):
    """QKV attention pooling (clip/model.py:56-90): the mean token
    queries all spatial tokens; returns (B, output_dim)."""
    b, s, c = x.shape
    mean = x.mean(axis=1, keepdims=True)
    x = jnp.concatenate([mean, x], axis=1)  # (B, 1+S, C)
    x = x + p["pos_embedding"].astype(x.dtype)[None]
    q = layers._matmul(x[:, :1], p["q_proj"]["kernel"], p["q_proj"]["bias"])
    k = layers._matmul(x, p["k_proj"]["kernel"], p["k_proj"]["bias"])
    v = layers._matmul(x, p["v_proj"]["kernel"], p["v_proj"]["bias"])
    d = c // n_heads
    q = q.reshape(b, 1, n_heads, d)
    k = k.reshape(b, s + 1, n_heads, d)
    v = v.reshape(b, s + 1, n_heads, d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * d ** -0.5, k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    o = o.reshape(b, 1, c)[:, 0]
    return layers._matmul(o, p["c_proj"]["kernel"], p["c_proj"]["bias"])


def encode_image_rn(params: dict, images: jax.Array, cfg: RNConfig) -> jax.Array:
    """NHWC images -> (B, output_dim) features (clip/model.py:138-150)."""
    dtype = params["stem"]["conv1"]["kernel"].dtype
    x = images.astype(dtype)
    stem = params["stem"]
    x = jax.nn.relu(_bn(_conv(x, stem["conv1"]["kernel"], stride=2), stem["bn1"]))
    x = jax.nn.relu(_bn(_conv(x, stem["conv2"]["kernel"]), stem["bn2"]))
    x = jax.nn.relu(_bn(_conv(x, stem["conv3"]["kernel"]), stem["bn3"]))
    x = _avgpool(x, 2)
    for stage_idx in range(4):
        stage = params[f"layer{stage_idx + 1}"]
        stride = 1 if stage_idx == 0 else 2
        for block_idx, block in enumerate(stage):
            x = _bottleneck(x, block, stride if block_idx == 0 else 1)
    b, h, w, c = x.shape
    return attention_pool(x.reshape(b, h * w, c), params["attnpool"], cfg.heads)
