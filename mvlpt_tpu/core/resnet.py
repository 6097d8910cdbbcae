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


# Shared with the torchvision/EfficientNet towers: folded inference BN
# and torch-symmetric-padding conv. The padding rule is parity-critical
# for the stride-2 stem conv1: XLA's "SAME" pads (0, 1) there while
# torch's padding=1 pads (1, 1) — every downstream activation shifts
# (masked in a small random tower by the attention pool's spatial mean,
# catastrophic with trained weights).
from mvlpt_tpu.core.zoo import _bn, _conv  # noqa: E402


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


# Architecture table for the released RN checkpoints (inferable from
# checkpoints via rn_config_from_state_dict; listed for random init).
RN_ARCHS = {
    "RN50": RNConfig(layers=(3, 4, 6, 3), output_dim=1024, width=64,
                     input_resolution=224, heads=32),
    "RN101": RNConfig(layers=(3, 4, 23, 3), output_dim=512, width=64,
                      input_resolution=224, heads=32),
}


def init_rn_params(key: jax.Array, cfg: RNConfig) -> dict:
    """Random-init the ModifiedResNet visual pytree (offline tests /
    benchmarks; real runs convert OpenAI checkpoints). Shapes follow
    checkpoint/convert.py:convert_openai_rn_state_dict; BN starts at
    identity (mean 0 / var 1), conv kernels are He-normal."""
    import numpy as np

    rng = np.random.RandomState(
        int(jax.random.randint(key, (), 0, 2**31 - 1)))

    def conv(kh, kw, cin, cout):
        std = (2.0 / (kh * kw * cin)) ** 0.5
        return {"kernel": jnp.asarray(
            rng.randn(kh, kw, cin, cout).astype(np.float32) * std)}

    def bn(c):
        return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
                "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}

    def proj(cin, cout):
        std = cin ** -0.5
        return {"kernel": jnp.asarray(
            rng.randn(cin, cout).astype(np.float32) * std),
            "bias": jnp.zeros((cout,))}

    w = cfg.width
    visual = {
        "stem": {
            "conv1": conv(3, 3, 3, w // 2), "bn1": bn(w // 2),
            "conv2": conv(3, 3, w // 2, w // 2), "bn2": bn(w // 2),
            "conv3": conv(3, 3, w // 2, w), "bn3": bn(w),
        },
    }
    inplanes = w
    for b, n_blocks in zip((1, 2, 3, 4), cfg.layers):
        planes = w * (2 ** (b - 1))
        blocks = []
        for i in range(n_blocks):
            p = {
                "conv1": conv(1, 1, inplanes if i == 0 else planes * 4, planes),
                "bn1": bn(planes),
                "conv2": conv(3, 3, planes, planes), "bn2": bn(planes),
                "conv3": conv(1, 1, planes, planes * 4), "bn3": bn(planes * 4),
            }
            if i == 0:  # stride > 1 (layers 2-4) or channel change (layer 1)
                p["downsample"] = {
                    "conv": conv(1, 1, inplanes, planes * 4),
                    "bn": bn(planes * 4),
                }
            blocks.append(p)
        visual[f"layer{b}"] = blocks
        inplanes = planes * 4
    c = w * 32
    spacial = cfg.input_resolution // 32
    visual["attnpool"] = {
        "pos_embedding": jnp.asarray(
            rng.randn(spacial ** 2 + 1, c).astype(np.float32) * c ** -0.5),
        "q_proj": proj(c, c), "k_proj": proj(c, c), "v_proj": proj(c, c),
        "c_proj": proj(c, cfg.output_dim),
    }
    return visual
