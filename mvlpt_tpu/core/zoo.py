"""Non-CLIP feature-extraction backbones (the `get_model` zoo).

Rebuilds the runnable branches of the reference's model zoo
(trainers/vision_benchmark/evaluation/feature.py:245-321) as functional
JAX modules.  The reference dispatches on ``MODEL.NAME``:

* torchvision models wrapped in ``EvalModel`` (children()[:-1] — i.e.
  everything up to the classifier, feature.py:50-59, 247-250): here the
  ResNet family (``resnet18/34/50/101/152``, torchvision "v1.5" layout
  with the stride on the 3x3 bottleneck conv).
* timm ``vit_*``/``deit_*`` via ``forward_features`` (feature.py:
  251-259): the standard (non-CLIP) vision transformer — exact GELU,
  eps-1e-6 LayerNorms, positional embedding covering the class token,
  no pre-transformer LayerNorm — returning the class-token feature.
* The reference's ``mae_``/``mocov3_``/``declip_``/``cls_`` branches
  name symbols that are never imported (feature.py:263-287 — ``mae``,
  ``mocov3``, ``declip`` are undefined in the module; the branches
  NameError if reached).  MAE and MoCo-v3 checkpoints are plain
  timm-layout ViT state dicts, so the converter in
  checkpoint/zoo_convert.py accepts their key schemes into this same
  module; DeCLIP-family towers are CLIP-architecture and load through
  the existing CLIP path.

Everything here is an inference-mode frozen feature extractor (the zoo
feeds the linear-probe / feature-caching pipeline only — MVLPT prompt
tuning always runs the CLIP towers).  Layout is NHWC, convolutions
HWIO, params plain nested dicts, all jit-friendly static shapes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from mvlpt_tpu.core import layers
from mvlpt_tpu.core.vit import patchify

__all__ = [
    "StdViTConfig", "std_vit_features", "init_std_vit_params",
    "TVResNetConfig", "tv_resnet_features", "init_tv_resnet_params",
    "STD_VIT_CONFIGS", "TV_RESNET_CONFIGS",
]


# ---------------------------------------------------------------------------
# Standard ViT (timm layout): vit_*/deit_* forward_features
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class StdViTConfig:
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    input_resolution: int = 224
    mlp_ratio: int = 4
    ln_eps: float = 1e-6          # timm ViT pins eps=1e-6
    n_prefix: int = 1             # 1 = cls; 2 = cls + dist (distilled deit)
    pool: str = "cls"             # "cls" | "avg" (MAE fine-tune global pool)


STD_VIT_CONFIGS = {
    # timm canonical names (timm.list_models subset the reference's
    # vit/deit branch accepts, feature.py:251-259)
    "vit_small_patch16_224": StdViTConfig(16, 384, 12, 6),
    "vit_base_patch16_224": StdViTConfig(16, 768, 12, 12),
    "vit_base_patch32_224": StdViTConfig(32, 768, 12, 12),
    "vit_large_patch16_224": StdViTConfig(16, 1024, 24, 16),
    "deit_tiny_patch16_224": StdViTConfig(16, 192, 12, 3),
    "deit_small_patch16_224": StdViTConfig(16, 384, 12, 6),
    "deit_base_patch16_224": StdViTConfig(16, 768, 12, 12),
    "deit_base_distilled_patch16_224": StdViTConfig(16, 768, 12, 12,
                                                    n_prefix=2),
}


def _gelu_mlp(x, p):
    # exact GELU (timm/MAE/MoCo-v3), vs CLIP's QuickGELU
    h = jax.nn.gelu(layers._matmul(x, p["fc_w"], p["fc_b"]),
                    approximate=False)
    return layers._matmul(h, p["proj_w"], p["proj_b"])


def _std_block(x, p, n_heads, eps):
    x = x + layers.attention(
        layers.layer_norm(x, p["ln_1"], eps=eps), p["attn"], n_heads)
    x = x + _gelu_mlp(layers.layer_norm(x, p["ln_2"], eps=eps), p["mlp"])
    return x


def std_vit_features(params: dict, images: jax.Array,
                     cfg: StdViTConfig) -> jax.Array:
    """timm ``forward_features`` semantics: patchify -> prepend prefix
    tokens -> +pos (covers prefix) -> blocks -> final norm -> class
    token (or mean over patch tokens for ``pool='avg'``).

    ``images`` are (B, H, W, 3) float in the model's preprocessing
    space; returns (B, width) features.
    """
    kernel = params["patch_embed"]["kernel"]  # (P*P*C, W)
    dtype = kernel.dtype
    x = patchify(images.astype(dtype), cfg.patch_size)
    x = layers._matmul(x, kernel, params["patch_embed"]["bias"])
    b = x.shape[0]
    prefix = jnp.broadcast_to(
        params["prefix_tokens"].astype(dtype)[None],
        (b, cfg.n_prefix, cfg.width))
    x = jnp.concatenate([prefix, x], axis=1)
    x = x + params["pos_embed"].astype(dtype)[None]
    for p in params["blocks"]:
        x = _std_block(x, p, cfg.heads, cfg.ln_eps)
    if cfg.pool == "avg":
        # MAE fine-tune layout: global average of patch tokens, then
        # the fc_norm stored in params["norm"].
        feat = x[:, cfg.n_prefix:].mean(axis=1)
        return layers.layer_norm(feat, params["norm"], eps=cfg.ln_eps)
    x = layers.layer_norm(x, params["norm"], eps=cfg.ln_eps)
    return x[:, 0]


def init_std_vit_params(rng: jax.Array, cfg: StdViTConfig,
                        dtype=jnp.float32) -> dict:
    """Random init with the right shapes (offline testing; real use
    loads a converted torch state dict)."""
    n_patches = (cfg.input_resolution // cfg.patch_size) ** 2
    keys = iter(jax.random.split(rng, 3 + 4 * cfg.layers))
    d_in = cfg.patch_size * cfg.patch_size * 3
    w = cfg.width

    def lin(key, i, o):
        return (jax.random.normal(key, (i, o), dtype) * (i ** -0.5),
                jnp.zeros((o,), dtype))

    pk, pb = lin(next(keys), d_in, w)
    params = {
        "patch_embed": {"kernel": pk, "bias": pb},
        "prefix_tokens": jax.random.normal(
            next(keys), (cfg.n_prefix, w), dtype) * 0.02,
        "pos_embed": jax.random.normal(
            next(keys), (cfg.n_prefix + n_patches, w), dtype) * 0.02,
        "norm": {"scale": jnp.ones((w,), dtype),
                 "bias": jnp.zeros((w,), dtype)},
        "blocks": [],
    }
    for _ in range(cfg.layers):
        qkv_w, qkv_b = lin(next(keys), w, 3 * w)
        out_w, out_b = lin(next(keys), w, w)
        fc_w, fc_b = lin(next(keys), w, cfg.mlp_ratio * w)
        pr_w, pr_b = lin(next(keys), cfg.mlp_ratio * w, w)
        params["blocks"].append({
            "ln_1": {"scale": jnp.ones((w,), dtype),
                     "bias": jnp.zeros((w,), dtype)},
            "attn": {"qkv_w": qkv_w, "qkv_b": qkv_b,
                     "out_w": out_w, "out_b": out_b},
            "ln_2": {"scale": jnp.ones((w,), dtype),
                     "bias": jnp.zeros((w,), dtype)},
            "mlp": {"fc_w": fc_w, "fc_b": fc_b,
                    "proj_w": pr_w, "proj_b": pr_b},
        })
    return params


# ---------------------------------------------------------------------------
# torchvision ResNet (v1.5): EvalModel children()[:-1] semantics
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class TVResNetConfig:
    layers: tuple = (3, 4, 6, 3)
    bottleneck: bool = True       # False = BasicBlock (resnet18/34)
    width: int = 64


TV_RESNET_CONFIGS = {
    "resnet18": TVResNetConfig((2, 2, 2, 2), bottleneck=False),
    "resnet34": TVResNetConfig((3, 4, 6, 3), bottleneck=False),
    "resnet50": TVResNetConfig((3, 4, 6, 3)),
    "resnet101": TVResNetConfig((3, 4, 23, 3)),
    "resnet152": TVResNetConfig((3, 8, 36, 3)),
}


def _bn(x, p, eps=1e-5):
    """Inference batch-norm, fp32 folding. Shared by every converted
    torch backbone (tv ResNet here, EfficientNet in core/efficientnet)
    so the parity-critical arithmetic lives in exactly one place."""
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    scale = (p["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    bias = (p["bias"].astype(jnp.float32)
            - p["mean"].astype(jnp.float32)
            * p["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    return x * scale + bias


def _conv(x, kernel, stride=1, groups=1):
    # torch pads symmetrically ((k//2, k//2)); XLA's SAME pads
    # asymmetrically under stride > 1 — always use the torch rule so
    # converted checkpoints reproduce torchvision activations exactly.
    p = kernel.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (stride, stride), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32).astype(x.dtype)


def _basic_block(x, p, stride):
    out = jax.nn.relu(_bn(_conv(x, p["conv1"], stride), p["bn1"]))
    out = _bn(_conv(out, p["conv2"]), p["bn2"])
    if "downsample" in p:
        x = _bn(_conv(x, p["downsample"]["conv"], stride),
                p["downsample"]["bn"])
    return jax.nn.relu(out + x)


def _bottleneck_block(x, p, stride):
    # torchvision v1.5: the stride sits on the 3x3 conv2
    out = jax.nn.relu(_bn(_conv(x, p["conv1"]), p["bn1"]))
    out = jax.nn.relu(_bn(_conv(out, p["conv2"], stride), p["bn2"]))
    out = _bn(_conv(out, p["conv3"]), p["bn3"])
    if "downsample" in p:
        x = _bn(_conv(x, p["downsample"]["conv"], stride),
                p["downsample"]["bn"])
    return jax.nn.relu(out + x)


def tv_resnet_features(params: dict, images: jax.Array,
                       cfg: TVResNetConfig) -> jax.Array:
    """torchvision ResNet through global average pooling — exactly the
    reference's ``EvalModel`` (``nn.Sequential(children()[:-1])``, i.e.
    the classifier ``fc`` dropped, feature.py:50-59). (B, H, W, 3) ->
    (B, 512*expansion) features."""
    x = images.astype(params["conv1"].dtype)
    x = jax.nn.relu(_bn(_conv(x, params["conv1"], stride=2), params["bn1"]))
    # maxpool 3x3 stride 2 pad 1
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    block = _bottleneck_block if cfg.bottleneck else _basic_block
    for stage_idx, stage in enumerate(params["stages"]):
        for block_idx, p in enumerate(stage):
            stride = 2 if (stage_idx > 0 and block_idx == 0) else 1
            x = block(x, p, stride)
    return x.mean(axis=(1, 2))


def init_tv_resnet_params(rng: jax.Array, cfg: TVResNetConfig,
                          dtype=jnp.float32) -> dict:
    """Random init with torchvision shapes (offline testing)."""
    expansion = 4 if cfg.bottleneck else 1
    n_blocks = sum(cfg.layers)
    keys = iter(jax.random.split(rng, 2 + 4 * n_blocks))

    def conv(key, kh, kw, cin, cout):
        fan = kh * kw * cin
        return jax.random.normal(key, (kh, kw, cin, cout), dtype) * fan ** -0.5

    def bn(c):
        return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype),
                "mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}

    params = {"conv1": conv(next(keys), 7, 7, 3, cfg.width), "bn1": bn(cfg.width),
              "stages": []}
    c_in = cfg.width
    for stage_idx, n in enumerate(cfg.layers):
        planes = cfg.width * (2 ** stage_idx)
        c_out = planes * expansion
        stage = []
        for block_idx in range(n):
            if cfg.bottleneck:
                p = {"conv1": conv(next(keys), 1, 1, c_in, planes),
                     "bn1": bn(planes),
                     "conv2": conv(next(keys), 3, 3, planes, planes),
                     "bn2": bn(planes),
                     "conv3": conv(next(keys), 1, 1, planes, c_out),
                     "bn3": bn(c_out)}
            else:
                p = {"conv1": conv(next(keys), 3, 3, c_in, planes),
                     "bn1": bn(planes),
                     "conv2": conv(next(keys), 3, 3, planes, planes),
                     "bn2": bn(planes)}
                c_out = planes
            if block_idx == 0 and (stage_idx > 0 or c_in != c_out):
                p["downsample"] = {"conv": conv(next(keys), 1, 1, c_in, c_out),
                                   "bn": bn(c_out)}
            stage.append(p)
            c_in = c_out
        params["stages"].append(stage)
    return params
