"""CLIP model: config, parameter schema, initialization, and forward.

The parameter pytree mirrors the information content (NOT the layout) of
OpenAI CLIP checkpoints; see checkpoint/convert.py for the
state_dict -> pytree port with the same shape-inference rules as
/root/reference/clip/model.py:395-432.

Schema (all linear kernels are right-multiplied, (in, out)):

  params = {
    "visual": {
      "patch_embed": {"kernel": (P*P*3, W)},
      "class_embedding": (W,), "pos_embedding": (1+N, W),
      "ln_pre": {"scale","bias"},
      "blocks": {stacked over L:
        "ln_1"/"ln_2": {"scale": (L,W), "bias": (L,W)},
        "attn": {"qkv_w": (L,W,3W), "qkv_b": (L,3W),
                  "out_w": (L,W,W), "out_b": (L,W)},
        "mlp": {"fc_w": (L,W,4W), "fc_b": (L,4W),
                 "proj_w": (L,4W,W), "proj_b": (L,W)}},
      "ln_post": {"scale","bias"}, "proj": (W, E),
    },
    "text": {
      "token_embedding": (V, Wt), "pos_embedding": (77, Wt),
      "blocks": {... stacked over Lt ...},
      "ln_final": {"scale","bias"}, "text_projection": (Wt, E),
    },
    "logit_scale": (),   # ln(1/0.07) at init (clip/model.py:291)
  }
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from mvlpt_tpu.core import layers, text as text_mod, vit as vit_mod


# Architecture tables for the released CLIP ViT models
# (hyperparams inferable from checkpoints, clip/model.py:398-418).
VIT_ARCHS = {
    "ViT-B/32": dict(embed_dim=512, image_resolution=224, vision_layers=12,
                     vision_width=768, vision_patch_size=32),
    "ViT-B/16": dict(embed_dim=512, image_resolution=224, vision_layers=12,
                     vision_width=768, vision_patch_size=16),
    "ViT-L/14": dict(embed_dim=768, image_resolution=224, vision_layers=24,
                     vision_width=1024, vision_patch_size=14),
    "ViT-L/14@336px": dict(embed_dim=768, image_resolution=336, vision_layers=24,
                           vision_width=1024, vision_patch_size=14),
}
_TEXT_ARCHS = {
    512: dict(transformer_width=512, transformer_heads=8, transformer_layers=12),
    768: dict(transformer_width=768, transformer_heads=12, transformer_layers=12),
}


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    image_resolution: int = 224
    vision_layers: int = 12
    vision_width: int = 768
    vision_patch_size: int = 16
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12
    # 0 = OpenAI rule (width // 64, clip/model.py:425); HF checkpoints
    # carry an explicit head count instead.
    vision_heads_override: int = 0

    @property
    def vision_heads(self) -> int:
        return self.vision_heads_override or self.vision_width // 64

    @property
    def grid_size(self) -> int:
        return self.image_resolution // self.vision_patch_size

    @staticmethod
    def for_backbone(name: str, **overrides) -> "CLIPConfig":
        if name not in VIT_ARCHS:
            raise KeyError(
                f"Unknown/unsupported backbone {name!r}; ViT backbones: "
                f"{sorted(VIT_ARCHS)} (the RN* towers are served by the "
                "linear-probe path only, as in the reference)"
            )
        arch = dict(VIT_ARCHS[name])
        arch.update(_TEXT_ARCHS[arch["embed_dim"]])
        arch.update(overrides)
        return CLIPConfig(**arch)


def _init_block_stack(key, n_layers, width, init_std_scale=1.0):
    """CLIP's transformer init (clip/model.py:302-316): normal weights with
    width-dependent std, zero biases, unit LN scales."""
    ks = jax.random.split(key, 6)
    proj_std = (width ** -0.5) * ((2 * n_layers) ** -0.5) * init_std_scale
    attn_std = width ** -0.5
    fc_std = (2 * width) ** -0.5

    def norm(k, shape, std):
        return (jax.random.normal(k, shape, jnp.float32) * std)

    return {
        "ln_1": {"scale": jnp.ones((n_layers, width)), "bias": jnp.zeros((n_layers, width))},
        "attn": {
            "qkv_w": norm(ks[0], (n_layers, width, 3 * width), attn_std),
            "qkv_b": jnp.zeros((n_layers, 3 * width)),
            "out_w": norm(ks[1], (n_layers, width, width), proj_std),
            "out_b": jnp.zeros((n_layers, width)),
        },
        "ln_2": {"scale": jnp.ones((n_layers, width)), "bias": jnp.zeros((n_layers, width))},
        "mlp": {
            "fc_w": norm(ks[2], (n_layers, width, 4 * width), fc_std),
            "fc_b": jnp.zeros((n_layers, 4 * width)),
            "proj_w": norm(ks[3], (n_layers, 4 * width, width), proj_std),
            "proj_b": jnp.zeros((n_layers, width)),
        },
    }


def init_clip_params(key: jax.Array, cfg: CLIPConfig, dtype=jnp.float32) -> dict:
    """Random-init CLIP params (for tests and from-scratch runs)."""
    kv, kt, kc, kp, ke, kx = jax.random.split(key, 6)
    vw, tw = cfg.vision_width, cfg.transformer_width
    n_patches = cfg.grid_size ** 2
    params = {
        "visual": {
            "patch_embed": {
                "kernel": jax.random.normal(kc, (cfg.vision_patch_size ** 2 * 3, vw))
                * (vw ** -0.5)
            },
            "class_embedding": jax.random.normal(kp, (vw,)) * (vw ** -0.5),
            "pos_embedding": jax.random.normal(ke, (1 + n_patches, vw)) * (vw ** -0.5),
            "ln_pre": {"scale": jnp.ones((vw,)), "bias": jnp.zeros((vw,))},
            "blocks": _init_block_stack(kv, cfg.vision_layers, vw),
            "ln_post": {"scale": jnp.ones((vw,)), "bias": jnp.zeros((vw,))},
            "proj": jax.random.normal(kx, (vw, cfg.embed_dim)) * (vw ** -0.5),
        },
        "text": {
            "token_embedding": jax.random.normal(
                jax.random.fold_in(kt, 1), (cfg.vocab_size, tw)) * 0.02,
            "pos_embedding": jax.random.normal(
                jax.random.fold_in(kt, 2), (cfg.context_length, tw)) * 0.01,
            "blocks": _init_block_stack(jax.random.fold_in(kt, 3),
                                        cfg.transformer_layers, tw),
            "ln_final": {"scale": jnp.ones((tw,)), "bias": jnp.zeros((tw,))},
            "text_projection": jax.random.normal(
                jax.random.fold_in(kt, 4), (tw, cfg.embed_dim)) * (tw ** -0.5),
        },
        "logit_scale": jnp.asarray(math.log(1.0 / 0.07), jnp.float32),
    }
    return jax.tree_util.tree_map(lambda x: x.astype(dtype), params)


def cast_backbone(params: dict, dtype) -> dict:
    """Cast backbone params to a storage dtype, keeping logit_scale fp32."""
    out = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
    out["logit_scale"] = jnp.asarray(params["logit_scale"], jnp.float32)
    return out


def encode_image(params, images, cfg, **kw):
    """Visual-tower dispatch: ViT (CLIPConfig) or ModifiedResNet
    (RNConfig, feature-extraction path only)."""
    from mvlpt_tpu.core.resnet import RNConfig, encode_image_rn

    if isinstance(cfg, RNConfig):
        return encode_image_rn(params["visual"], images, cfg)
    return vit_mod.encode_image(
        params["visual"], images,
        patch_size=cfg.vision_patch_size, n_heads=cfg.vision_heads, **kw)


def encode_text(params, token_ids, cfg: CLIPConfig, **kw):
    return text_mod.encode_text(
        params["text"], token_ids, n_heads=cfg.transformer_heads, **kw)


def clip_logits(image_features, text_features, logit_scale) -> jax.Array:
    """L2-normalize both sides, scale by exp(logit_scale)
    (clip/model.py:355-366). Returned in fp32."""
    img = image_features.astype(jnp.float32)
    txt = text_features.astype(jnp.float32)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    scale = jnp.exp(logit_scale.astype(jnp.float32))
    return scale * img @ txt.T


def count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))
