"""``get_model`` — the feature-extraction model zoo dispatcher.

Rebuilds trainers/vision_benchmark/evaluation/feature.py:245-321 with
the same dispatch-by-name contract, returning a jittable functional
feature extractor instead of a mutated ``nn.Module``:

* torchvision ResNet names (``resnet18/34/50/101/152``) — the
  torchvision branch (feature.py:247-250); features are the
  ``EvalModel`` children()[:-1] cut (pooled, classifier dropped).
* ``vit_*`` / ``deit_*`` — the timm branch (feature.py:251-259),
  ``forward_features`` semantics.
* ``mae_*`` / ``mocov3_*`` — accepted as ViT checkpoint layouts (the
  reference's own branches at feature.py:263-264, 286-287 name ``mae``
  and ``mocov3`` modules that are never imported — dead code in-tree;
  here the checkpoints load into the same standard-ViT module).
* CLIP names (``ViT-B/32`` etc. or ``clip_*``) — the CLIP branch
  (feature.py:290-317), routed to the existing CLIP towers with
  ``feature_type`` choosing the image or text encoder.
* ``efficientnet_b*`` — the timm efficientnet branch (feature.py:
  252-254, EvalModel-wrapped pooled features), core/efficientnet.py.
* Remaining timm families raise ValueError with the same "please
  define" failure the reference raises (feature.py:258), and
  ``declip_*``/``slip_*``/``filip_*``/``cls_*`` raise errors
  documenting that those reference branches cannot run in-tree either.

Checkpoints are local ``torch.save`` files (zero-egress environment —
no torchvision/timm download hub here); ``checkpoint=None`` gives a
shape-correct random init for offline pipelines and tests.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from mvlpt_tpu.core import zoo as zoo_core

__all__ = ["ZooModel", "get_model"]


@dataclasses.dataclass(frozen=True)
class ZooModel:
    """A frozen feature extractor: ``features(images)`` maps
    (B, H, W, 3) preprocessed floats to (B, D) features."""
    name: str
    features: Callable
    params: dict
    input_resolution: int
    feature_dim: int
    # torchvision/timm models use Imagenet normalization, CLIP its own
    pixel_mean: tuple
    pixel_std: tuple


_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


def _load_torch_checkpoint(path: str) -> dict:
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def _std_vit_model(name, checkpoint, dtype):
    from mvlpt_tpu.checkpoint.zoo_convert import convert_std_vit

    base = name
    for prefix in ("mae_", "mocov3_"):
        if base.startswith(prefix):
            base = base[len(prefix):]
    if checkpoint is not None:
        params, cfg = convert_std_vit(_load_torch_checkpoint(checkpoint),
                                      dtype)
    else:
        if base not in zoo_core.STD_VIT_CONFIGS:
            raise ValueError(
                f"unknown ViT variant {name!r}; known: "
                f"{sorted(zoo_core.STD_VIT_CONFIGS)} (or pass checkpoint=)")
        cfg = zoo_core.STD_VIT_CONFIGS[base]
        params = zoo_core.init_std_vit_params(jax.random.PRNGKey(0), cfg,
                                              dtype)

    def features(images, params=params, cfg=cfg):
        return zoo_core.std_vit_features(params, images, cfg)

    return ZooModel(name, features, params, cfg.input_resolution, cfg.width,
                    _IMAGENET_MEAN, _IMAGENET_STD)


def _tv_resnet_model(name, checkpoint, dtype):
    from mvlpt_tpu.checkpoint.zoo_convert import convert_tv_resnet

    if checkpoint is not None:
        params, cfg = convert_tv_resnet(_load_torch_checkpoint(checkpoint),
                                        dtype)
    else:
        cfg = zoo_core.TV_RESNET_CONFIGS[name]
        params = zoo_core.init_tv_resnet_params(jax.random.PRNGKey(0), cfg,
                                                dtype)
    dim = cfg.width * 8 * (4 if cfg.bottleneck else 1)

    def features(images, params=params, cfg=cfg):
        return zoo_core.tv_resnet_features(params, images, cfg)

    return ZooModel(name, features, params, 224, dim,
                    _IMAGENET_MEAN, _IMAGENET_STD)


def _effnet_model(name, checkpoint, dtype):
    from mvlpt_tpu.checkpoint.zoo_convert import convert_effnet
    from mvlpt_tpu.core import efficientnet as eff

    if checkpoint is not None:
        params, cfg = convert_effnet(_load_torch_checkpoint(checkpoint),
                                     dtype)
    else:
        if name not in eff.EFFNET_CONFIGS:
            raise ValueError(
                f"unknown efficientnet variant {name!r}; known: "
                f"{sorted(eff.EFFNET_CONFIGS)} (or pass checkpoint=)")
        cfg = eff.EFFNET_CONFIGS[name]
        params = eff.init_effnet_params(jax.random.PRNGKey(0), cfg, dtype)

    def features(images, params=params, cfg=cfg):
        return eff.effnet_features(params, images, cfg)

    return ZooModel(name, features, params, cfg.input_resolution,
                    cfg.head_ch, _IMAGENET_MEAN, _IMAGENET_STD)


def _clip_model(name, checkpoint, dtype, feature_type):
    import os

    from mvlpt_tpu.checkpoint import convert as ckpt_convert
    from mvlpt_tpu.core import clip as clip_core
    from mvlpt_tpu.data.transforms import CLIP_PIXEL_MEAN, CLIP_PIXEL_STD

    clip_name = name[len("clip_"):] if name.startswith("clip_") else name
    source = checkpoint or os.environ.get("MVLPT_TPU_CLIP_CKPT") or clip_name
    params, cfg = ckpt_convert.load_clip(source, dtype=dtype)

    if feature_type == "image":
        def features(images, params=params, cfg=cfg):
            return clip_core.encode_image(params, images, cfg)
        dim = cfg.embed_dim
    elif feature_type == "text":
        def features(tokens, params=params, cfg=cfg):
            return clip_core.encode_text(params, tokens, cfg)
        dim = cfg.embed_dim
    else:
        raise ValueError(f"Incorrect model type {feature_type!r}.")
    return ZooModel(name, features, params, cfg.image_resolution, dim,
                    CLIP_PIXEL_MEAN, CLIP_PIXEL_STD)


def get_model(name: str, checkpoint: str | None = None,
              dtype=jnp.float32, feature_type: str = "image") -> ZooModel:
    """Dispatch-by-name model factory (feature.py:245-321 contract)."""
    if name in zoo_core.TV_RESNET_CONFIGS:
        return _tv_resnet_model(name, checkpoint, dtype)
    if (name.startswith("vit_") or name.startswith("deit_")
            or name.startswith("mae_") or name.startswith("mocov3_")):
        return _std_vit_model(name, checkpoint, dtype)
    if name.startswith("efficientnet"):
        return _effnet_model(name, checkpoint, dtype)
    if name.startswith("tf_efficientnet"):
        raise ValueError(
            f"{name!r}: TF-padded efficientnet checkpoints use asymmetric "
            "SAME padding — load the native timm 'efficientnet_*' "
            "checkpoints instead")
    if any(name.startswith(p) for p in
           ("resnest", "regnet", "mixnet", "mobilenet", "convnext")):
        raise ValueError(
            "Please define a Timm feature-extraction model "
            f"({name!r}: the reference's timm branch raises the same for "
            "families outside efficientnet/vit/deit, feature.py:258)")
    if (name.startswith("declip_") or name.startswith("slip_")
            or name.startswith("filip_") or name.startswith("defilip_")
            or name.startswith("cls_") or name.startswith("clip_yfcc_")):
        raise ValueError(
            f"{name!r}: the reference's branch for this family references "
            "modules that are never imported (feature.py:263-287, dead "
            "in-tree); DeCLIP-family CLIP-architecture checkpoints can be "
            "loaded through the CLIP path instead")
    # CLIP branch (clip.available_models or clip_ prefix)
    return _clip_model(name, checkpoint, dtype, feature_type)
