"""Zero-shot CLIP trainers (rebuild of trainers/zsclip.py:32-99).

Text features for all classes are encoded once (hand-crafted per-dataset
template, or ensembled over the 7-template select pool + 80-template
ImageNet pool for the ensembling variant) and cached on device; the test
loop is a single jitted cosine-logit step per batch.

The per-dataset templates below are the standard public CLIP evaluation
templates (same data as zsclip.py:13-29 / imagenet_templates.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mvlpt_tpu.core import clip as clip_core
from mvlpt_tpu.tokenizer import tokenize
from mvlpt_tpu.utils.registry import TRAINER_REGISTRY

CUSTOM_TEMPLATES = {
    "OxfordPets": "a photo of a {}, a type of pet.",
    "OxfordFlowers": "a photo of a {}, a type of flower.",
    "FGVCAircraft": "a photo of a {}, a type of aircraft.",
    "DescribableTextures": "{} texture.",
    "EuroSAT": "a centered satellite photo of {}.",
    "StanfordCars": "a photo of a {}.",
    "Food101": "a photo of {}, a type of food.",
    "SUN397": "a photo of a {}.",
    "Caltech101": "a photo of a {}.",
    "UCF101": "a photo of a person doing {}.",
    "ImageNet": "a photo of a {}.",
    "ImageNetSketch": "a photo of a {}.",
    "ImageNetV2": "a photo of a {}.",
    "ImageNetA": "a photo of a {}.",
    "ImageNetR": "a photo of a {}.",
}

IMAGENET_TEMPLATES_SELECT = [
    "itap of a {}.",
    "a bad photo of the {}.",
    "a origami {}.",
    "a photo of the large {}.",
    "a {} in a video game.",
    "art of the {}.",
    "a photo of the small {}.",
]


def imagenet_templates_full() -> list[str]:
    """The 80-template CLIP ImageNet pool (pure data, shared with the
    ELEVATER metadata extraction)."""
    from mvlpt_tpu.data.elevater import template_map

    return list(template_map("imagenet-1k"))


def encode_class_text_features(backbone, clip_cfg, classnames, templates,
                               batch_classes: int = 512) -> jax.Array:
    """Encode (and average over templates) normalized class text features.

    ``backbone`` is a jit ARGUMENT, not a closure: closing over it
    would bake the full text tower into the compiled program as
    constants (one recompile per backbone, and a compile-request
    payload that overflows remote-compile transports)."""
    mean_features = 0.0
    encode = jax.jit(
        lambda bb, ids: clip_core.encode_text(bb, ids, clip_cfg))
    for temp in templates:
        prompts = [temp.format(c.replace("_", " ")) for c in classnames]
        ids = tokenize(prompts, context_length=clip_cfg.context_length)
        feats = []
        for i in range(0, len(ids), batch_classes):
            feats.append(encode(backbone, jnp.asarray(ids[i:i + batch_classes])))
        f = jnp.concatenate(feats, axis=0).astype(jnp.float32)
        f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
        mean_features = mean_features + f
    mean_features = mean_features / len(templates)
    return mean_features / jnp.linalg.norm(mean_features, axis=-1, keepdims=True)


def make_image_encoder(clip_cfg, mean, std, use_pallas="auto"):
    """Jitted ``encode(backbone, images) -> image features`` — the
    shared fast image path for every no-grad consumer (make_zs_infer
    and the extract_features CLI use this same builder, so the two
    cannot drift).

    ViT + uint8 batches take the fast path: the CLIP normalization
    affine folds into the frozen patch-embed matmul (vit.embed_image)
    instead of a separate full-image pass — the same trick the train
    step uses — then the fused kernels run the tower in their no-grad
    variants (same TPU.USE_PALLAS selection as the trainer; inference
    paths never differentiate). ResNet and float inputs keep the plain
    device_normalize + encode_image path. Features are returned raw
    (encoder output dtype, not L2-normalized)."""
    from mvlpt_tpu.core.resnet import RNConfig
    from mvlpt_tpu.data.transforms import device_normalize
    from mvlpt_tpu.ops import select_attn_fn

    mean, std = tuple(mean), tuple(std)
    is_vit = not isinstance(clip_cfg, RNConfig)
    attn_fn = select_attn_fn(use_pallas, inference=True) if is_vit else None

    @jax.jit
    def encode(backbone, images):
        if is_vit and images.dtype == jnp.uint8:
            from mvlpt_tpu.core import vit as vit_mod

            tokens = vit_mod.embed_image(
                backbone["visual"], images,
                patch_size=clip_cfg.vision_patch_size,
                normalize=(mean, std))
            return clip_core.encode_image(
                backbone, tokens, clip_cfg, pre_embedded=True,
                attn_fn=attn_fn)
        # honor the TPU.DEVICE_NORMALIZE uint8 loader contract
        images = device_normalize(images, mean, std)
        kw = {"attn_fn": attn_fn} if is_vit else {}
        return clip_core.encode_image(backbone, images, clip_cfg, **kw)

    return encode


def make_zs_infer(clip_cfg, mean, std, use_pallas="auto"):
    """Jitted zero-shot ``infer(backbone, text_features, images) ->
    logits`` — THE shipped zero-shot compute path (bench.py measures
    zs_eval_img_s through this same builder so the number can't drift
    from what ships). The image tower runs through make_image_encoder
    (uint8 patch-embed normalization fold + no-grad fused kernels)."""
    encode = make_image_encoder(clip_cfg, mean, std, use_pallas)

    @jax.jit
    def infer(backbone, text_features, images):
        img = encode(backbone, images).astype(jnp.float32)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        scale = jnp.exp(backbone["logit_scale"].astype(jnp.float32))
        return scale * img @ text_features.T

    return infer


class _ZeroshotBase:
    def __init__(self, cfg):
        from mvlpt_tpu.data.managers import build_data_manager
        from mvlpt_tpu.train.trainer import load_clip_backbone

        self.cfg = cfg
        self.dm = build_data_manager(cfg)
        self.test_loader = self.dm.test_loader
        param_dtype = jnp.dtype(cfg.TPU.PARAM_DTYPE)
        print(f"Loading CLIP (backbone: {cfg.MODEL.BACKBONE.NAME})")
        self.backbone, self.clip_cfg = load_clip_backbone(cfg, param_dtype)
        if cfg.DATASET.COOP:
            classnames = self.dm.classnames
        else:
            classnames = list(self.dm.lab2cname.values())
        self.text_features = encode_class_text_features(
            self.backbone, self.clip_cfg, classnames, self.templates(classnames))
        self._infer = make_zs_infer(
            self.clip_cfg, cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD,
            use_pallas=cfg.TPU.USE_PALLAS)

    def templates(self, classnames) -> list[str]:
        raise NotImplementedError

    def model_inference(self, images):
        return self._infer(self.backbone, self.text_features, images)

    def train(self):
        print("ZeroshotCLIP has no training; running test()")
        return self.test()

    def load_model(self, directory, epoch=None):
        pass

    def test(self, split=None) -> float:
        from mvlpt_tpu.evaluation import ClassificationEvaluator

        from mvlpt_tpu.utils.pipeline import pipelined_inference

        evaluator = ClassificationEvaluator(self.dm.lab2cname)
        for logits, batch in pipelined_inference(
                self.test_loader,
                lambda b: self.model_inference(jnp.asarray(b["image"]))):
            n_valid = batch.get("n_valid", len(batch["image"]))
            evaluator.process(logits[:n_valid],
                              np.asarray(batch["label"])[:n_valid])
        results = evaluator.evaluate()
        print("results", results)
        return results["accuracy"]


@TRAINER_REGISTRY.register()
class ZeroshotCLIP(_ZeroshotBase):
    """Hand-crafted template zero-shot eval (zsclip.py:32-60)."""

    def templates(self, classnames):
        name = self.cfg.DATASET.NAME or self.cfg.DATASET.DATASET
        if name in CUSTOM_TEMPLATES:
            return [CUSTOM_TEMPLATES[name]]
        from mvlpt_tpu.data.elevater import load_metadata, template_map

        if name in load_metadata():
            return [template_map(name)[0]]
        return ["a photo of a {}."]


@TRAINER_REGISTRY.register()
class ZeroshotCLIP2(_ZeroshotBase):
    """Template-ensembled zero-shot eval (zsclip.py:63-99)."""

    def templates(self, classnames):
        temps = list(IMAGENET_TEMPLATES_SELECT)
        name = self.cfg.DATASET.NAME or self.cfg.DATASET.DATASET
        if name != "ImageNet" and name in CUSTOM_TEMPLATES:
            temps.append(CUSTOM_TEMPLATES[name])
        return temps
