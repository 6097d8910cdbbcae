"""ELEVATER feature caching (rebuild of
trainers/vision_benchmark/evaluation/feature.py:324-535):

  * image features: frozen CLIP visual tower over each split -> npz
  * text features: per-class prompt-template averaging over the task's
    template pool (template_map) -> npz

The reference's external-knowledge text sources (WordNet/Wiktionary/
GPT-3 tsv files under resources/knowledge/) plug into the same hook via
--knowledge-tsv files of `classname<TAB>description` rows.
"""

from __future__ import annotations

import argparse
import os

import numpy as np




def cli():
    import jax
    import jax.numpy as jnp

    from mvlpt_tpu.config import get_cfg_default
    from mvlpt_tpu.data.elevater import template_map
    from mvlpt_tpu.data.elevater.manifest import first_classname
    from mvlpt_tpu.data.managers import build_data_manager
    from mvlpt_tpu.models.zsclip import encode_class_text_features
    from mvlpt_tpu.train.trainer import load_clip_backbone

    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--dataset", required=True, help="ELEVATER task name")
    p.add_argument("--backbone", default="ViT-B/32")
    p.add_argument("--model", default=None,
                   help="non-CLIP zoo model (models/zoo.py get_model: "
                        "resnet18/50/..., vit_*/deit_*/mae_*/mocov3_*) — "
                        "the reference's MODEL.NAME dispatch "
                        "(feature.py:245-321). Image features only; text "
                        "features need a CLIP backbone")
    p.add_argument("--model-checkpoint", default=None,
                   help="local torch state-dict for --model")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--shots", type=int, default=-1)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--knowledge", nargs="*", default=[],
                   choices=["wiki", "wordnet", "hierarchy", "gpt3"],
                   help="built-in knowledge sources (data/elevater/"
                        "knowledge.json) appended to prompts")
    p.add_argument("--knowledge-aggregation", default="WIKI_AND_GPT3",
                   choices=["WIKI_AND_GPT3", "WIKI_THEN_GPT3"])
    p.add_argument("--n-gpt3", type=int, default=5)
    p.add_argument("--knowledge-tsv", nargs="*", default=[],
                   help="extra classname<TAB>description files")
    args = p.parse_args()

    cfg = get_cfg_default()
    cfg.DATASET.ROOT = args.root
    cfg.DATASET.DATASET = args.dataset
    cfg.DATASET.NUM_SAMPLES_PER_CLASS = args.shots
    cfg.DATASET.RANDOM_SEED_SAMPLING = args.seed
    cfg.MODEL.BACKBONE.NAME = args.backbone
    cfg.DATALOADER.TEST.BATCH_SIZE = args.batch_size
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = args.batch_size

    if args.model:
        from mvlpt_tpu.models.zoo import get_model

        zoo = get_model(args.model, checkpoint=args.model_checkpoint,
                        dtype=jnp.bfloat16)
        # Preprocess with the zoo model's own stats (the reference's
        # non-CLIP branches carry ImageNet mean/std and their native
        # input size in the model yaml, feature.py:538-619) — not the
        # CLIP defaults cfg.INPUT starts with.
        cfg.INPUT.SIZE = (zoo.input_resolution, zoo.input_resolution)
        cfg.INPUT.PIXEL_MEAN = list(zoo.pixel_mean)
        cfg.INPUT.PIXEL_STD = list(zoo.pixel_std)
        cfg.freeze()
        from mvlpt_tpu.data.transforms import device_normalize

        _zmean, _zstd = tuple(zoo.pixel_mean), tuple(zoo.pixel_std)
        visual = jax.jit(
            lambda images: zoo.features(
                device_normalize(images, _zmean, _zstd)))
        backbone = clip_cfg = None
    else:
        cfg.freeze()
        backbone, clip_cfg = load_clip_backbone(cfg, jnp.bfloat16)
        # the shared no-grad image path (models/zsclip.py): uint8 ViT
        # batches fold CLIP normalization into the frozen patch-embed
        # matmul, the fused kernels run their inference variants (no
        # backward-residual HBM writes — extraction never
        # differentiates); ResNet / float inputs device_normalize
        from mvlpt_tpu.models.zsclip import make_image_encoder

        _encode = make_image_encoder(
            clip_cfg, tuple(cfg.INPUT.PIXEL_MEAN),
            tuple(cfg.INPUT.PIXEL_STD), cfg.TPU.USE_PALLAS)
        _bb = backbone

        def visual(images):
            return _encode(_bb, images)
    # zoo models never consume classnames (no text tower), so the
    # manifest/metadata class-count guard must not bind there
    dm = build_data_manager(cfg, strict_classnames=not args.model)

    from mvlpt_tpu.utils.pipeline import dump_split_features

    os.makedirs(args.output_dir, exist_ok=True)
    for split, loader in (("train", dm.train_loader_x), ("val", dm.val_loader),
                          ("test", dm.test_loader)):
        if loader is None:
            continue
        n = dump_split_features(
            loader, lambda b: visual(jnp.asarray(b["image"])),
            os.path.join(args.output_dir, f"{split}.npz"))
        print(f"{split}: {n} image features")

    # ---- text features: template averaging (+ optional knowledge rows)
    if backbone is None:
        # non-CLIP zoo model: no text tower (matches the reference —
        # extract_text_features only runs for CLIP-family models,
        # feature.py:410-535)
        print(f"{args.model}: image features only (no text tower)")
        return
    knowledge = {}
    for tsv in args.knowledge_tsv:
        with open(tsv) as f:
            for line in f:
                parts = line.rstrip("\n").split("\t")
                if len(parts) >= 2:
                    knowledge.setdefault(parts[0], []).append(parts[1])

    # classnames come from the data manager (manifest-declared >
    # metadata.json, data/elevater/manifest._resolve_classnames), so a
    # custom task with a self-describing manifest extracts text
    # features too — class_map() alone would KeyError on it
    classnames = [first_classname(c) for c in dm.classnames]
    try:
        templates = template_map(args.dataset)
    except KeyError:
        # custom task: metadata.json carries no template pool
        templates = ["a photo of a {}."]
        print(f"note: task {args.dataset!r} not in metadata.json — "
              f"using the default template 'a photo of a {{}}.'")
    if args.knowledge:
        from mvlpt_tpu.data.elevater.knowledge import (
            encode_class_text_features_with_knowledge)

        text = encode_class_text_features_with_knowledge(
            backbone, clip_cfg, args.dataset, classnames, templates,
            sources=tuple(args.knowledge), n_gpt3=args.n_gpt3,
            aggregation=args.knowledge_aggregation)
    else:
        text = encode_class_text_features(backbone, clip_cfg, classnames,
                                          templates)
    if knowledge:
        extra = []
        for c in classnames:
            descs = knowledge.get(c, [])
            extra.append(f"{c}. {' '.join(descs)[:200]}" if descs else c)
        from mvlpt_tpu.models.zsclip import encode_class_text_features as enc

        text_k = enc(backbone, clip_cfg, extra, ["a photo of a {}."])
        text = text + text_k
        text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
    np.savez(os.path.join(args.output_dir, "text.npz"),
             text_features=np.asarray(text, np.float32),
             classnames=np.asarray(classnames, object))
    print(f"text: {len(classnames)} classes x {len(templates)} templates")


if __name__ == "__main__":
    cli()
