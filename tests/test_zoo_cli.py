"""extract-features CLI e2e through the non-CLIP model-zoo branch
(--model, models/zoo.py), mirroring the reference's MODEL.NAME dispatch
(feature.py:245-321)."""

import sys

import numpy as np

from util_fixtures import make_elevater_task


def test_extract_features_zoo_model(tmp_path, monkeypatch):
    root = tmp_path / "elevater"
    make_elevater_task(str(root), "cifar-10", n_classes=3, n_train=6,
                       n_test=4)
    out = tmp_path / "feats"
    monkeypatch.setattr(sys, "argv", [
        "extract_features", "--root", str(root), "--dataset", "cifar-10",
        "--model", "resnet18", "--output-dir", str(out), "--batch-size", "4",
    ])
    from mvlpt_tpu.cli.extract_features import cli

    # the zoo branch must preprocess with the model's own stats
    # (ImageNet, feature.py:538-619), not cfg.INPUT's CLIP defaults
    import mvlpt_tpu.data.managers as managers_mod

    seen_input = {}
    real_bdm = managers_mod.build_data_manager

    def spy(cfg, *a, **kw):
        seen_input["mean"] = tuple(cfg.INPUT.PIXEL_MEAN)
        seen_input["std"] = tuple(cfg.INPUT.PIXEL_STD)
        seen_input["size"] = tuple(cfg.INPUT.SIZE)
        return real_bdm(cfg, *a, **kw)

    monkeypatch.setattr(managers_mod, "build_data_manager", spy)

    cli()

    assert seen_input["mean"] == (0.485, 0.456, 0.406)
    assert seen_input["std"] == (0.229, 0.224, 0.225)
    assert seen_input["size"] == (224, 224)

    train = np.load(out / "train.npz")
    assert train["feature_list"].shape[1] == 512  # resnet18 feature dim
    assert np.isfinite(train["feature_list"]).all()
    # non-CLIP model: no text tower -> no text.npz
    assert not (out / "text.npz").exists()


def test_extract_features_clip_custom_task(tmp_path, monkeypatch):
    """CLIP-branch extraction on a CUSTOM task (self-describing
    manifest, no metadata.json row, no METRIC_OVERRIDES): the metric
    lookup must default instead of KeyError-ing, text features must be
    built from the MANIFEST classnames (class_map would KeyError), the
    template pool must fall back to the default CLIP prompt, and the
    image path runs the shared make_image_encoder."""
    monkeypatch.setenv("MVLPT_TPU_RANDOM_CLIP", "1")
    # tiny towers for speed (res 224 kept: the CLI preprocesses at
    # cfg.INPUT's CLIP defaults for CLIP backbones)
    from mvlpt_tpu.core import clip as cc

    monkeypatch.setitem(cc.VIT_ARCHS, "ViT-B/32", dict(
        embed_dim=16, image_resolution=224, vision_layers=2,
        vision_width=64, vision_patch_size=32))
    monkeypatch.setitem(cc._TEXT_ARCHS, 16, dict(
        transformer_width=32, transformer_heads=2, transformer_layers=2))

    from util_fixtures import make_elevater_task as mk

    root = tmp_path / "elevater"
    mk(str(root), "my-custom-task", n_classes=3, n_train=6, n_test=4,
       classnames=["ant", "bee", "wasp"])
    out = tmp_path / "feats"
    monkeypatch.setattr(sys, "argv", [
        "extract_features", "--root", str(root), "--dataset",
        "my-custom-task", "--backbone", "ViT-B/32",
        "--output-dir", str(out), "--batch-size", "4",
    ])
    from mvlpt_tpu.cli.extract_features import cli

    cli()

    train = np.load(out / "train.npz")
    assert train["feature_list"].shape[1] == 16  # tiny embed dim
    assert np.isfinite(np.asarray(train["feature_list"],
                                  np.float32)).all()
    text = np.load(out / "text.npz", allow_pickle=True)
    assert text["text_features"].shape == (3, 16)  # manifest classnames
    assert list(text["classnames"]) == ["ant", "bee", "wasp"]
