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

    cli()

    train = np.load(out / "train.npz")
    assert train["feature_list"].shape[1] == 512  # resnet18 feature dim
    assert np.isfinite(train["feature_list"]).all()
    # non-CLIP model: no text tower -> no text.npz
    assert not (out / "text.npz").exists()
