"""lpclip two-stage pipeline e2e with the RN50 tower (random weights).

The reference probes RN50 features (lpclip/feat_extractor.py:145); this
drives our extract-features -> probe handoff end-to-end through the
ModifiedResNet visual tower, plus the per-task metric override knob.
"""

import argparse
import os

import numpy as np
import pytest

from mvlpt_tpu.config import get_cfg_default
from util_fixtures import make_elevater_task




pytestmark = pytest.mark.slow  # heavy: deselected by default, run with -m ""

def test_lpclip_rn50_extract_and_probe(tmp_path, monkeypatch):
    monkeypatch.setenv("MVLPT_TPU_RANDOM_CLIP", "1")
    root = tmp_path / "elevater"
    make_elevater_task(str(root), "cifar-10", n_classes=10, n_train=20, n_test=4)

    from mvlpt_tpu.cli.lpclip import extract_features, probe

    feat_dir = tmp_path / "feats" / "cifar-10"
    extract_features(argparse.Namespace(
        root=str(root), dataset="cifar-10", dataset_coop=False,
        backbone="RN50", config_file="", output_dir=str(feat_dir),
        batch_size=4, num_workers=0, seed=1))

    train = np.load(feat_dir / "train.npz")
    assert train["feature_list"].shape[1] == 1024  # RN50 embed dim
    assert np.isfinite(train["feature_list"]).all()

    report_dir = tmp_path / "report"
    probe(argparse.Namespace(
        feature_dir=str(feat_dir), dataset="cifar-10",
        report_dir=str(report_dir), num_step=1, num_run=1, shots=[1]))
    summary = [p for p in os.listdir(report_dir) if not p.endswith("_details.txt")]
    assert summary and "Test acc stat" in open(report_dir / summary[0]).read()


def test_metric_override_knob(tmp_path):
    from mvlpt_tpu.data.managers import ElevaterDataManager, _metric_overrides

    root = tmp_path / "elevater"
    make_elevater_task(str(root), "hateful-memes", n_classes=2,
                       n_train=6, n_test=4)

    def build(overrides):
        cfg = get_cfg_default()
        cfg.DATASET.ROOT = str(root)
        cfg.DATASET.DATASET = "hateful-memes"
        cfg.DATASET.NUM_SAMPLES_PER_CLASS = -1
        cfg.DATASET.METRIC_OVERRIDES = overrides
        return ElevaterDataManager(cfg)

    # bug-compatible default: the reference's class_map_metric says
    # accuracy for hateful-memes (prompts.py:3249)
    assert build(())._metric_name == "accuracy"
    assert build(("hateful-memes=roc_auc",))._metric_name == "roc_auc"
    with pytest.raises(ValueError):
        _metric_overrides(type("C", (), {"DATASET": type(
            "D", (), {"METRIC_OVERRIDES": ("oops",)})()})())
