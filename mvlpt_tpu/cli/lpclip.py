"""CLIP linear probe (rebuild of lpclip/, SURVEY.md §2.10).

Two-stage pipeline with a file handoff, same shape as the reference:
  1. ``extract-features``: frozen CLIP visual features per split dumped
     to ``<out>/<split>.npz`` (lpclip/feat_extractor.py:105-167) — the
     tower runs as one jitted batch loop on TPU.
  2. ``probe``: sklearn logistic regression per the CLIP paper's
     appendix A3 protocol (lpclip/linear_probe.py:27-129): shots
     1/2/4/8/16 x num_run seeds, 7-point coarse log-C grid, then
     num_step rounds of binary search on log-C against a few-shot val
     set; reports mean/std test accuracy to report files.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

VAL_SHOTS = {1: 1, 2: 2, 4: 4, 8: 4, 16: 4}  # lpclip val_shot_list


def extract_features(args):
    import jax
    import jax.numpy as jnp

    from mvlpt_tpu.config import get_cfg_default
    from mvlpt_tpu.core import clip as clip_core
    from mvlpt_tpu.data.managers import build_data_manager
    from mvlpt_tpu.train.trainer import load_clip_backbone

    cfg = get_cfg_default()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.DATASET.ROOT = args.root
    cfg.DATASET.DATASET = args.dataset
    cfg.DATASET.COOP = args.dataset_coop
    if args.dataset_coop:
        cfg.DATASET.NAME = args.dataset
    cfg.SEED = args.seed
    cfg.DATALOADER.NUM_WORKERS = args.num_workers
    cfg.DATALOADER.TEST.BATCH_SIZE = args.batch_size
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = args.batch_size
    cfg.INPUT.TRANSFORMS = ()  # eval transform everywhere (feat_extractor.py)
    cfg.MODEL.BACKBONE.NAME = args.backbone
    cfg.freeze()

    backbone, clip_cfg = load_clip_backbone(cfg, jnp.bfloat16)
    dm = build_data_manager(cfg)

    from mvlpt_tpu.data.transforms import device_normalize

    mean, std = tuple(cfg.INPUT.PIXEL_MEAN), tuple(cfg.INPUT.PIXEL_STD)

    @jax.jit
    def visual_features(images):
        # honor the TPU.DEVICE_NORMALIZE uint8 loader contract
        images = device_normalize(images, mean, std)
        return clip_core.encode_image(backbone, images, clip_cfg)

    from mvlpt_tpu.utils.pipeline import dump_split_features

    os.makedirs(args.output_dir, exist_ok=True)
    splits = {"train": dm.train_loader_x, "val": dm.val_loader,
              "test": dm.test_loader}
    for split, loader in splits.items():
        if loader is None:
            continue
        path = os.path.join(args.output_dir, f"{split}.npz")
        n = dump_split_features(
            loader, lambda b: visual_features(jnp.asarray(b["image"])), path)
        print(f"{split}: {n} features -> {path}")


def probe(args):
    from sklearn.linear_model import LogisticRegression

    def load(split):
        d = np.load(os.path.join(args.feature_dir, f"{split}.npz"))
        return d["feature_list"], d["label_list"]

    train_x, train_y = load("train")
    val_x, val_y = load("val") if os.path.exists(
        os.path.join(args.feature_dir, "val.npz")) else load("test")
    test_x, test_y = load("test")

    os.makedirs(args.report_dir, exist_ok=True)
    tag = os.path.basename(os.path.normpath(args.feature_dir))
    detail_path = os.path.join(
        args.report_dir, f"{tag}_s{args.num_step}r{args.num_run}_details.txt")
    summary_path = os.path.join(
        args.report_dir, f"{tag}_s{args.num_step}r{args.num_run}.txt")

    def fit_acc(c, x, y, ex, ey):
        # l2 penalty (sklearn default), C swept per the CLIP A3 protocol
        clf = LogisticRegression(solver="lbfgs", max_iter=1000, C=c).fit(x, y)
        return clf, float((clf.predict(ex) == ey).mean())

    for num_shot in args.shots:
        accs = np.zeros(args.num_run)
        for seed in range(1, args.num_run + 1):
            rng = np.random.RandomState(seed)
            classes = np.unique(train_y)

            def sample(x, y, k):
                idx = np.concatenate([
                    rng.choice(np.where(y == c)[0],
                               size=min(k, (y == c).sum()), replace=False)
                    for c in classes])
                return x[idx], y[idx]

            fs_x, fs_y = sample(train_x, train_y, num_shot)
            fv_x, fv_y = sample(val_x, val_y, VAL_SHOTS.get(num_shot, 4))

            # stage 1: 7-point coarse grid on log C
            grid = [1e6, 1e4, 1e2, 1, 1e-2, 1e-4, 1e-6]
            grid_acc = [fit_acc(c, fs_x, fs_y, fv_x, fv_y)[1] for c in grid]
            c_peak = grid[int(np.argmax(grid_acc))]
            c_left, c_right = 0.1 * c_peak, 10 * c_peak

            # stage 2: binary search on log C
            test_acc = 0.0
            for _ in range(args.num_step):
                clf_l, acc_l = fit_acc(c_left, fs_x, fs_y, fv_x, fv_y)
                clf_r, acc_r = fit_acc(c_right, fs_x, fs_y, fv_x, fv_y)
                if acc_l < acc_r:
                    c_final, clf = c_right, clf_r
                    c_left = 10 ** (0.5 * (np.log10(c_right) + np.log10(c_left)))
                else:
                    c_final, clf = c_left, clf_l
                    c_right = 10 ** (0.5 * (np.log10(c_right) + np.log10(c_left)))
                test_acc = 100.0 * float((clf.predict(test_x) == test_y).mean())
            accs[seed - 1] = test_acc
            with open(detail_path, "a+") as f:
                f.write(f"{args.dataset}, seed {seed}, {num_shot} shot, "
                        f"weight {c_final}, test_acc {test_acc:.2f}\n")
        line = (f"{args.dataset}, {num_shot} Shot, Test acc stat: "
                f"{accs.mean():.2f} ({accs.std():.2f})\n")
        print(line, end="")
        with open(summary_path, "a+") as f:
            f.write(line)


def cli():
    parser = argparse.ArgumentParser(description="CLIP linear probe")
    sub = parser.add_subparsers(dest="cmd", required=True)
    fe = sub.add_parser("extract-features")
    fe.add_argument("--root", required=True)
    fe.add_argument("--dataset", required=True)
    fe.add_argument("--dataset-coop", action="store_true")
    # The reference probes RN50 features (lpclip/feat_extractor.py:145).
    fe.add_argument("--backbone", default="RN50")
    fe.add_argument("--config-file", default="")
    fe.add_argument("--output-dir", required=True)
    fe.add_argument("--batch-size", type=int, default=128)
    fe.add_argument("--num-workers", type=int, default=4)
    fe.add_argument("--seed", type=int, default=1)
    pr = sub.add_parser("probe")
    pr.add_argument("--feature-dir", required=True)
    pr.add_argument("--dataset", default="")
    pr.add_argument("--report-dir", default="./report")
    pr.add_argument("--num-step", type=int, default=8)
    pr.add_argument("--num-run", type=int, default=10)
    pr.add_argument("--shots", type=int, nargs="+", default=[1, 2, 4, 8, 16])
    args = parser.parse_args()
    if args.cmd == "extract-features":
        extract_features(args)
    else:
        probe(args)


if __name__ == "__main__":
    cli()
