"""End-to-end accuracy soak on synthetic learnable data.

Exercises the FULL production path — CLI arg parsing, ELEVATER
multitask manifests, few-shot/val-split sampling, the input pipeline
(tf.data backend), the windowed trainer, per-task evaluation, best-val
checkpointing — on whatever platform jax resolves (the real TPU chip
when available), using the class-color-signal fixtures from
tests/util_fixtures.py so the task is actually learnable from pixels.

With random-init CLIP towers this is a TRAINABILITY check, not an
accuracy benchmark: the pass criterion is test accuracy well above
chance. Measured on the round-3 code, one v5e chip: 2 tasks x 10
classes (packed label space of 20, chance 0.05; per-task chance 0.1),
200 train images/task, 40 epochs -> per-task test accuracy 0.37 / 0.42
in ~3 min wall. The reference's analogue is its smoke-level
main_mt_coopdata run (scripts/mvlpt/main_mt_coopdata_cut.sh) — it has
no offline soak at all.

Usage:
    PYTHONPATH=/root/repo python scripts/soak_synthetic.py
        [--epochs 40] [--n-train 200] [--min-acc 0.2]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--n-train", type=int, default=200)
    ap.add_argument("--n-test", type=int, default=60)
    ap.add_argument("--min-acc", type=float, default=0.2,
                    help="fail below this average test accuracy "
                         "(chance is 0.05 on the packed label space)")
    args = ap.parse_args()

    os.environ["MVLPT_TPU_RANDOM_CLIP"] = "1"  # zero egress: no real ckpt

    # Tiny towers: the point is the plumbing, not the model capacity.
    from mvlpt_tpu.core import clip as cc

    cc.VIT_ARCHS["ViT-B/32"] = dict(
        embed_dim=16, image_resolution=32, vision_layers=2,
        vision_width=64, vision_patch_size=8)
    cc._TEXT_ARCHS[16] = dict(
        transformer_width=32, transformer_heads=2, transformer_layers=2)

    from tests.util_fixtures import make_elevater_task

    from mvlpt_tpu.cli.train import build_parser, main as train_main

    root = tempfile.mkdtemp(prefix="soak_elev_")
    # Known registry tasks (classnames come from metadata.json); the
    # fixture writes matching 10-class manifests with color-coded images.
    for t in ("cifar-10", "mnist"):
        make_elevater_task(root, t, n_classes=10,
                           n_train=args.n_train, n_test=args.n_test)

    out = tempfile.mkdtemp(prefix="soak_out_")
    import jax

    print("platform:", jax.devices()[0].platform, flush=True)
    train_main(build_parser().parse_args([
        "--root", root, "--output-dir", out,
        "--trainer", "MVLPT", "--dataset", "cifar-10,mnist",
        "--multi-task", "--multi-task-label_pertask",
        "--seed", "1", "--cut-contextlen",
        "OPTIM.MAX_EPOCH", str(args.epochs), "OPTIM.LR", "0.05",
        "OPTIM.WARMUP_EPOCH", "0", "OPTIM.LR_SCHEDULER", "cosine",
        "DATALOADER.TRAIN_X.BATCH_SIZE", "8",
        "DATALOADER.TEST.BATCH_SIZE", "8",
        "DATALOADER.NUM_WORKERS", "0", "DATALOADER.BACKEND", "tf",
        "INPUT.SIZE", "(32, 32)",
        "INPUT.TRANSFORMS",
        "('random_resized_crop', 'random_flip', 'normalize')",
        "MODEL.BACKBONE.NAME", "ViT-B/32",
        "TRAINER.MVLPT.COOP.N_CTX", "2", "TRAINER.MVLPT.VPT.N_CTX", "2",
        "TRAINER.MVLPT.PROJECT_DIM", "8",
        "TEST.FINAL_MODEL", "best_val", "TRAIN.PRINT_FREQ", "5",
    ]))
    log = open(os.path.join(out, "log.txt")).read()
    # the trailing block is the final test-set evaluation
    avgs = re.findall(r"results \{'average': ([0-9.]+)\}", log)
    assert avgs, "no multitask average in log.txt"
    final = float(avgs[-1])
    print(f"final test average accuracy: {final:.3f} "
          f"(chance 0.05, min {args.min_acc})")
    assert final >= args.min_acc, (
        f"soak FAILED: {final:.3f} < {args.min_acc}")
    print("SOAK OK")


if __name__ == "__main__":
    main()
