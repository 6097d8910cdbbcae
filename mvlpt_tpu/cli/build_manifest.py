"""Build a local ELEVATER manifest from common dataset layouts.

The reference streams ELEVATER tasks from the Azure ``vision_datasets``
hub; this framework consumes offline manifests (docs/DATASETS.md). This
tool generates them from:

  * an ImageFolder tree:  <src>/{train,test}/<class>/*.jpg
  * an index TSV per split: `relative/path.jpg<TAB>label[,label...]`

Usage:
    python -m mvlpt_tpu.cli.build_manifest --src /data/raw/cifar10 \\
        --task cifar-10 --root /data/elevater [--multilabel]
"""

from __future__ import annotations

import argparse
import json
import os


def from_image_folder(src: str, splits=("train", "test")):
    rows = {}
    classes = None
    for split in splits:
        sdir = os.path.join(src, split)
        if not os.path.isdir(sdir):
            continue
        folders = sorted(f.name for f in os.scandir(sdir) if f.is_dir())
        if classes is None:
            classes = folders
        rows[split] = []
        for label, folder in enumerate(folders):
            fdir = os.path.join(sdir, folder)
            for name in sorted(os.listdir(fdir)):
                if name.startswith("."):
                    continue
                rows[split].append([f"{split}/{folder}/{name}", [label]])
    return rows, len(classes or [])


def from_index_tsv(src: str, splits=("train", "test")):
    rows = {}
    n_classes = 0
    for split in splits:
        path = os.path.join(src, f"{split}.tsv")
        if not os.path.exists(path):
            continue
        rows[split] = []
        with open(path) as f:
            for line in f:
                parts = line.rstrip("\n").split("\t")
                if len(parts) < 2:
                    continue
                labels = [int(x) for x in parts[1].split(",")]
                n_classes = max(n_classes, max(labels) + 1)
                rows[split].append([parts[0], labels])
    return rows, n_classes


def cli():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help="source dataset directory")
    p.add_argument("--task", required=True, help="ELEVATER task name")
    p.add_argument("--root", required=True, help="manifest output root")
    p.add_argument("--multilabel", action="store_true")
    p.add_argument("--link", action="store_true",
                   help="symlink images instead of referencing src in place")
    args = p.parse_args()

    rows, n_from_folders = from_image_folder(args.src)
    if not rows:
        rows, n_from_folders = from_index_tsv(args.src)
    if not rows:
        raise SystemExit(f"no train/test ImageFolder or *.tsv found in {args.src}")

    from mvlpt_tpu.data.elevater import class_map, load_metadata

    n_classes = n_from_folders
    if args.task in load_metadata():
        n_classes = len(class_map(args.task))

    task_dir = os.path.join(args.root, args.task)
    os.makedirs(task_dir, exist_ok=True)
    if args.link:
        for split in rows:
            src_split = os.path.join(args.src, split)
            dst = os.path.join(task_dir, split)
            if os.path.isdir(src_split) and not os.path.exists(dst):
                os.symlink(os.path.abspath(src_split), dst)
    else:
        # reference images in place via relative-to-task paths
        rel = os.path.relpath(os.path.abspath(args.src), task_dir)
        rows = {s: [[os.path.join(rel, p_), l] for p_, l in r]
                for s, r in rows.items()}

    manifest = {
        "type": ("classification_multilabel" if args.multilabel
                 else "classification_multiclass"),
        "num_classes": n_classes,
        "splits": rows,
    }
    out = os.path.join(task_dir, "manifest.json")
    with open(out, "w") as f:
        json.dump(manifest, f)
    print(f"wrote {out}: " + ", ".join(
        f"{s}={len(r)}" for s, r in rows.items()) + f", {n_classes} classes")


if __name__ == "__main__":
    cli()
