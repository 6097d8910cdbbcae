"""Average prompt checkpoints across seeds (scripts/avg_ckpt.py:21-66):
tensor-wise mean of the seed-1/2/3 best checkpoints into one
model-best.pth.tar — produces the multitask init used for transfer."""

from __future__ import annotations

import argparse
import os
import pickle

from mvlpt_tpu.checkpoint.prompt_io import (
    average_checkpoints, checkpoint_path, export_reference_checkpoint,
    find_checkpoint)


def cli():
    p = argparse.ArgumentParser(description="average prompt checkpoints")
    p.add_argument("--dirs", nargs="+", required=True,
                   help="run output dirs (one per seed)")
    p.add_argument("--epoch", type=int, default=None,
                   help="load model.pth.tar-<epoch> instead of model-best")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--format", choices=("numpy", "torch"), default="numpy",
                   help="output format: this repo's numpy pickle (default) "
                        "or the reference trainer's torch archive (key "
                        "names per trainers/mvlpt.py:1090-1125), directly "
                        "consumable by the reference's --model-dir and "
                        "avg_ckpt.py")
    args = p.parse_args()

    # find_checkpoint: same resolution as --model-dir (model-best, or
    # the newest epoch checkpoint on last_step runs that never wrote one)
    paths = [find_checkpoint(d, args.epoch) for d in args.dirs]
    for d, path in zip(args.dirs, paths):
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        # Make the resolution visible: on best_val runs the fallback to
        # the newest epoch checkpoint (a seed that crashed before its
        # first val improvement) would otherwise silently poison the
        # averaged init with near-random weights.
        print(f"  {d} -> {path}")
        if args.epoch is None and os.path.basename(path) != "model-best.pth.tar":
            print(f"  WARNING: {d} has no model-best.pth.tar; averaged its "
                  f"newest epoch checkpoint instead")
    avg = average_checkpoints(paths)
    out = checkpoint_path(args.output_dir)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    if args.format == "torch":
        export_reference_checkpoint(out, avg["state_dict"],
                                    epoch=avg["epoch"],
                                    val_result=avg["val_result"])
    else:
        with open(out, "wb") as f:
            pickle.dump(avg, f, protocol=pickle.HIGHEST_PROTOCOL)
    print(f"averaged {len(paths)} checkpoints -> {out} ({args.format})")


if __name__ == "__main__":
    cli()
