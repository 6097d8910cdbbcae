"""Convert a prompt checkpoint to the reference's torch format.

The load direction (reference torch archive -> this framework) lives in
``checkpoint/prompt_io.load_prompt_checkpoint``; this CLI is the return
trip: any checkpoint — this repo's numpy pickle or an already-torch
archive — re-emitted as the reference trainer's own ``torch.save``
payload (keys ``state_dict``/``epoch``/``val_result`` with the
reference learner's tensor names; /root/reference/trainers/
mvlpt.py:1090-1125), so prompts trained on TPU here warm-start the
reference's GPU runs (``--model-dir``) and feed its ``avg_ckpt.py``
unchanged.

Usage:
    python -m mvlpt_tpu.cli.export_ckpt --input <run_dir_or_file> \
        --output <file.pth.tar> [--epoch N]
"""

from __future__ import annotations

import argparse
import os

from mvlpt_tpu.checkpoint.prompt_io import (
    export_reference_checkpoint, find_checkpoint, load_prompt_checkpoint)


def cli():
    p = argparse.ArgumentParser(
        description="export a prompt checkpoint in the reference's "
                    "torch format")
    p.add_argument("--input", required=True,
                   help="run output dir (resolved like --model-dir) or a "
                        "checkpoint file path")
    p.add_argument("--epoch", type=int, default=None,
                   help="with a dir input: load model.pth.tar-<epoch> "
                        "instead of model-best")
    p.add_argument("--output", required=True,
                   help="destination .pth.tar (torch archive)")
    args = p.parse_args()

    src = args.input
    if os.path.isdir(src):
        src = find_checkpoint(src, args.epoch)
    if not os.path.exists(src):
        raise FileNotFoundError(src)
    payload = load_prompt_checkpoint(src)
    export_reference_checkpoint(
        args.output, payload["state_dict"], epoch=payload["epoch"],
        val_result=payload.get("val_result"))
    print(f"exported {src} -> {args.output} (reference torch format)")


if __name__ == "__main__":
    cli()
