"""Nearest-vocabulary interpretation of learned context vectors
(scripts/interpret_prompt.py:27-63): for each learned ctx vector, list
the closest token embeddings by euclidean distance."""

from __future__ import annotations

import argparse

import numpy as np

from mvlpt_tpu.checkpoint.prompt_io import load_prompt_checkpoint
from mvlpt_tpu.tokenizer import get_tokenizer


def interpret(ctx: np.ndarray, token_embedding: np.ndarray, topk: int = 5):
    tok = get_tokenizer()
    if ctx.ndim == 2:
        ctx = ctx[None]
    out = []
    for m in range(ctx.shape[0]):
        rows = []
        for vec in ctx[m]:
            d = np.linalg.norm(token_embedding - vec[None], axis=-1)
            idxs = np.argsort(d)[:topk]
            rows.append([(tok.decoder[int(i)], float(d[i])) for i in idxs])
        out.append(rows)
    return out


def cli():
    p = argparse.ArgumentParser()
    p.add_argument("fpath", help="prompt checkpoint path")
    p.add_argument("topk", type=int, nargs="?", default=5)
    p.add_argument("--backbone", default="ViT-B/16")
    args = p.parse_args()

    payload = load_prompt_checkpoint(args.fpath)
    sd = payload["state_dict"]
    key = next((k for k in ("coop.ctx", "cocoop.ctx", "ctx") if k in sd), None)
    assert key, f"no ctx tensor in checkpoint; keys: {sorted(sd)}"
    ctx = np.asarray(sd[key], np.float32)
    print(f"Size of context: {ctx.shape}")

    # resolve weights like the trainer (env ckpt path / cache / download)
    from mvlpt_tpu.config import get_cfg_default
    from mvlpt_tpu.train.trainer import load_clip_backbone

    cfg = get_cfg_default()
    cfg.MODEL.BACKBONE.NAME = args.backbone
    import jax.numpy as jnp

    params, _ = load_clip_backbone(cfg, jnp.float32)
    emb = np.asarray(params["text"]["token_embedding"], np.float32)
    for m, rows in enumerate(interpret(ctx, emb, args.topk)):
        print(f"--- context set {m} ---")
        for i, row in enumerate(rows):
            words = ", ".join(f"{w!r} ({d:.4f})" for w, d in row)
            print(f"ctx[{i}]: {words}")


if __name__ == "__main__":
    cli()
