"""Prompt-only checkpoint save/load/average.

Keeps the reference's checkpoint contract (SURVEY.md §5):
  * files ``<dir>/prompt_learner/model.pth.tar-<epoch>`` and
    ``model-best.pth.tar`` (names at mvlpt.py:1098-1101) — the payload
    here is a pickle of numpy arrays, not a torch archive;
  * payload keys ``state_dict`` / ``epoch`` / ``val_result``
    (avg_ckpt.py:58-66);
  * on load: legacy ``upt_proj`` keys renamed to ``mvlpt_proj``
    (mvlpt.py:1112) and the frozen ``token_prefix``/``token_suffix``
    buffers dropped so class-dependent embeddings are recomputed for the
    new task (mvlpt.py:1117-1121); loading is non-strict;
  * cross-seed tensor-wise checkpoint averaging (avg_ckpt.py:21-43).

State dicts are flat {dotted.path: np.ndarray} views of the prompt
pytree, so checkpoints are framework-agnostic data.
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np

MODEL_BEST = "model-best.pth.tar"


def flatten_params(tree, prefix="") -> dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_params(v, f"{prefix}{k}."))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_params(flat: dict) -> dict:
    tree: dict = {}
    for key, value in flat.items():
        node = tree
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def checkpoint_path(directory: str, epoch: int | None = None,
                    name: str = "prompt_learner") -> str:
    fname = MODEL_BEST if epoch is None else f"model.pth.tar-{epoch}"
    return os.path.join(directory, name, fname)


def save_prompt_checkpoint(path: str, prompt_params, epoch: int,
                           val_result: float | None = None,
                           extra: dict | None = None):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {
        "state_dict": flatten_params(jax.device_get(prompt_params)),
        "epoch": int(epoch),
        "val_result": None if val_result is None else float(val_result),
    }
    if extra:
        payload.update(extra)
    with open(path, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_prompt_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    sd = payload["state_dict"]
    sd = {k.replace("upt_proj", "mvlpt_proj"): v for k, v in sd.items()}
    for drop in list(sd):
        if "token_prefix" in drop or "token_suffix" in drop:
            del sd[drop]
    payload["state_dict"] = sd
    return payload


def apply_state_dict(prompt_params, state_dict: dict, strict: bool = False):
    """Merge a flat state_dict into a prompt pytree (strict=False like
    mvlpt.py:1125: unknown keys ignored, missing keys keep init)."""
    current = flatten_params(prompt_params)
    loaded, skipped = 0, []
    for k, v in state_dict.items():
        if k in current:
            if current[k].shape != np.asarray(v).shape:
                if strict:
                    raise ValueError(f"shape mismatch for {k}")
                skipped.append(k)
                continue
            current[k] = np.asarray(v, current[k].dtype)
            loaded += 1
        elif strict:
            raise KeyError(f"unexpected key {k}")
        else:
            skipped.append(k)
    import jax.numpy as jnp

    tree = unflatten_params({k: jnp.asarray(v) for k, v in current.items()})
    return tree, loaded, skipped


def average_checkpoints(paths: list[str]) -> dict:
    """Tensor-wise mean across seed checkpoints (avg_ckpt.py:21-43)."""
    payloads = [load_prompt_checkpoint(p) for p in paths]
    keys = set(payloads[0]["state_dict"])
    for p in payloads[1:]:
        keys &= set(p["state_dict"])
    avg = {
        k: np.mean([p["state_dict"][k].astype(np.float64) for p in payloads],
                   axis=0).astype(payloads[0]["state_dict"][k].dtype)
        for k in sorted(keys)
    }
    return {
        "state_dict": avg,
        "epoch": payloads[0]["epoch"],
        "val_result": float(np.mean([
            p["val_result"] for p in payloads if p.get("val_result") is not None
        ])) if any(p.get("val_result") is not None for p in payloads) else None,
    }
