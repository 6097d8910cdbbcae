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

``load_prompt_checkpoint`` additionally consumes the reference's OWN
``torch.save`` archives — both what the reference trainer writes during
training (Dassl save_checkpoint payload, keys state_dict/epoch/
val_result; /root/reference/trainers/mvlpt.py:1090-1125) and the
released averaged MCoOp/MVPT/MUPT multitask inits
(/root/reference/scripts/avg_ckpt.py:58-66, README.md:33). Reference
key names/layouts (``ctx``, ``vpt_embeddings(_deep)``, ``vpt_proj``,
``mvlpt_proj_ctx_*`` pre/post Linears, the ``mvlpt_proj.resblocks.*``
1-layer coupler transformer, ``cocoop_ctx``, ``meta_net.*``) are mapped
into this repo's prompt-pytree layout, including the torch Linear
(out,in)→(in,out) kernel transposes.

``export_reference_checkpoint`` / ``to_reference_state_dict`` are the
exact inverse — TPU-trained prompts re-emitted as the reference
trainer's own torch archive (cli/export_ckpt, avg_ckpt --format torch).
"""

from __future__ import annotations

import os
import pickle
import re
import zipfile

import jax
import numpy as np

# torch tensor / array-like -> numpy. fp16 (CLIP-native prompt params)
# and bf16 upcast to fp32: our masters are fp32, and averaging in fp16
# would lose the seeds' low bits. Shared with the tower converter.
from .convert import _np as _tensor_to_np

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


def find_checkpoint(directory: str, epoch: int | None = None,
                    name: str = "prompt_learner") -> str:
    """checkpoint_path, but when no epoch is requested and
    model-best.pth.tar does not exist (TEST.FINAL_MODEL last_step runs
    never write one), fall back to the highest-numbered
    model.pth.tar-N the training leg saved. Lets `--model-dir` work
    without `--load-epoch` regardless of the config's MAX_EPOCH /
    CHECKPOINT_FREQ — the protocol shell scripts rely on this."""
    path = checkpoint_path(directory, epoch, name)
    if epoch is not None or os.path.exists(path):
        return path
    epochs = list_epoch_checkpoints(directory, name)
    if not epochs:
        return path  # caller raises FileNotFoundError with this path
    return checkpoint_path(directory, epochs[-1], name)


def list_epoch_checkpoints(directory: str,
                           name: str = "prompt_learner") -> list[int]:
    """Sorted epoch numbers of the model.pth.tar-N files under
    <directory>/<name>/. Exact-pattern match, so stray .bak/.tmp
    copies of a checkpoint never break the scan."""
    pdir = os.path.join(directory, name)
    epochs = []
    if os.path.isdir(pdir):
        for f in os.listdir(pdir):
            m = re.fullmatch(r"model\.pth\.tar-(\d+)", f)
            if m:
                epochs.append(int(m.group(1)))
    return sorted(epochs)


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


# --- reference torch-archive interop ---------------------------------------

# Direct tensor renames: reference learner attribute -> our dotted key
# (attribute names at /root/reference/trainers/mvlpt.py:167-289).
_REF_DIRECT = {
    "ctx": "coop.ctx",
    "vpt_embeddings": "vpt.embeddings",
    "vpt_embeddings_deep": "vpt.embeddings_deep",
    "cocoop_ctx": "cocoop.ctx",
}

# Stacked coupler-transformer leaves -> torch resblock key names; the
# bool marks Linear kernels that transpose back to torch's (out, in).
# Leaf names must match core/clip.py's _init_block_stack layout.
_REF_RESBLOCK_LEAVES = {
    ("ln_1", "scale"): ("ln_1.weight", False),
    ("ln_1", "bias"): ("ln_1.bias", False),
    ("attn", "qkv_w"): ("attn.in_proj_weight", True),
    ("attn", "qkv_b"): ("attn.in_proj_bias", False),
    ("attn", "out_w"): ("attn.out_proj.weight", True),
    ("attn", "out_b"): ("attn.out_proj.bias", False),
    ("ln_2", "scale"): ("ln_2.weight", False),
    ("ln_2", "bias"): ("ln_2.bias", False),
    ("mlp", "fc_w"): ("mlp.c_fc.weight", True),
    ("mlp", "fc_b"): ("mlp.c_fc.bias", False),
    ("mlp", "proj_w"): ("mlp.c_proj.weight", True),
    ("mlp", "proj_b"): ("mlp.c_proj.bias", False),
}

# torch nn.Linear modules: weight is (out, in); our kernel is (in, out).
_REF_LINEAR = {
    "vpt_proj": "vpt.proj",
    "mvlpt_proj_ctx_coop_pre": "mvlpt_proj.coop_pre",
    "mvlpt_proj_ctx_coop_post": "mvlpt_proj.coop_post",
    "mvlpt_proj_ctx_vpt_pre": "mvlpt_proj.vpt_pre",
    "mvlpt_proj_ctx_vpt_post": "mvlpt_proj.vpt_post",
    "meta_net.linear1": "cocoop.meta_net.linear1",
    "meta_net.linear2": "cocoop.meta_net.linear2",
}




def is_reference_state_dict(sd: dict) -> bool:
    """True if the flat keys use the reference learner's torch names."""
    for k in sd:
        if k in _REF_DIRECT or k.startswith("mvlpt_proj.resblocks."):
            return True
        if any(k == f"{m}.weight" or k == f"{m}.bias" for m in _REF_LINEAR):
            return True
    return False


def map_reference_state_dict(sd: dict) -> dict[str, np.ndarray]:
    """Reference prompt-learner state_dict -> our flat dotted numpy keys.

    The inverse of tests' params_from_ref_learner: same layout rules as
    checkpoint/convert.py applies to the frozen towers (Linear kernels
    transposed, OpenAI resblocks stacked along a leading layer axis).
    `token_prefix`/`token_suffix` buffers are dropped (mvlpt.py:1117-1121)
    and unknown keys are passed through untouched for apply_state_dict's
    non-strict skip accounting.
    """
    sd = {k: _tensor_to_np(v) for k, v in sd.items()}
    out: dict[str, np.ndarray] = {}
    n_blocks = 0
    for k, v in sd.items():
        if "token_prefix" in k or "token_suffix" in k:
            continue
        if k in _REF_DIRECT:
            out[_REF_DIRECT[k]] = v
            continue
        mod, _, leaf = k.rpartition(".")
        if mod in _REF_LINEAR and leaf in ("weight", "bias"):
            if leaf == "weight":
                out[f"{_REF_LINEAR[mod]}.kernel"] = v.T
            else:
                out[f"{_REF_LINEAR[mod]}.bias"] = v
            continue
        if k.startswith("mvlpt_proj.resblocks."):
            n_blocks = max(n_blocks, int(k.split(".")[2]) + 1)
            continue  # handled as a stacked group below
        out[k] = v  # unknown key: pass through (skipped non-strictly)
    if n_blocks:
        from .convert import _stack_openai_blocks

        stacked = _stack_openai_blocks(sd, "mvlpt_proj", n_blocks)
        out.update(flatten_params(stacked, "mvlpt_proj.transformer."))
    return out


def to_reference_state_dict(flat: dict) -> dict[str, np.ndarray]:
    """Our flat dotted numpy keys -> the reference learner's torch names.

    Exact inverse of :func:`map_reference_state_dict`: Linear kernels
    transposed back to torch's (out, in), the stacked 1-layer coupler
    transformer unstacked into ``mvlpt_proj.resblocks.{i}.*``
    (/root/reference/trainers/mvlpt.py:257 builds it as a CLIP
    ``Transformer``). ``token_prefix``/``token_suffix`` are not emitted —
    the reference drops them at load time anyway (mvlpt.py:1117-1121)
    and its ``load_state_dict(strict=False)`` (mvlpt.py:1125) tolerates
    their absence. Unknown keys pass through untouched.
    """
    inv_direct = {v: k for k, v in _REF_DIRECT.items()}
    inv_linear = {v: k for k, v in _REF_LINEAR.items()}
    out: dict[str, np.ndarray] = {}
    for k, v in flat.items():
        v = _tensor_to_np(v)
        if k in inv_direct:
            out[inv_direct[k]] = v
            continue
        mod, _, leaf = k.rpartition(".")
        if mod in inv_linear and leaf in ("kernel", "bias"):
            if leaf == "kernel":
                out[f"{inv_linear[mod]}.weight"] = np.ascontiguousarray(v.T)
            else:
                out[f"{inv_linear[mod]}.bias"] = v
            continue
        if k.startswith("mvlpt_proj.transformer."):
            # stacked (layers, ...) group -> per-layer torch resblock keys
            grp, leaf = k.split(".")[2], k.split(".")[3]
            ref_leaf, transpose = _REF_RESBLOCK_LEAVES[(grp, leaf)]
            for i in range(v.shape[0]):
                vi = v[i].T if transpose else v[i]
                out[f"mvlpt_proj.resblocks.{i}.{ref_leaf}"] = (
                    np.ascontiguousarray(vi))
            continue
        out[k] = v  # unknown key: pass through (strict=False on their side)
    return out


def export_reference_checkpoint(path: str, prompt_params, epoch: int = 0,
                                val_result: float | None = None):
    """``torch.save`` a prompt pytree (or flat state_dict) in the
    reference trainer's own checkpoint format — the Dassl payload
    (state_dict/epoch/val_result; mvlpt.py:1090-1125) with the reference
    learner's key names — so checkpoints trained here feed the
    reference's ``--model-dir`` warm starts and ``avg_ckpt.py`` directly.
    """
    import torch

    # a flat state_dict has no dict values; a prompt pytree is nested
    if any(isinstance(v, dict) for v in prompt_params.values()):
        flat = flatten_params(jax.device_get(prompt_params))
    else:
        flat = dict(prompt_params)
    # np.array(copy=True): jax exports non-writable views, which torch
    # rejects for zero-copy conversion
    sd = {k: torch.from_numpy(np.array(v))
          for k, v in to_reference_state_dict(flat).items()}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    torch.save({"state_dict": sd, "epoch": int(epoch),
                "val_result": None if val_result is None else
                float(val_result)}, path)


def _read_torch_payload(path: str) -> dict:
    """Read a torch.save archive (zip or legacy pickle) on the host.

    torch-on-host is already a supported pattern (convert.py:356-371).
    Accepts both the Dassl payload dict and a bare state_dict.
    """
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    except TypeError:  # older torch without weights_only
        obj = torch.load(path, map_location="cpu")
    if isinstance(obj, dict) and "state_dict" in obj:
        sd, epoch = obj["state_dict"], int(obj.get("epoch") or 0)
        val = obj.get("val_result")
    else:
        sd, epoch, val = obj, 0, None
    return {
        "state_dict": {k: _tensor_to_np(v) for k, v in sd.items()},
        "epoch": epoch,
        "val_result": None if val is None else float(val),
    }


# First pickle frame of a legacy (pre-zip) torch.save archive
# (torch/serialization.py MAGIC_NUMBER).
_TORCH_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C


def _read_payload(path: str) -> dict:
    """Load either this repo's numpy pickle or a reference torch archive."""
    if zipfile.is_zipfile(path):  # torch.save zip format
        return _read_torch_payload(path)
    with open(path, "rb") as f:
        payload = pickle.load(f)  # a corrupt file raises ITS OWN error
    if isinstance(payload, dict) and "state_dict" in payload:
        return payload
    if isinstance(payload, int) and payload == _TORCH_LEGACY_MAGIC:
        # Legacy torch serialization: the first pickle frame is the
        # magic number; hand the whole file to torch.
        return _read_torch_payload(path)
    raise ValueError(
        f"{path!r} unpickles to {type(payload).__name__}, which is "
        "neither this repo's checkpoint payload (a dict with "
        "'state_dict') nor a torch archive (zip or legacy-magic "
        "pickle) — the file is not a prompt checkpoint")


def load_prompt_checkpoint(path: str) -> dict:
    payload = _read_payload(path)
    sd = payload["state_dict"]
    sd = {k.replace("upt_proj", "mvlpt_proj"): v for k, v in sd.items()}
    if is_reference_state_dict(sd):
        sd = map_reference_state_dict(sd)
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
