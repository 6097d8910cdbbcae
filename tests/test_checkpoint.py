"""Prompt checkpoint IO: roundtrip, legacy-key rename, buffer dropping,
non-strict merge, cross-seed averaging (contracts at mvlpt.py:1090-1125
and scripts/avg_ckpt.py:21-66)."""

import numpy as np
import pytest
import jax.numpy as jnp

from mvlpt_tpu.checkpoint.prompt_io import (
    apply_state_dict, average_checkpoints, checkpoint_path, flatten_params,
    load_prompt_checkpoint, save_prompt_checkpoint, unflatten_params)


@pytest.fixture()
def params():
    return {
        "coop": {"ctx": jnp.ones((4, 8))},
        "vpt": {"embeddings": jnp.full((1, 2, 8), 2.0)},
        "mvlpt_proj": {"coop_pre": {"kernel": jnp.zeros((8, 4)),
                                    "bias": jnp.zeros((4,))}},
    }


def test_roundtrip(tmp_path, params):
    path = checkpoint_path(str(tmp_path), epoch=3)
    save_prompt_checkpoint(path, params, epoch=3, val_result=0.5)
    payload = load_prompt_checkpoint(path)
    assert payload["epoch"] == 3 and payload["val_result"] == 0.5
    restored, loaded, skipped = apply_state_dict(params, payload["state_dict"])
    assert loaded == 4 and not skipped
    np.testing.assert_array_equal(
        np.asarray(restored["coop"]["ctx"]), np.ones((4, 8)))


def test_legacy_upt_rename_and_buffer_drop(tmp_path, params):
    path = checkpoint_path(str(tmp_path))
    save_prompt_checkpoint(path, params, epoch=1)
    import pickle

    payload = pickle.load(open(path, "rb"))
    sd = payload["state_dict"]
    # simulate a legacy reference checkpoint
    sd["upt_proj.coop_pre.kernel"] = sd.pop("mvlpt_proj.coop_pre.kernel") + 7
    sd["token_prefix"] = np.zeros((2, 1, 8))
    sd["token_suffix"] = np.zeros((2, 3, 8))
    pickle.dump(payload, open(path, "wb"))

    loaded = load_prompt_checkpoint(path)
    assert "token_prefix" not in loaded["state_dict"]
    assert "mvlpt_proj.coop_pre.kernel" in loaded["state_dict"]
    restored, n, skipped = apply_state_dict(params, loaded["state_dict"])
    assert np.allclose(
        np.asarray(restored["mvlpt_proj"]["coop_pre"]["kernel"]), 7.0)


def test_nonstrict_merge_skips_mismatches(params):
    sd = flatten_params(params)
    sd["coop.ctx"] = np.zeros((9, 9))  # wrong shape
    sd["unknown.key"] = np.zeros(3)
    restored, loaded, skipped = apply_state_dict(params, sd)
    assert "coop.ctx" in skipped and "unknown.key" in skipped
    np.testing.assert_array_equal(
        np.asarray(restored["coop"]["ctx"]), np.ones((4, 8)))


def test_average_checkpoints(tmp_path, params):
    import dataclasses

    paths = []
    for seed, scale in ((1, 1.0), (2, 3.0)):
        d = str(tmp_path / f"seed{seed}")
        p = checkpoint_path(d)
        scaled = {
            "coop": {"ctx": params["coop"]["ctx"] * scale},
            "vpt": {"embeddings": params["vpt"]["embeddings"]},
        }
        save_prompt_checkpoint(p, scaled, epoch=5, val_result=scale)
        paths.append(p)
    avg = average_checkpoints(paths)
    np.testing.assert_allclose(avg["state_dict"]["coop.ctx"], 2.0)
    assert avg["val_result"] == 2.0


def test_flatten_unflatten_inverse(params):
    flat = flatten_params(params)
    tree = unflatten_params(flat)
    assert set(flatten_params(tree)) == set(flat)


def test_find_checkpoint_falls_back_to_newest_epoch(tmp_path, params):
    """--model-dir without --load-epoch on a last_step run (no
    model-best.pth.tar): find_checkpoint picks the highest-numbered
    model.pth.tar-N — what the protocol eval scripts rely on when
    LOADEP is unset."""
    from mvlpt_tpu.checkpoint.prompt_io import find_checkpoint

    d = str(tmp_path / "run")
    for ep in (3, 20, 5):
        save_prompt_checkpoint(checkpoint_path(d, ep), params, epoch=ep)
    assert find_checkpoint(d) == checkpoint_path(d, 20)
    # explicit epoch is never overridden
    assert find_checkpoint(d, 3) == checkpoint_path(d, 3)
    # once model-best exists it wins the no-epoch lookup
    save_prompt_checkpoint(checkpoint_path(d), params, epoch=20,
                           val_result=1.0)
    assert find_checkpoint(d) == checkpoint_path(d)
    # empty dir: returns the model-best path for the caller's
    # FileNotFoundError message
    assert find_checkpoint(str(tmp_path / "nope")).endswith(
        "model-best.pth.tar")


def test_corrupt_checkpoint_raises_its_own_error(tmp_path, params):
    """A truncated native checkpoint must surface the pickle failure,
    not a misleading torch-archive error; junk that unpickles to a
    non-payload raises a diagnostic ValueError."""
    import pickle

    p = tmp_path / "model.pth.tar-1"
    full = checkpoint_path(str(tmp_path / "run"), 1)
    save_prompt_checkpoint(full, params, epoch=1)
    blob = open(full, "rb").read()
    p.write_bytes(blob[: len(blob) // 2])  # truncated mid-stream
    with pytest.raises(Exception) as ei:
        load_prompt_checkpoint(str(p))
    assert "pickle" in type(ei.value).__module__ + type(ei.value).__name__ \
        or isinstance(ei.value, EOFError)

    q = tmp_path / "junk.pth.tar"
    with open(q, "wb") as f:
        pickle.dump([1, 2, 3], f)
    with pytest.raises(ValueError, match="not a prompt checkpoint"):
        load_prompt_checkpoint(str(q))


def test_ndarray_pickle_raises_diagnostic(tmp_path):
    """A pickle of a bare ndarray must hit the 'not a prompt
    checkpoint' ValueError, not numpy's ambiguous-truth error from the
    legacy-magic comparison."""
    import pickle

    p = tmp_path / "tensor.pth.tar"
    with open(p, "wb") as f:
        pickle.dump(np.ones((4, 4)), f)
    with pytest.raises(ValueError, match="not a prompt checkpoint"):
        load_prompt_checkpoint(str(p))


def test_avg_ckpt_cli_resolves_last_step_dirs(tmp_path, monkeypatch):
    """avg_ckpt --dirs on last_step run dirs (epoch checkpoints only,
    no model-best.pth.tar): find_checkpoint resolution kicks in."""
    import sys

    from mvlpt_tpu.cli.avg_ckpt import cli as avg_cli

    dirs = []
    for seed, scale in ((1, 1.0), (2, 3.0)):
        d = str(tmp_path / f"seed{seed}")
        params = {"coop": {"ctx": jnp.full((4, 8), scale)}}
        save_prompt_checkpoint(checkpoint_path(d, 2), params, epoch=2)
        dirs.append(d)
    out = str(tmp_path / "avg")
    monkeypatch.setattr(sys, "argv", [
        "avg_ckpt", "--dirs", *dirs, "--output-dir", out,
        "--format", "numpy"])
    avg_cli()
    avg = load_prompt_checkpoint(checkpoint_path(out))
    np.testing.assert_allclose(avg["state_dict"]["coop.ctx"], 2.0)
    assert avg["val_result"] is None
