"""Reference torch prompt-checkpoint interop (VERDICT r4 item 1).

The reference trainer writes ``torch.save`` archives with the learner's
torch key names (/root/reference/trainers/mvlpt.py:1090-1125,
scripts/avg_ckpt.py:58-66), and the released MCoOp/MVPT/MUPT multitask
inits ship in the same format (README.md:33). These tests round-trip
exactly that payload — ``torch.save({"state_dict": learner.state_dict(),
"epoch": ..., "val_result": ...})`` — through our product loader and
assert identical logits from both models, plus mixed-format averaging
and the ``--model-dir`` warm-start path through cli/train.py.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from test_reference_parity import (  # noqa: E402
    CLASSNAMES, MODES, _build_both, _make_cfg, ref,  # noqa: F401
)

from mvlpt_tpu.checkpoint.prompt_io import (
    apply_state_dict,
    average_checkpoints,
    export_reference_checkpoint,
    flatten_params,
    load_prompt_checkpoint,
    map_reference_state_dict,
    save_prompt_checkpoint,
    to_reference_state_dict,
)
from mvlpt_tpu.prompts.learner import init_prompt_params

pytestmark = pytest.mark.slow  # in-process reference torch model builds


def _save_ref_archive(tmp_path, learner, epoch=7, val=61.25, rename_upt=False):
    sd = learner.state_dict()
    if rename_upt:
        sd = {k.replace("mvlpt_proj", "upt_proj"): v for k, v in sd.items()}
    path = tmp_path / "prompt_learner"
    path.mkdir(parents=True, exist_ok=True)
    path = str(path / "model-best.pth.tar")
    torch.save({"state_dict": sd, "epoch": epoch, "val_result": val}, path)
    return path


# upt exercises every mapped family at once (ctx, vpt, pre/post Linears,
# the resblock coupler transformer); the others cover the remaining modes.
INTEROP_MODES = ["coop_middle", "coop_csc", "vpt_shallow_proj", "vpt_deep",
                 "upt", "cocoop"]


@pytest.mark.parametrize("mode", INTEROP_MODES)
def test_reference_archive_round_trip(ref, tmp_path, mode):
    """torch.save(reference learner) -> load here -> identical logits."""
    cfg = _make_cfg(**MODES[mode])
    ref_model, model, params, _ref_params, consts = _build_both(ref, cfg)

    path = _save_ref_archive(tmp_path, ref_model.prompt_learner)
    payload = load_prompt_checkpoint(path)
    assert payload["epoch"] == 7 and payload["val_result"] == 61.25
    # buffers must be gone and nothing reference-named may survive raw
    assert not any("token_prefix" in k or "token_suffix" in k
                   for k in payload["state_dict"])

    fresh = init_prompt_params(jax.random.PRNGKey(3), model.spec,
                               clip_params=params)
    restored, loaded, skipped = apply_state_dict(fresh, payload["state_dict"])
    assert skipped == [], f"unmapped reference keys: {skipped}"
    assert loaded == len(flatten_params(fresh))

    rng = np.random.RandomState(5)
    imgs = rng.randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want = ref_model(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model(params, restored, consts, jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_legacy_upt_proj_rename(ref, tmp_path):
    """Archives with pre-fix 'upt_proj' keys load identically
    (mvlpt.py:1112's issue-1 rename)."""
    cfg = _make_cfg(**MODES["upt"])
    ref_model, model, params, _rp, _c = _build_both(ref, cfg)
    new = load_prompt_checkpoint(
        _save_ref_archive(tmp_path / "a", ref_model.prompt_learner))
    old = load_prompt_checkpoint(
        _save_ref_archive(tmp_path / "b", ref_model.prompt_learner,
                          rename_upt=True))
    assert sorted(new["state_dict"]) == sorted(old["state_dict"])
    for k in new["state_dict"]:
        np.testing.assert_array_equal(new["state_dict"][k],
                                      old["state_dict"][k])


def test_mixed_format_averaging(ref, tmp_path):
    """cli/avg_ckpt semantics across one torch archive + one native
    checkpoint: tensor-wise mean in the mapped key space."""
    cfg = _make_cfg(**MODES["upt"])
    ref_model, model, params, ref_params, _c = _build_both(ref, cfg)
    p_torch = _save_ref_archive(tmp_path / "seed1", ref_model.prompt_learner,
                                epoch=5, val=50.0)

    bumped = jax.tree_util.tree_map(lambda x: x + 1.0, ref_params)
    p_native = str(tmp_path / "seed2" / "prompt_learner" / "model-best.pth.tar")
    save_prompt_checkpoint(p_native, bumped, epoch=5, val_result=70.0)

    avg = average_checkpoints([p_torch, p_native])
    want = flatten_params(jax.device_get(ref_params))
    assert avg["val_result"] == pytest.approx(60.0)
    for k, v in want.items():
        np.testing.assert_allclose(avg["state_dict"][k], v + 0.5,
                                   rtol=1e-5, atol=1e-6)


def test_map_handles_bare_state_dict(ref, tmp_path):
    """The released averaged inits may be re-saved as bare state_dicts;
    the loader must not require the Dassl payload wrapper."""
    cfg = _make_cfg(**MODES["coop_middle"])
    ref_model, *_ = _build_both(ref, cfg)
    path = str(tmp_path / "model-best.pth.tar")
    torch.save(ref_model.prompt_learner.state_dict(), path)
    payload = load_prompt_checkpoint(path)
    assert "coop.ctx" in payload["state_dict"]
    np.testing.assert_allclose(
        payload["state_dict"]["coop.ctx"],
        ref_model.prompt_learner.ctx.detach().float().numpy(), rtol=1e-6)


def test_fp16_archives_upcast(ref, tmp_path):
    """CLIP-native fp16 learners load as fp32 masters."""
    cfg = _make_cfg(**MODES["coop_middle"])
    ref_model, *_ = _build_both(ref, cfg)
    sd = {k: v.half() for k, v in ref_model.prompt_learner.state_dict().items()}
    path = str(tmp_path / "model.pth.tar-3")
    torch.save({"state_dict": sd, "epoch": 3, "val_result": None}, path)
    payload = load_prompt_checkpoint(path)
    assert payload["state_dict"]["coop.ctx"].dtype == np.float32


def test_map_reference_state_dict_layouts():
    """Pure mapping checks that need no reference build: Linear kernels
    transpose, resblocks stack, unknown keys pass through."""
    sd = {
        "ctx": np.arange(8, dtype=np.float32).reshape(2, 4),
        "vpt_proj.weight": np.arange(12, dtype=np.float32).reshape(3, 4),
        "vpt_proj.bias": np.zeros(3, np.float32),
        "mystery_key": np.ones(2, np.float32),
        "mvlpt_proj.resblocks.0.ln_1.weight": np.ones(4, np.float32),
        "mvlpt_proj.resblocks.0.ln_1.bias": np.zeros(4, np.float32),
        "mvlpt_proj.resblocks.0.attn.in_proj_weight": np.ones((12, 4), np.float32),
        "mvlpt_proj.resblocks.0.attn.in_proj_bias": np.zeros(12, np.float32),
        "mvlpt_proj.resblocks.0.attn.out_proj.weight": np.ones((4, 4), np.float32),
        "mvlpt_proj.resblocks.0.attn.out_proj.bias": np.zeros(4, np.float32),
        "mvlpt_proj.resblocks.0.ln_2.weight": np.ones(4, np.float32),
        "mvlpt_proj.resblocks.0.ln_2.bias": np.zeros(4, np.float32),
        "mvlpt_proj.resblocks.0.mlp.c_fc.weight": np.ones((16, 4), np.float32),
        "mvlpt_proj.resblocks.0.mlp.c_fc.bias": np.zeros(16, np.float32),
        "mvlpt_proj.resblocks.0.mlp.c_proj.weight": np.ones((4, 16), np.float32),
        "mvlpt_proj.resblocks.0.mlp.c_proj.bias": np.zeros(4, np.float32),
        "token_prefix": np.zeros((2, 1, 4), np.float32),
    }
    out = map_reference_state_dict(sd)
    np.testing.assert_array_equal(out["coop.ctx"], sd["ctx"])
    np.testing.assert_array_equal(out["vpt.proj.kernel"],
                                  sd["vpt_proj.weight"].T)
    assert out["mvlpt_proj.transformer.attn.qkv_w"].shape == (1, 4, 12)
    assert out["mvlpt_proj.transformer.mlp.fc_w"].shape == (1, 4, 16)
    assert "mystery_key" in out  # non-strict skip accounting downstream
    assert not any("token_prefix" in k for k in out)


def test_model_dir_accepts_torch_archive(tmp_path, monkeypatch):
    """--model-dir through cli/train.py on a reference-format archive:
    the warm-started ctx must equal the archive's (the flagship
    main_single_elevater_cut.sh transfer workflow)."""
    from mvlpt_tpu.cli.train import build_parser, main
    from tests.util_fixtures import make_coop_dataset
    from mvlpt_tpu.core import clip as cc

    monkeypatch.setenv("MVLPT_TPU_RANDOM_CLIP", "1")
    monkeypatch.setitem(cc.VIT_ARCHS, "ViT-B/32", dict(
        embed_dim=16, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=8))
    monkeypatch.setitem(cc._TEXT_ARCHS, 16, dict(
        transformer_width=32, transformer_heads=2, transformer_layers=2))

    make_coop_dataset(tmp_path / "data")
    src = tmp_path / "src" / "prompt_learner"
    src.mkdir(parents=True)
    ctx = torch.randn(2, 32, generator=torch.Generator().manual_seed(9))
    torch.save({"state_dict": {"ctx": ctx,
                               "token_prefix": torch.zeros(4, 1, 32),
                               "token_suffix": torch.zeros(4, 10, 32)},
                "epoch": 11, "val_result": 42.0},
               str(src / "model-best.pth.tar"))

    trainer = main(build_parser().parse_args([
        "--root", str(tmp_path / "data"), "--output-dir",
        str(tmp_path / "out"),
        "--trainer", "MVLPT", "--dataset-coop", "--dataset", "OxfordPets",
        "--seed", "1", "--shots", "1", "--eval-only",
        "--model-dir", str(tmp_path / "src"),
        "OPTIM.MAX_EPOCH", "1", "DATALOADER.TRAIN_X.BATCH_SIZE", "4",
        "DATALOADER.TEST.BATCH_SIZE", "4", "DATALOADER.NUM_WORKERS", "0",
        "INPUT.SIZE", "(32, 32)", "MODEL.BACKBONE.NAME", "ViT-B/32",
        "TRAINER.MVLPT.COOP.N_CTX", "2",
    ]))
    np.testing.assert_allclose(
        np.asarray(trainer.state.prompt_params["coop"]["ctx"]),
        ctx.numpy(), rtol=1e-6)


@pytest.mark.parametrize("mode", ["upt", "cocoop", "vpt_shallow_proj"])
def test_export_drives_reference_model(ref, tmp_path, mode):
    """The return trip: export our prompt pytree in the reference's
    torch format, load it into the in-process reference learner
    (strict=False, exactly mvlpt.py:1125), and assert both models
    produce identical logits from the transplanted weights."""
    cfg = _make_cfg(**MODES[mode])
    ref_model, model, params, ref_params, consts = _build_both(ref, cfg)

    # perturb so the test can't pass on the learner's original weights
    ours = jax.tree_util.tree_map(lambda x: x + 0.05, ref_params)
    path = str(tmp_path / "export" / "model-best.pth.tar")
    export_reference_checkpoint(path, ours, epoch=9, val_result=55.5)

    obj = torch.load(path, map_location="cpu", weights_only=False)
    assert obj["epoch"] == 9 and obj["val_result"] == 55.5
    missing, unexpected = ref_model.prompt_learner.load_state_dict(
        obj["state_dict"], strict=False)
    # only the frozen class-embedding buffers may be absent
    assert all("token_prefix" in k or "token_suffix" in k for k in missing)
    assert unexpected == []

    rng = np.random.RandomState(11)
    imgs = rng.randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want = ref_model(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model(params, ours, consts, jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_to_reference_state_dict_is_exact_inverse(ref):
    """map_reference_state_dict ∘ to_reference_state_dict == identity on
    a real all-families pytree (coop + vpt(proj) + coupler transformer
    + cocoop), and the reverse composition restores the torch names."""
    from mvlpt_tpu.prompts.learner import PromptSpec

    spec = PromptSpec(
        n_cls=4, coop_n_ctx=2, vpt_n_ctx=2, cocoop_n_ctx=2, vpt_deep=True,
        vpt_proj_dim=8, class_token_position="end",
        project_method="transformer", project_dim=16, context_length=8,
        vision_layers=2, vision_width=12, text_width=10, embed_dim=32,
        vision_patch_size=8)
    flat = flatten_params(
        jax.device_get(init_prompt_params(jax.random.PRNGKey(0), spec)))

    ref_sd = to_reference_state_dict(flat)
    assert "ctx" in ref_sd and "vpt_proj.weight" in ref_sd
    assert "mvlpt_proj.resblocks.0.attn.in_proj_weight" in ref_sd
    assert "meta_net.linear1.weight" in ref_sd
    assert not any(k.startswith(("coop.", "vpt.", "cocoop.")) for k in ref_sd)

    back = map_reference_state_dict(ref_sd)
    assert sorted(back) == sorted(flat)
    for k in flat:
        np.testing.assert_array_equal(back[k], flat[k], err_msg=k)


def test_export_ckpt_cli(ref, tmp_path, monkeypatch):
    """cli/export_ckpt on a native run dir: emits a torch archive with
    reference key names that our own loader reads back identically."""
    import sys

    from mvlpt_tpu.cli.export_ckpt import cli as export_cli

    cfg = _make_cfg(**MODES["upt"])
    _rm, _m, _p, ref_params, _c = _build_both(ref, cfg)
    run_dir = tmp_path / "run"
    save_prompt_checkpoint(
        str(run_dir / "prompt_learner" / "model-best.pth.tar"),
        ref_params, epoch=4, val_result=48.0)

    out = str(tmp_path / "for_reference.pth.tar")
    monkeypatch.setattr(sys, "argv", [
        "export_ckpt", "--input", str(run_dir), "--output", out])
    export_cli()

    obj = torch.load(out, map_location="cpu", weights_only=False)
    assert obj["epoch"] == 4 and obj["val_result"] == 48.0
    assert "ctx" in obj["state_dict"]

    reloaded = load_prompt_checkpoint(out)
    want = flatten_params(jax.device_get(ref_params))
    assert sorted(reloaded["state_dict"]) == sorted(want)
    for k, v in want.items():
        np.testing.assert_allclose(reloaded["state_dict"][k], v,
                                   rtol=1e-6, atol=1e-7, err_msg=k)


def test_avg_ckpt_cli_torch_format(ref, tmp_path, monkeypatch):
    """avg_ckpt --format torch: the averaged init lands in the
    reference's own archive format (the transfer-init workflow, but
    consumable by the reference's --model-dir directly)."""
    import sys

    from mvlpt_tpu.cli.avg_ckpt import cli as avg_cli

    cfg = _make_cfg(**MODES["upt"])
    _rm, _m, _p, ref_params, _c = _build_both(ref, cfg)
    for seed, bump in (("seed1", 0.0), ("seed2", 1.0)):
        save_prompt_checkpoint(
            str(tmp_path / seed / "prompt_learner" / "model-best.pth.tar"),
            jax.tree_util.tree_map(lambda x, b=bump: x + b, ref_params),
            epoch=5, val_result=50.0 + bump * 20)

    monkeypatch.setattr(sys, "argv", [
        "avg_ckpt", "--dirs", str(tmp_path / "seed1"), str(tmp_path / "seed2"),
        "--output-dir", str(tmp_path / "avg"), "--format", "torch"])
    avg_cli()

    out = str(tmp_path / "avg" / "prompt_learner" / "model-best.pth.tar")
    obj = torch.load(out, map_location="cpu", weights_only=False)
    assert obj["val_result"] == pytest.approx(60.0)
    payload = load_prompt_checkpoint(out)  # zip sniffing handles torch
    want = flatten_params(jax.device_get(ref_params))
    for k, v in want.items():
        np.testing.assert_allclose(payload["state_dict"][k], v + 0.5,
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_avg_ckpt_cli_mixed_formats(ref, tmp_path, monkeypatch):
    """mvlpt-avg-ckpt through argv on one reference torch archive + one
    native checkpoint: the flagship 'average the released seeds into a
    transfer init' workflow (avg_ckpt.py:21-66) on mixed formats."""
    import pickle
    import sys

    from mvlpt_tpu.cli.avg_ckpt import cli as avg_cli

    cfg = _make_cfg(**MODES["upt"])
    ref_model, _m, _p, ref_params, _c = _build_both(ref, cfg)
    _save_ref_archive(tmp_path / "seed1", ref_model.prompt_learner,
                      epoch=5, val=50.0)
    bumped = jax.tree_util.tree_map(lambda x: x + 1.0, ref_params)
    save_prompt_checkpoint(
        str(tmp_path / "seed2" / "prompt_learner" / "model-best.pth.tar"),
        bumped, epoch=5, val_result=70.0)

    monkeypatch.setattr(sys, "argv", [
        "avg_ckpt", "--dirs", str(tmp_path / "seed1"), str(tmp_path / "seed2"),
        "--output-dir", str(tmp_path / "avg")])
    avg_cli()
    with open(tmp_path / "avg" / "prompt_learner" / "model-best.pth.tar",
              "rb") as f:
        payload = pickle.load(f)
    want = flatten_params(jax.device_get(ref_params))
    assert payload["val_result"] == pytest.approx(60.0)
    assert sorted(payload["state_dict"]) == sorted(want)
    for k, v in want.items():
        np.testing.assert_allclose(payload["state_dict"][k], v + 0.5,
                                   rtol=1e-5, atol=1e-6)
