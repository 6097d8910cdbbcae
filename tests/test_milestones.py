"""Milestone runbook (scripts/milestones.py): preflight + table writing."""

import importlib.util
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "milestones.py")


def _load():
    spec = importlib.util.spec_from_file_location("milestones", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_dry_run_emits_reference_workflow():
    env = dict(os.environ, PYTHONPATH=REPO + ":" + os.environ.get("PYTHONPATH", ""))
    r = subprocess.run(
        [sys.executable, SCRIPT, "--coop-root", "/tmp", "--elevater-root",
         "/tmp", "--dry-run", "--seeds", "1", "--only", "1,2,4,5",
         "--elevater-tasks", "cifar-10"],
        capture_output=True, text=True, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr
    out = r.stdout
    # 1: zero-shot; 2: CoOp nctx16; 4: 11-task UPT; 5: avg_ckpt+transfer+lpclip
    assert "--trainer ZeroshotCLIP" in out and "Caltech101" in out
    assert "--trainer CoOp" in out and "TRAINER.COOP.N_CTX 16" in out
    assert out.count("ImageNet,Caltech101") == 1 and "--multi-task" in out
    assert "avg_ckpt" in out and "--model-dir" in out
    assert "extract-features" in out and "--backbone RN50" in out
    assert "probe" in out


def test_preflight_fails_loudly_without_weights(tmp_path, monkeypatch):
    monkeypatch.delenv("MVLPT_TPU_RANDOM_CLIP", raising=False)
    monkeypatch.delenv("MVLPT_TPU_CLIP_CKPT", raising=False)
    monkeypatch.setenv("HOME", str(tmp_path))  # empty ~/.cache/clip
    mod = _load()
    import pytest

    with pytest.raises(SystemExit) as e:
        mod.preflight_weights({"ViT-B/32"})
    assert "curl" in str(e.value) and "ViT-B/32" in str(e.value)


def test_write_baseline_updates_marker_table(tmp_path, monkeypatch):
    mod = _load()
    baseline = tmp_path / "BASELINE.md"
    baseline.write_text(
        "# B\n\n" + mod.BEGIN +
        "\n\n| # | Milestone (BASELINE.json) | Measured |\n|---|---|---|\n"
        "| 1 | zero-shot ViT-B/32 Caltech101 | old-1 |\n"
        "| 2 | CoOp 16-shot oxford_pets ViT-B/32 | — |\n\n" + mod.END +
        "\ntail\n")
    monkeypatch.setattr(mod, "REPO", str(tmp_path))
    mod.write_baseline({2: "accuracy 89.1 ± 0.3 (n=3)"}, dry=False)
    text = baseline.read_text()
    assert "| 2 | CoOp 16-shot oxford_pets ViT-B/32 | accuracy 89.1" in text
    assert "| 1 | zero-shot ViT-B/32 Caltech101 | old-1 |" in text  # preserved
    assert text.count(mod.BEGIN) == 1 and text.endswith("tail\n")
