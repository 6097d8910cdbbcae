"""scripts/pod_loss_check.py rehearsal (the pod runbook's
execute-and-compare loss checkpoint) on the virtual 8-device mesh."""

import importlib.util
import os
import sys

import pytest


pytestmark = pytest.mark.slow  # heavy: deselected by default, run with -m ""

_PATH = os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "pod_loss_check.py")


def _load():
    spec = importlib.util.spec_from_file_location("pod_loss_check", _PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("mesh,kernels,eval_leg", [
    ("8,1", False, False), ("4,2", False, False), ("2,4", False, False),
    ("4,2", True, True), ("8,1", False, True)])
def test_pod_loss_check(monkeypatch, mesh, kernels, eval_leg):
    mod = _load()
    argv = ["pod_loss_check.py", "--mesh", mesh, "--steps", "3"]
    if kernels:
        argv.append("--kernels")
    if eval_leg:  # the cached-text + no-grad eval fast path, mesh vs single
        argv.append("--eval")
    monkeypatch.setattr(sys, "argv", argv)
    mod.main()  # raises SystemExit on failure
