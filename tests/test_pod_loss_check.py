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


@pytest.mark.parametrize("mesh,kernels", [("8,1", False), ("4,2", False),
                                          ("2,4", False), ("4,2", True)])
def test_pod_loss_check(monkeypatch, mesh, kernels):
    mod = _load()
    argv = ["pod_loss_check.py", "--mesh", mesh, "--steps", "3"]
    if kernels:
        argv.append("--kernels")
    monkeypatch.setattr(sys, "argv", argv)
    mod.main()  # raises SystemExit on failure
