"""Import the reference implementation (/root/reference) for parity tests.

The reference's model code is pure torch, but its modules import heavy or
absent dependencies at module scope (dassl, torchvision, the
vision_benchmark data stack). This loader installs minimal stub modules
in ``sys.modules`` so that ``clip.model`` (clip/model.py) and
``trainers.mvlpt`` (trainers/mvlpt.py) import and their model classes —
CLIP, MultitaskVLPromptLearner, CustomCLIP — run unmodified on CPU.

Only the *model* halves are exercised; the dassl trainer/data plumbing
the stubs replace is never called.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"

_cache: dict = {}


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    # Wire into the parent package so `from parent import child` works.
    if "." in name:
        parent_name, child = name.rsplit(".", 1)
        parent = sys.modules.get(parent_name) or _stub(parent_name)
        setattr(parent, child, mod)
    return mod


def _install_stubs():
    class _Registry:
        def register(self, *a, **kw):
            def deco(cls):
                return cls
            return deco

    class _TrainerX:
        pass

    class _DataManager:
        pass

    _noop = lambda *a, **kw: None  # noqa: E731

    # ftfy only normalizes mojibake (simple_tokenizer.py:51); identity is
    # exact for the ASCII classnames/prompts used in parity tests.
    _stub("ftfy", fix_text=lambda s: s)
    _stub("torchvision")
    _stub(
        "torchvision.transforms",
        Compose=_noop, Resize=_noop, CenterCrop=_noop, ToTensor=_noop,
        Normalize=_noop,
        InterpolationMode=types.SimpleNamespace(BICUBIC="bicubic"),
    )
    _stub("dassl")
    _stub("dassl.engine", TRAINER_REGISTRY=_Registry(), TrainerX=_TrainerX)
    _stub("dassl.metrics", compute_accuracy=_noop)
    _stub("dassl.utils", load_pretrained_weights=_noop, load_checkpoint=_noop)
    _stub("dassl.optim", build_optimizer=_noop, build_lr_scheduler=_noop)
    _stub("dassl.data", DataManager=_DataManager)
    _stub("dassl.data.data_manager", build_data_loader=_noop)
    _stub("dassl.data.datasets", build_dataset=_noop)
    _stub("dassl.data.samplers", build_sampler=_noop)
    _stub("dassl.data.transforms", INTERPOLATION_MODES={}, build_transform=_noop)
    _stub(
        "trainers.vision_benchmark.evaluation",
        construct_dataloader=_noop, construct_multitask_dataset=_noop,
    )
    # `trainers` must still resolve its real submodules (trainers/mvlpt.py)
    # while the vision_benchmark subtree stays stubbed.
    sys.modules["trainers"].__path__ = [REFERENCE_ROOT + "/trainers"]
    _stub(
        "trainers.vision_benchmark.datasets",
        class_map_metric={}, get_metric=_noop, class_map={},
    )


def load_reference():
    """Returns (clip_model_module, clip_module, mvlpt_module)."""
    if "modules" in _cache:
        return _cache["modules"]

    _install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    import importlib

    clip_model = importlib.import_module("clip.model")
    clip_pkg = importlib.import_module("clip.clip")
    # `trainers` itself is a real (empty) package in the reference; the
    # vision_benchmark subtree stays stubbed out in sys.modules.
    mvlpt = importlib.import_module("trainers.mvlpt")

    _cache["modules"] = (clip_model, clip_pkg, mvlpt)
    return _cache["modules"]
