"""Hierarchical config system (yacs-compatible surface, zero deps).

The reference stacks yacs configs: Dassl ``get_cfg_default`` extended by
``extend_cfg`` (/root/reference/train.py:105-169) and merged in the order
dataset-yaml < trainer-yaml < CLI flags < opts list
(/root/reference/train.py:171-191). We reimplement the small subset of
yacs semantics that stack needs (attribute access, yaml merge, dotted-key
list merge, freeze/clone) so reference-style yaml files and
``KEY.SUBKEY value`` override lists work unchanged.
"""

from __future__ import annotations

import copy
import ast

import yaml


class CfgNode(dict):
    """A dict with attribute access, freezing, and recursive merging."""

    _FROZEN = "__frozen__"

    def __init__(self, init_dict=None):
        super().__init__()
        object.__setattr__(self, CfgNode._FROZEN, False)
        if init_dict:
            for k, v in init_dict.items():
                self[k] = CfgNode(v) if isinstance(v, dict) else v

    # -- attribute protocol ------------------------------------------------
    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        if getattr(self, CfgNode._FROZEN):
            raise AttributeError(f"Cannot set {name}: CfgNode is frozen")
        self[name] = value

    def __setitem__(self, key, value):
        # enforced here (not just __setattr__) so merge_from_file /
        # merge_from_list / _merge_into also raise on a frozen config,
        # matching yacs ("Attempted to set ... immutable")
        if getattr(self, CfgNode._FROZEN, False):
            raise AttributeError(f"Cannot set {key}: CfgNode is frozen")
        super().__setitem__(key, value)

    # -- freezing ----------------------------------------------------------
    def freeze(self):
        object.__setattr__(self, CfgNode._FROZEN, True)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.freeze()

    def defrost(self):
        object.__setattr__(self, CfgNode._FROZEN, False)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.defrost()

    def is_frozen(self):
        return getattr(self, CfgNode._FROZEN)

    def clone(self):
        return copy.deepcopy(self)

    def __deepcopy__(self, memo):
        out = CfgNode()
        for k, v in self.items():
            out[k] = copy.deepcopy(v, memo)
        return out

    # -- merging -----------------------------------------------------------
    def merge_from_other_cfg(self, other: "CfgNode"):
        _merge_into(other, self)

    def merge_from_file(self, path: str):
        with open(path) as f:
            loaded = yaml.safe_load(f)
        if loaded:
            _merge_into(CfgNode(loaded), self, strict=True)

    def merge_from_list(self, opts):
        if not opts:
            return
        assert len(opts) % 2 == 0, f"Override list must be key/value pairs, got {opts}"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                if p not in node:
                    raise KeyError(f"Non-existent config key: {key}")
                node = node[p]
            leaf = parts[-1]
            if leaf not in node:
                raise KeyError(f"Non-existent config key: {key}")
            node[leaf] = _coerce(value, node[leaf])

    def dump(self) -> str:
        return yaml.safe_dump(_to_plain(self), sort_keys=False)


def _to_plain(node):
    if isinstance(node, CfgNode):
        return {k: _to_plain(v) for k, v in node.items()}
    return node


def _merge_into(src: CfgNode, dst: CfgNode, strict: bool = False,
                prefix: str = ""):
    for k, v in src.items():
        if strict and k not in dst:
            # yacs raises on non-existent keys so yaml typos fail loudly
            raise KeyError(f"Non-existent config key: {prefix}{k}")
        if isinstance(v, (CfgNode, dict)) and isinstance(dst.get(k), CfgNode):
            _merge_into(CfgNode(v) if not isinstance(v, CfgNode) else v,
                        dst[k], strict=strict, prefix=f"{prefix}{k}.")
        else:
            dst[k] = _coerce(v, dst.get(k))


def _coerce(value, old):
    """Coerce a yaml/CLI value to the type of the existing default."""
    if isinstance(value, str):
        # yacs-style: strings that parse as python literals become them,
        # so `INPUT.SIZE "(224, 224)"` and `OPTIM.LR 2e-3` both work.
        try:
            value = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            pass
    if old is None or value is None:
        return value
    if isinstance(old, bool) and isinstance(value, str):
        return value.lower() in ("true", "1", "yes")
    if isinstance(old, tuple) and isinstance(value, list):
        return tuple(value)
    if isinstance(old, float) and isinstance(value, int):
        return float(value)
    return value
