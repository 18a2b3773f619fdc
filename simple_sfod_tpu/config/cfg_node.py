"""Minimal yacs-style config node.

The reference layers detectron2's CfgNode: defaults -> add_config ->
YAML merge -> CLI --opts -> freeze (/root/reference/train_net.py:34-42).
This is a dependency-free reimplementation of the subset of yacs behaviour
those flows use, so the reference's YAML files parse unchanged.
"""

from __future__ import annotations

import ast
import copy
from typing import Any, List

import yaml


class CfgNode(dict):
    IMMUTABLE = "__immutable__"

    def __init__(self, init_dict=None):
        super().__init__()
        object.__setattr__(self, CfgNode.IMMUTABLE, False)
        init_dict = init_dict or {}
        for k, v in init_dict.items():
            self[k] = CfgNode(v) if isinstance(v, dict) else v

    # attribute access ------------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        if name in self:
            return self[name]
        raise AttributeError(f"config key not found: {name}")

    def __setattr__(self, name: str, value: Any) -> None:
        if object.__getattribute__(self, CfgNode.IMMUTABLE):
            raise AttributeError(f"config is frozen; cannot set {name}")
        self[name] = CfgNode(value) if isinstance(value, dict) and not isinstance(value, CfgNode) else value

    # freeze ------------------------------------------------------------------
    def freeze(self):
        object.__setattr__(self, CfgNode.IMMUTABLE, True)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.freeze()

    def defrost(self):
        object.__setattr__(self, CfgNode.IMMUTABLE, False)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.defrost()

    def clone(self) -> "CfgNode":
        return copy.deepcopy(self)

    # merging -----------------------------------------------------------------
    @staticmethod
    def _decode(value: Any, old: Any) -> Any:
        """Coerce YAML/CLI values toward the default's type (yacs behaviour:
        python-literal strings like '("a",)' eval'd, lists <-> tuples,
        int -> float)."""
        if isinstance(value, str) and not isinstance(old, str):
            try:
                value = ast.literal_eval(value)
            except (ValueError, SyntaxError):
                pass
        if isinstance(old, tuple) and isinstance(value, list):
            return tuple(value)
        if isinstance(old, float) and isinstance(value, int):
            return float(value)
        return value

    def _merge_dict(self, d: dict, allow_new: bool = False, path: str = ""):
        for k, v in d.items():
            full = f"{path}.{k}" if path else k
            if k not in self:
                if not allow_new:
                    raise KeyError(f"non-existent config key: {full}")
                self[k] = CfgNode(v) if isinstance(v, dict) else v
                continue
            if isinstance(v, dict) and isinstance(self[k], CfgNode):
                self[k]._merge_dict(v, allow_new, full)
            else:
                self[k] = self._decode(v, self[k])

    def merge_from_file(self, path: str, allow_new: bool = False):
        with open(path) as f:
            data = yaml.safe_load(f) or {}
        base = data.pop("_BASE_", None)
        if base:
            import os

            if not base.startswith("/"):
                base = os.path.join(os.path.dirname(path), base)
            self.merge_from_file(base, allow_new)
        self._merge_dict(data, allow_new)

    def merge_from_list(self, opts: List[str]):
        assert len(opts) % 2 == 0, f"--opts must be key value pairs, got {opts}"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            leaf = parts[-1]
            if leaf not in node:
                raise KeyError(f"non-existent config key: {key}")
            try:
                parsed = ast.literal_eval(value)
            except (ValueError, SyntaxError):
                parsed = value
            node[leaf] = self._decode(parsed, node[leaf])

    def dump(self) -> str:
        def plain(n):
            return {k: plain(v) if isinstance(v, CfgNode) else (list(v) if isinstance(v, tuple) else v) for k, v in n.items()}

        return yaml.safe_dump(plain(self), sort_keys=True)
