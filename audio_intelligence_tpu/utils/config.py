"""Config system covering the reference's three idioms (SURVEY.md §5):

1. A2SB — YAML with ``class_path``/``init_args`` object instantiation
   (Lightning-CLI style, incl. transform pipelines as config lists).
2. ETTA — JSON model/dataset configs + dot-path ``--params a.b.c=1``
   overrides on an attribute-dict (vendored addict semantics).
3. UALM — YAML job configs + the data-specifier mini-language
   ``task:name[:json][:factor]`` (dataloader/iterator.py:335-391).
"""

from __future__ import annotations

import importlib
import json
import os
from typing import Any


class AttrDict(dict):
    """dict with attribute access, recursive (addict.Dict subset)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        for k, v in list(self.items()):
            self[k] = self._wrap(v)

    @classmethod
    def _wrap(cls, v):
        if isinstance(v, dict) and not isinstance(v, AttrDict):
            return cls(v)
        if isinstance(v, list):
            return [cls._wrap(x) for x in v]
        return v

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = self._wrap(value)


def _parse_value(s: str):
    for caster in (int, float):
        try:
            return caster(s)
        except ValueError:
            pass
    if s.lower() in ("true", "false"):
        return s.lower() == "true"
    if s.startswith(("[", "{")):
        return json.loads(s)
    return s


def update_params(config: AttrDict, overrides: list[str]) -> AttrDict:
    """Apply ``a.b.c=value`` dot-path overrides (ETTA --params,
    utils/addict.py update_params)."""
    for item in overrides:
        path, _, raw = item.partition("=")
        keys = path.split(".")
        node = config
        for k in keys[:-1]:
            if k not in node or not isinstance(node[k], dict):
                node[k] = AttrDict()
            node = node[k]
        node[keys[-1]] = _parse_value(raw)
    return config


def instantiate_from_spec(spec: Any):
    """Instantiate ``{class_path: ..., init_args: {...}}`` recursively
    (A2SB audio_transforms/transforms.py:26-52 semantics). Non-dict values
    pass through; callables become partials when not classes."""
    import functools
    import inspect

    if isinstance(spec, list):
        return [instantiate_from_spec(s) for s in spec]
    if not isinstance(spec, dict) or "class_path" not in spec:
        return spec
    target = spec["class_path"]
    mod, _, name = target.rpartition(".")
    obj = getattr(importlib.import_module(mod), name)
    kwargs = {
        k: instantiate_from_spec(v) for k, v in spec.get("init_args", {}).items()
    }
    if inspect.isclass(obj):
        return obj(**kwargs)
    if callable(obj):
        return functools.partial(obj, **kwargs)
    raise TypeError(f"{target} is neither class nor callable")


def parse_data_specifier(spec: str) -> dict:
    """``task:name[:json][:factor]`` → dict (UALM iterator.py:335-391).

    The optional 3rd field is a manifest path; the optional trailing
    numeric field is a resampling factor.
    """
    parts = spec.split(":")
    if len(parts) < 2:
        raise ValueError(f"bad data specifier {spec!r}")
    out = {"task": parts[0], "name": parts[1], "json": None, "factor": 1.0}
    rest = parts[2:]
    if rest:
        try:
            out["factor"] = float(rest[-1])
            rest = rest[:-1]
        except ValueError:
            pass
    if rest:
        out["json"] = ":".join(rest)
    return out


def load_config(path: str) -> AttrDict:
    """Load YAML or JSON into an AttrDict."""
    with open(path) as f:
        if path.endswith((".yaml", ".yml")):
            import yaml

            return AttrDict(yaml.safe_load(f))
        return AttrDict(json.load(f))
