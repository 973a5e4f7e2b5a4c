"""Layered YAML configuration loading (L6).

Rebuild of the reference's config system (`ov_core::YamlParser`,
opencv_yaml_parse.h + the 9 option structs' load(), SURVEY.md 2.6): a master
`config.yaml` may point at per-domain files

    config.yaml:
        config_files: [config_estimator.yaml, config_camera.yaml, ...]

whose keys map onto the `Options` dataclass tree with dotted paths
(`est.clone_freq`, `est.cam.n_pts`, ...).  Unknown keys are collected and
reported (the reference hard-exits on unparsed keys, run_bag.cpp:168-171;
we raise by default with `strict=True`).
"""

from __future__ import annotations

import dataclasses
import os

from .options import Options


def _parse_scalar(s):
    if isinstance(s, (int, float, bool, list)):
        return s
    t = str(s).strip()
    if t.lower() in ("true", "false"):
        return t.lower() == "true"
    try:
        return int(t)
    except ValueError:
        pass
    try:
        return float(t)
    except ValueError:
        pass
    if t.startswith("[") and t.endswith("]"):
        inner = t[1:-1].strip()
        return [_parse_scalar(x) for x in inner.split(",")] if inner else []
    return t


def _load_yaml(path):
    """Minimal YAML subset loader (mappings, nested via indentation, inline
    lists) — enough for the reference-style config files; uses PyYAML when
    available."""
    try:
        import yaml  # available in the baked image

        with open(path) as f:
            return yaml.safe_load(f) or {}
    except ImportError:
        pass
    out = {}
    stack = [(-1, out)]
    with open(path) as f:
        for raw in f:
            line = raw.split("#", 1)[0].rstrip()
            if not line.strip():
                continue
            indent = len(line) - len(line.lstrip())
            key, _, val = line.strip().partition(":")
            while stack and indent <= stack[-1][0]:
                stack.pop()
            parent = stack[-1][1]
            if val.strip():
                parent[key] = _parse_scalar(val)
            else:
                child = {}
                parent[key] = child
                stack.append((indent, child))
    return out


def _apply(obj, data, prefix, unknown):
    for key, val in data.items():
        if not hasattr(obj, key):
            unknown.append(f"{prefix}{key}")
            continue
        cur = getattr(obj, key)
        if dataclasses.is_dataclass(cur) and isinstance(val, dict):
            _apply(cur, val, f"{prefix}{key}.", unknown)
        else:
            setattr(obj, key, _parse_scalar(val))


def load_options(path: str, strict: bool = True,
                 base: Options | None = None) -> Options:
    """Load an Options tree from a master YAML (+ its config_files).

    `base` (mutated in place when given) supplies pre-YAML defaults — e.g. a
    driver's dataset-appropriate settings — which any key the YAML actually
    sets overrides.  This is the reference's precedence (struct defaults →
    YAML → ROS param override, opencv_yaml_parse.h); the round-2 driver had
    it backwards (run_kaist.py clobbered YAML values after loading)."""
    opts = Options() if base is None else base
    data = _load_yaml(path)
    base = os.path.dirname(os.path.abspath(path))
    files = data.pop("config_files", [])
    unknown: list[str] = []
    _apply(opts, data, "", unknown)
    for rel in files:
        sub = _load_yaml(os.path.join(base, rel))
        _apply(opts, sub, f"{rel}:", unknown)
    if unknown and strict:
        raise ValueError(f"unparsed config keys: {unknown}")
    return opts
