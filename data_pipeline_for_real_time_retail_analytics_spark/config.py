"""Layered configuration: base YAML + environment overlay + env-var
overrides.

Mirrors the reference's settings semantics (reference: tests
tests/unit/test_config.py:16-84 — base+env YAML deep-merge, environment
variables override file values). Config here is control-plane only:
pipeline specs, source params, validation thresholds. Nothing on the
data path reads it at runtime.

Env-var override convention: ``<PREFIX>__SECTION__KEY=value`` maps to
``config[section][key]`` (case-insensitive sections/keys, double
underscore as the path separator). Values parse as YAML scalars, so
``true``/``3``/``1.5`` arrive typed.
"""

from __future__ import annotations

import os
from typing import Any

import yaml


def deep_merge(base: dict[str, Any], overlay: dict[str, Any]) -> dict[str, Any]:
    """Recursive dict merge; overlay wins, nested dicts merge, lists and
    scalars replace."""
    out = dict(base)
    for k, v in overlay.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _parse_scalar(raw: str) -> Any:
    try:
        return yaml.safe_load(raw)
    except yaml.YAMLError:
        return raw


def env_overrides(prefix: str, environ: dict[str, str] | None = None) -> dict[str, Any]:
    """Collect ``PREFIX__a__b=v`` vars into a nested dict {a: {b: v}}."""
    environ = os.environ if environ is None else environ
    marker = f"{prefix}__"
    out: dict[str, Any] = {}
    for key, raw in environ.items():
        if not key.startswith(marker):
            continue
        path = [p.lower() for p in key[len(marker):].split("__") if p]
        if not path:
            continue
        node = out
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = _parse_scalar(raw)
    return out


def load_config(
    base_path: str,
    env: str | None = None,
    env_dir: str | None = None,
    prefix: str = "RETAILPIPE",
    environ: dict[str, str] | None = None,
) -> dict[str, Any]:
    """base.yaml ← env overlay (``<env_dir>/<env>.yaml``) ← env vars."""
    with open(base_path) as f:
        cfg: dict[str, Any] = yaml.safe_load(f) or {}
    if env:
        directory = env_dir or os.path.dirname(base_path)
        overlay_path = os.path.join(directory, f"{env}.yaml")
        if os.path.exists(overlay_path):
            with open(overlay_path) as f:
                cfg = deep_merge(cfg, yaml.safe_load(f) or {})
    return deep_merge(cfg, env_overrides(prefix, environ))
