"""Config cascade loader.

Reproduces the reference's OmegaConf surface without the OmegaConf dependency
(`mld/config.py:35-199`): `base.yaml` -> experiment yaml -> every yaml in
`configs/<model.target>/` (module defaults) -> assets yaml, deep-merged in
that order, with `${dotted.path}` interpolation resolved against the merged
tree. Components are instantiated through an explicit registry
(`seeme_tpu/config/registry.py`) instead of import-by-string
(`instantiate_from_config`, `mld/config.py:25-32`).
"""

from __future__ import annotations

import copy
import re
from pathlib import Path
from typing import Any, Dict, Optional

import yaml

_INTERP = re.compile(r"^\$\{([^}]+)\}$")
_INTERP_INNER = re.compile(r"\$\{([^}]+)\}")


class Config(dict):
    """dict with attribute access and dotted-path lookup."""

    def __getattr__(self, k: str) -> Any:
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return v

    def __setattr__(self, k: str, v: Any) -> None:
        self[k] = v

    def select(self, path: str, default: Any = None) -> Any:
        node: Any = self
        for part in path.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node


def _wrap(obj: Any) -> Any:
    if isinstance(obj, dict):
        return Config({k: _wrap(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return [_wrap(v) for v in obj]
    return obj


def parse_dotted_overrides(pairs) -> Dict:
    """['TEST.MEAN=true', ...] -> nested override dict (yacs `opts` style,
    values parsed as yaml scalars)."""
    out: Dict = {}
    for pair in pairs or []:
        if "=" not in pair:
            raise ValueError(f"override '{pair}' is not KEY.PATH=value")
        path, raw = pair.split("=", 1)
        node = out
        parts = path.strip().split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = yaml.safe_load(raw)
    return out


def deep_merge(base: Dict, override: Dict) -> Dict:
    """Override wins; dicts merge recursively (OmegaConf.merge semantics)."""
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _resolve_node(node: Any, root: Dict) -> Any:
    if isinstance(node, str):
        m = _INTERP.match(node)
        if m:  # whole-string interpolation keeps the referenced type
            target = Config(root).select(m.group(1)) if not isinstance(root, Config) else root.select(m.group(1))
            return _resolve_node(target, root)
        if "${" in node:  # embedded interpolation -> string substitution
            def sub(mm):
                val = Config(root).select(mm.group(1))
                return str(_resolve_node(val, root))

            return _INTERP_INNER.sub(sub, node)
        return node
    if isinstance(node, dict):
        return {k: _resolve_node(v, root) for k, v in node.items()}
    if isinstance(node, list):
        return [_resolve_node(v, root) for v in node]
    return node


def resolve_interpolations(cfg: Dict) -> Config:
    root = _wrap(cfg)
    return _wrap(_resolve_node(root, root))


def load_yaml(path: str | Path) -> Dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def load_config(
    cfg_path: str | Path,
    cfg_assets: Optional[str | Path] = None,
    base_path: Optional[str | Path] = None,
    overrides: Optional[Dict] = None,
) -> Config:
    """The full cascade (`mld/config.py:142-162`)."""
    cfg_path = Path(cfg_path)
    cfg_dir = cfg_path.parent
    merged: Dict = {}

    base = Path(base_path) if base_path else cfg_dir / "base.yaml"
    if base.exists():
        merged = deep_merge(merged, load_yaml(base))
    merged = deep_merge(merged, load_yaml(cfg_path))

    # module-defaults dir selected by model.target (`get_module_config`,
    # `mld/config.py:8-14`; default target 'modules', `base.yaml:49`)
    target = merged.get("model", {}).get("target", "modules")
    module_dir = cfg_dir / target
    if module_dir.is_dir():
        module_cfg: Dict = {}
        for f in sorted(module_dir.glob("*.yaml")):
            module_cfg = deep_merge(module_cfg, load_yaml(f))
        merged["model"] = deep_merge(module_cfg, merged.get("model", {}))

    if cfg_assets is not None and Path(cfg_assets).exists():
        merged = deep_merge(merged, load_yaml(cfg_assets))
    if overrides:
        merged = deep_merge(merged, overrides)

    return resolve_interpolations(merged)


def flatten(cfg: Dict, prefix: str = "") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in cfg.items():
        key = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten(v, key))
        else:
            out[key] = v
    return out


def save_config(cfg: Dict, path: str | Path) -> None:
    def plain(o):
        if isinstance(o, dict):
            return {k: plain(v) for k, v in o.items()}
        if isinstance(o, list):
            return [plain(v) for v in o]
        return o

    with open(path, "w") as f:
        yaml.safe_dump(plain(cfg), f, sort_keys=False)
