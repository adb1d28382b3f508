"""Configuration system.

Mirrors the reference's two-layer YAML config (reference: utils.py:14-39 and
train.py:339-354): a complete ``configs/default.yml`` schema is deep-merged
with a per-scene YAML, then wrapped for attribute access. Compatibility rules
preserved:

* nested dicts merge recursively;
* the ``test.datasets`` list-of-dicts merges entries by their ``name`` key;
  unmatched entries are cloned from the first default entry and then merged
  (reference: utils.py:26-37);
* every other value (including non-``datasets`` lists) is overwritten.

The reference's scene YAMLs are accepted unchanged.
"""

from __future__ import annotations

import copy
import os
from typing import Any, Mapping

import yaml

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
# Default schema lives at the repo root `configs/default.yml`, like the
# reference; fall back to a packaged copy so the library works from anywhere.
DEFAULT_CONFIG_PATHS = (
    os.path.join(os.getcwd(), "configs", "default.yml"),
    os.path.join(os.path.dirname(_PKG_DIR), "configs", "default.yml"),
)


class Config(dict):
    """Attribute-access dict (reference: utils.py:14-19 ``DictAsMember``).

    Unlike the reference, nested access returns a cached ``Config`` view so
    ``cfg.a.b = x`` style mutation is still discouraged; treat configs as
    read-only after load.
    """

    def __getattr__(self, name: str) -> Any:
        try:
            value = self[name]
        except KeyError as e:
            raise AttributeError(name) from e
        return value

    def __getitem__(self, name):
        value = dict.__getitem__(self, name)
        if isinstance(value, dict) and not isinstance(value, Config):
            value = Config(value)
        return value

    def __contains__(self, name: object) -> bool:  # `'key' in cfg`
        return dict.__contains__(self, name)

    def get_path(self, dotted: str, default: Any = None) -> Any:
        """Fetch ``a.b.c`` style paths, returning ``default`` when missing."""
        node: Any = self
        for part in dotted.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node


def merge_config(base: dict, override: Mapping[str, Any]) -> dict:
    """In-place deep merge with the reference's exact semantics.

    Reference: utils.py:22-39 (``update_dict``). Notably a list under the key
    ``datasets`` is merged element-wise by ``name``; new names are cloned from
    ``base['datasets'][0]`` before merging, so partial entries inherit
    defaults.
    """
    for key, value in override.items():
        if isinstance(value, dict) and isinstance(base.get(key), dict):
            merge_config(base[key], value)
        elif isinstance(value, list) and key == "datasets" and isinstance(base.get(key), list):
            for entry in value:
                name = entry["name"]
                for existing in base[key]:
                    if existing.get("name") == name:
                        existing.update(entry)
                        break
                else:
                    new_entry = copy.deepcopy(base[key][0])
                    merge_config(new_entry, entry)
                    base[key].append(new_entry)
        else:
            base[key] = value
    return base


def _find_default_config() -> str:
    for p in DEFAULT_CONFIG_PATHS:
        if os.path.exists(p):
            return p
    raise FileNotFoundError(
        "configs/default.yml not found; searched: %s" % (DEFAULT_CONFIG_PATHS,))


def load_config(scene_path: str | None = None,
                default_path: str | None = None,
                overrides: Mapping[str, Any] | None = None) -> Config:
    """Load default.yml, merge the scene YAML, and wrap.

    Matches train.py:339-354 / test.py:344-357 bootstrap behavior.
    """
    with open(default_path or _find_default_config(), "r") as f:
        cfg = yaml.safe_load(f)
    if scene_path:
        with open(scene_path, "r") as f:
            scene = yaml.safe_load(f)
        merge_config(cfg, scene or {})
    if overrides:
        merge_config(cfg, overrides)
    return Config(cfg)


def make_eval_config(train_cfg: Config) -> Config:
    """Derive the eval-time config: ``dataset`` updated from ``eval.dataset``.

    Reference: train.py:351-352.
    """
    cfg = copy.deepcopy(dict(train_cfg))
    cfg["dataset"] = dict(cfg["dataset"])
    cfg["dataset"].update(cfg["eval"]["dataset"])
    return Config(cfg)


def make_test_config(cfg: Config, dataset_entry: Mapping[str, Any]) -> Config:
    """Derive a per-test-dataset config (reference: test.py:371-376)."""
    out = copy.deepcopy(dict(cfg))
    out["dataset"] = dict(out["dataset"])
    out["dataset"].update(dataset_entry)
    return Config(out)
