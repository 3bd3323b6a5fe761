"""Typed-ish config system.

The reference uses two incompatible styles — raw YAML dicts with ad-hoc
``config[...]`` access (SUN-M family, e.g. ``sun_train_teacher/train_classifier.py:287-291``)
and a 35-flag argparse namespace (SUN-D, ``meta_tuning_sun_d/train_meta.py:17-66``).
This module unifies both: a YAML (or dict) is parsed into a ``Config`` with
attribute access, defaults, dotted-path lookup, and an explicit snapshot dump, so
every phase of the pipeline is "a config over one engine".
"""

from __future__ import annotations

import copy
import json
from typing import Any, Dict, Iterator, Mapping, Optional

import yaml


class Config(Mapping):
    """Immutable-ish nested dict with attribute + dotted access and defaults."""

    def __init__(self, data: Optional[Dict[str, Any]] = None):
        object.__setattr__(self, "_data", dict(data or {}))

    # --- mapping protocol -------------------------------------------------
    def __getitem__(self, key: str) -> Any:
        return self._wrap(self._data[key])

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)

    def __contains__(self, key: object) -> bool:
        return key in self._data

    # --- attribute & dotted access ----------------------------------------
    def __getattr__(self, key: str) -> Any:
        try:
            return self._wrap(self._data[key])
        except KeyError as e:
            raise AttributeError(key) from e

    def get(self, key: str, default: Any = None) -> Any:
        """Dotted-path get: ``cfg.get('model_args.encoder', 'visformer_micro_80')``."""
        node: Any = self._data
        for part in key.split("."):
            if isinstance(node, Config):
                node = node._data
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return self._wrap(node)

    @staticmethod
    def _wrap(v: Any) -> Any:
        return Config(v) if isinstance(v, dict) else v

    # --- construction / update --------------------------------------------
    def updated(self, overrides: Dict[str, Any]) -> "Config":
        """Return a new Config with dotted-path overrides applied."""
        data = copy.deepcopy(self._data)
        for key, value in overrides.items():
            node = data
            parts = key.split(".")
            for i, p in enumerate(parts[:-1]):
                node = node.setdefault(p, {})
                if not isinstance(node, dict):
                    raise ValueError(
                        f"override {key!r} descends through "
                        f"{'.'.join(parts[: i + 1])!r}, which is the scalar "
                        f"{node!r}, not a mapping"
                    )
            node[parts[-1]] = value
        return Config(data)

    def to_dict(self) -> Dict[str, Any]:
        return copy.deepcopy(self._data)

    # --- io -----------------------------------------------------------------
    def dump_yaml(self, path: str) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self._data, f, sort_keys=False)

    def dump_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self._data, f, indent=2, default=str)

    def __repr__(self) -> str:
        return f"Config({self._data!r})"


def load_config(path: str, overrides: Optional[Dict[str, Any]] = None) -> Config:
    """Load a YAML config file, optionally applying dotted-path overrides."""
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    cfg = Config(data)
    if overrides:
        cfg = cfg.updated(overrides)
    return cfg
