"""YAML config loading with attribute access.

Parity target: ccsd/src/parsers/config.py:15-45 — same YAML schema and field
names as the reference's `config/*.yaml`, so reference configs port verbatim
(this repo vendors compatible configs under ./config).  EasyDict is replaced
by a small recursive AttrDict (easydict is not available here).
"""

from __future__ import annotations

import os
from typing import Any

import yaml


class AttrDict(dict):
    """dict with attribute access, recursively applied."""

    def __init__(self, d: dict | None = None, **kwargs):
        super().__init__()
        d = dict(d or {}, **kwargs)
        for k, v in d.items():
            self[k] = self._wrap(v)

    @classmethod
    def _wrap(cls, v: Any) -> Any:
        if isinstance(v, dict):
            return cls(v)
        if isinstance(v, (list, tuple)):
            return type(v)(cls._wrap(x) for x in v)
        return v

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = self._wrap(v)

    def to_dict(self) -> dict:
        def unwrap(v):
            if isinstance(v, AttrDict):
                return {k: unwrap(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return type(v)(unwrap(x) for x in v)
            return v

        return {k: unwrap(v) for k, v in self.items()}


def get_config(config_name: str, seed: int, folder: str = "./") -> AttrDict:
    """Load config/<name>.yaml and inject the seed.  (config.py:15-31)"""
    path = os.path.join(folder, "config", f"{config_name}.yaml")
    with open(path) as f:
        config = AttrDict(yaml.safe_load(f))
    config.config_name = config_name
    config.seed = seed
    config.folder = folder
    return config


def get_general_config(folder: str = "./") -> AttrDict:
    """Load config/general_config.yaml.  (config.py:33-45)"""
    path = os.path.join(folder, "config", "general_config.yaml")
    with open(path) as f:
        return AttrDict(yaml.safe_load(f))
