"""YAML config I/O (ref ``Utils/Functions/yaml_utils.py``).

The reference uses ruamel round-trip parsing to preserve comments when
rewriting configs (``yaml_utils.py:4-17``) and ships bulk-migration helpers
that add/remove keys across whole config directories
(``yaml_utils.py:24-75``).  Both are reproduced; ruamel is used when
available (comment preservation), PyYAML otherwise.
"""

from __future__ import annotations

import os
from typing import Any, Sequence

try:  # pragma: no cover - environment dependent
    from ruamel.yaml import YAML

    _ruamel = YAML()
    _ruamel.preserve_quotes = True

    def load_yaml(path: str) -> Any:
        with open(path) as f:
            return _ruamel.load(f)

    def save_yaml(data: Any, path: str) -> None:
        with open(path, "w") as f:
            _ruamel.dump(data, f)

except ImportError:  # pragma: no cover
    import yaml

    def load_yaml(path: str) -> Any:
        with open(path) as f:
            return yaml.safe_load(f)

    def save_yaml(data: Any, path: str) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(data, f, sort_keys=False)


def _walk_configs(directory: str):
    for root, _, files in os.walk(directory):
        for name in files:
            if name.endswith((".yaml", ".yml")):
                yield os.path.join(root, name)


def insert_in_all_configs(
    directory: str, section_path: Sequence[str], key: str, value: Any
) -> int:
    """Add ``key: value`` under ``section_path`` in every YAML config under
    ``directory`` (ref ``yaml_utils.py:24-52``).  Returns files touched."""
    count = 0
    for path in _walk_configs(directory):
        data = load_yaml(path)
        node = data
        ok = True
        for part in section_path:
            if not isinstance(node, dict) or part not in node:
                ok = False
                break
            node = node[part]
        if ok and isinstance(node, dict):
            node[key] = value
            save_yaml(data, path)
            count += 1
    return count


def remove_from_all_configs(
    directory: str, section_path: Sequence[str], key: str
) -> int:
    """Remove ``key`` under ``section_path`` in every YAML config under
    ``directory`` (ref ``yaml_utils.py:54-75``)."""
    count = 0
    for path in _walk_configs(directory):
        data = load_yaml(path)
        node = data
        ok = True
        for part in section_path:
            if not isinstance(node, dict) or part not in node:
                ok = False
                break
            node = node[part]
        if ok and isinstance(node, dict) and key in node:
            del node[key]
            save_yaml(data, path)
            count += 1
    return count
