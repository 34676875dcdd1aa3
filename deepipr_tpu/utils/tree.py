"""Pytree path utilities: flatten nested variable dicts to '/'-joined paths."""

from __future__ import annotations

from typing import Any, Callable, Dict


def flatten_paths(tree: Any, is_leaf: Callable[[Any], bool] = None) -> Dict[str, Any]:
    """{'a': {'b': x}} -> {'a/b': x}. Leaves are non-dict nodes (or is_leaf)."""
    out: Dict[str, Any] = {}

    def walk(node, path):
        if (is_leaf and is_leaf(node)) or not isinstance(node, dict):
            out["/".join(path)] = node
            return
        for k, v in node.items():
            walk(v, path + [k])

    walk(tree, [])
    return out


def unflatten_paths(flat: Dict[str, Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def update_path(tree: Dict, path: str, value: Any) -> Dict:
    """Functionally replace tree[path] (path '/'-joined); returns a new tree."""
    parts = path.split("/")

    def rec(node, i):
        node = dict(node)
        if i == len(parts) - 1:
            node[parts[i]] = value
        else:
            node[parts[i]] = rec(node[parts[i]], i + 1)
        return node

    return rec(tree, 0)


def get_path(tree: Dict, path: str) -> Any:
    node = tree
    for p in path.split("/"):
        node = node[p]
    return node
