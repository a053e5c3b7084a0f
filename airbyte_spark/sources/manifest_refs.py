"""Manifest ``$ref`` / ``#/...`` reference resolution.

Reference parity (rosecape/airbyte `airbyte-cdk/python/airbyte_cdk/sources/
declarative/parsers/manifest_reference_resolver.py:13-202`): real catalog
manifests factor shared component config under ``definitions:`` and pull
it in by reference — a connector manifest copied from the wild fails
immediately without this. Semantics implemented from scratch against the
reference's documented contract:

- a STRING value ``"#/path/to/value"`` dereferences to the value at that
  manifest path;
- a dict containing ``$ref: "#/..."`` splats the referenced dict UNDER the
  node's own keys — sibling keys take precedence (the "enhance a shared
  definition" form); a ``$ref`` to a non-dict simply replaces the node;
- paths are ambiguous because keys may contain ``/``: resolution first
  tries the whole remaining path as ONE key at the current level, then
  peels the first component and descends (the reference's documented
  disambiguation, `_read_ref_value`); integer components index lists;
- references can chain (a ref to a ref) and nest (refs inside referenced
  values resolve too); a reference CYCLE raises instead of recursing
  forever; an unresolvable path raises with the path named.

Pure manifest-shape preprocessing — no Spark, applied once by
``ManifestSource`` before validation/interpolation.
"""

from __future__ import annotations

import re
from typing import Any

REF_TAG = "$ref"


class CircularReferenceError(ValueError):
    def __init__(self, ref: str):
        super().__init__(f"circular manifest reference: {ref!r}")


class UndefinedReferenceError(ValueError):
    def __init__(self, ref: str):
        super().__init__(f"undefined manifest reference: {ref!r}")


def _is_ref(node: Any) -> bool:
    return isinstance(node, str) and node.startswith("#/")


def _next_component(path: str) -> tuple[str | int, str]:
    """Split off the first path component (int components index lists)."""
    m = re.match(r"([^/]*)/?(.*)", path)
    first, rest = m.groups()
    try:
        return int(first), rest
    except ValueError:
        return first, rest


def _read_path(path: str, node: Any) -> Any:
    """Greedy-prefix lookup: try the whole remaining path as one key at
    the current level, else peel one component and descend."""
    while path:
        try:
            return node[path]
        except (KeyError, TypeError, IndexError):
            head, path = _next_component(path)
            node = node[head]
    return node


def _lookup(ref: str, manifest: dict) -> Any:
    path = ref[2:]  # strip "#/"
    if not path:
        raise UndefinedReferenceError(ref)
    try:
        return _read_path(path, manifest)
    except (AttributeError, KeyError, IndexError, TypeError):
        raise UndefinedReferenceError(ref) from None


def _evaluate(node: Any, manifest: dict, visited: set[str]) -> Any:
    if isinstance(node, dict):
        evaluated = {
            k: _evaluate(v, manifest, visited)
            for k, v in node.items()
            if k != REF_TAG
        }
        if REF_TAG in node:
            target = _evaluate(node[REF_TAG], manifest, visited)
            if not isinstance(target, dict):
                return target
            # the node's own keys take precedence over the referenced ones
            return {**target, **evaluated}
        return evaluated
    if isinstance(node, list):
        return [_evaluate(v, manifest, visited) for v in node]
    if _is_ref(node):
        if node in visited:
            raise CircularReferenceError(node)
        visited.add(node)
        try:
            return _evaluate(_lookup(node, manifest), manifest, visited)
        finally:
            visited.discard(node)
    return node


def resolve_references(manifest: dict) -> dict:
    """Dereference every ``$ref`` / ``"#/..."`` in the manifest against the
    manifest itself (definitions usually live under a ``definitions:`` key,
    but any path works — the reference resolves against the whole doc)."""
    return _evaluate(manifest, manifest, set())
