"""Deep config merge (F8) — the reference merges artifact/config dicts with
``deepmerge.always_merger`` (utils.py:34-35; goldens tests/test_unit.py:97-117):
dicts merge recursively, lists concatenate, scalars overwrite (right wins).
Driver-side only (config/artifact plumbing, not a data-plane op)."""

from __future__ import annotations

from typing import Any


def deep_merge(base: Any, nxt: Any) -> Any:
    """Merge ``nxt`` into ``base`` (returns a new object; inputs untouched)."""
    if isinstance(base, dict) and isinstance(nxt, dict):
        out = dict(base)
        for k, v in nxt.items():
            out[k] = deep_merge(out[k], v) if k in out else v
        return out
    if isinstance(base, list) and isinstance(nxt, list):
        return list(base) + list(nxt)
    return nxt
