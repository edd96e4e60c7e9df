"""Aggregates all registered catalog queries (imports populate REGISTRY)."""

from __future__ import annotations

from . import extended, relational  # noqa: F401
from .registry import REGISTRY, CatalogQuery

try:  # text/dedup/similarity ops (added incrementally)
    from . import corpus, textops  # noqa: F401
except ImportError:
    pass


def get_catalog() -> dict[str, CatalogQuery]:
    return dict(REGISTRY)
