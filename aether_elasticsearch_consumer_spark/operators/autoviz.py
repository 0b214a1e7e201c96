"""Schema-driven default visualizations (reference visualization.py).

The reference walks the Avro schema and emits Kibana saved objects: per
field type a fixed set of visualizations (VIS_MAP, visualization.py:422-447
— geopoint→TileMap, int/float→Histogram+BarChart, string/select/select1→
PieChart+TableText), plus schema-pinned overrides via the
``@aether_default_visualization`` annotation (SCHEMA_VIS_MAP, 449-455),
with reserved/underscored fields filtered out (465-480) and deterministic
title/id templates ('{alias} {form} ({field} -> {vis})', 506-520).

Here the same walk emits **executable aggregation plans** instead of Kibana
JSON: each spec carries a builder ``(df) -> DataFrame`` using the
aggregation library (operators/aggregations.py), so a dashboard is a list
of lazily-planned Catalyst aggregations over the docs table.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import DataFrame

from ..plans.lifecycle import get_formname, remove_formname
from .aggregations import (
    date_histogram_agg,
    geohash_grid_agg,
    histogram_agg,
    terms_agg,
)
from .ingest import ES_RESERVED

# field type → [(vis name, builder factory)] — mirrors VIS_MAP
VIS_MAP: dict[str, list[str]] = {
    "geopoint": ["TileMap"],
    "int": ["Histogram", "BarChart"],
    "long": ["Histogram", "BarChart"],
    "float": ["Histogram", "BarChart"],
    "double": ["Histogram", "BarChart"],
    "string": ["PieChart", "TableText"],
    "enum": ["PieChart", "TableText"],
    "select": ["PieChart", "TableText"],
    "select1": ["PieChart", "TableText"],
    "dateTime": ["DateHistogram"],
}

# @aether_default_visualization override → vis name (SCHEMA_VIS_MAP)
SCHEMA_VIS_MAP: dict[str, str] = {
    "histogram": "Histogram",
    "pie": "PieChart",
    "table": "TableText",
    "map": "TileMap",
}


@dataclass
class VisSpec:
    vis_id: str
    title: str
    vis_type: str
    field: str
    build: Callable[[DataFrame], DataFrame]


def _builder(vis_type: str, field: str) -> Callable[[DataFrame], DataFrame]:
    if vis_type == "TileMap":
        return lambda df: geohash_grid_agg(df, f"{field}.lat", f"{field}.lon", 2)
    if vis_type in ("Histogram", "BarChart"):
        return lambda df: histogram_agg(df, field, interval=10)
    if vis_type in ("PieChart", "TableText"):
        # pie: top-5; table: top-10 with other/missing (visualization.py
        # pie 238-254 size 5, table 292-309 size 10)
        size = 5 if vis_type == "PieChart" else 10
        other = vis_type == "TableText"
        return lambda df: terms_agg(
            df, field, size=size, other_bucket=other, missing_bucket=other
        )
    if vis_type == "DateHistogram":
        return lambda df: date_histogram_agg(df, field, "day")
    raise ValueError(vis_type)


def _field_type(f: dict) -> str | None:
    ext = f.get("@aether_extended_type")
    if ext in VIS_MAP:
        return ext
    t = f["type"]
    members = t if isinstance(t, list) else [t]
    for m in members:
        name = m.get("type") if isinstance(m, dict) else m
        if name in VIS_MAP:
            return name
    return None


def _passes_filters(name: str) -> bool:
    field = remove_formname(name)
    return field not in ES_RESERVED and not field.startswith("_")


def _mk(alias: str, path: str, vis_type: str, field: str) -> VisSpec:
    form = get_formname(path)
    fname = remove_formname(path)
    title = f"{alias.capitalize()} {form} ({fname} -> {vis_type.capitalize()})"
    vis_id = f"{alias}_{form.lower()}_{fname.lower()}_{vis_type.lower()}"
    return VisSpec(vis_id, title, vis_type, field, _builder(vis_type, field))


def auto_visualizations(alias: str, schema: dict) -> dict[str, VisSpec]:
    """One spec per (eligible field × handler) — reference auto_visualizations
    (visualization.py:529-580)."""
    out: dict[str, VisSpec] = {}
    for f in schema.get("fields", []):
        name = f["name"]
        if not _passes_filters(name):
            continue
        ftype = _field_type(f)
        if ftype is None:
            continue
        for vis_type in VIS_MAP[ftype]:
            spec = _mk(alias, name, vis_type, name)
            out[spec.vis_id] = spec
    return out


def schema_defined_visualizations(alias: str, schema: dict) -> dict[str, VisSpec]:
    """Specs pinned by @aether_default_visualization annotations — reference
    schema_defined_visualizations (visualization.py:483-526)."""
    out: dict[str, VisSpec] = {}
    for f in schema.get("fields", []):
        pref = f.get("@aether_default_visualization")
        if pref is None or pref not in SCHEMA_VIS_MAP:
            continue
        vis_type = SCHEMA_VIS_MAP[pref]
        spec = _mk(alias, f["name"], vis_type, f["name"])
        out[spec.vis_id] = spec
    return out
