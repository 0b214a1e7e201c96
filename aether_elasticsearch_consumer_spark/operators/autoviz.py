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


# -- index-pattern artifact + diff-gated merge --------------------------------
# Reference: make_kibana_index / merge_kibana_artifacts / update_kibana_index
# (/root/reference/consumer/app/index_handler.py:284-357,464-545). The
# reference stores content hashes of everything it pushed to Kibana and only
# re-pushes artifacts whose hash changed ("save the new hashes last in case
# of partial failure", 341-343). Here the artifact store is any dict-backed
# persistence (plans/lifecycle.IndexLifecycle.put_artifact).

import json as _json

from ..functions.schema_map import elect_time_field
from ..plans.checkpoint import content_hash
from .ingest import LOOKUP_DEFAULT, lookup_fields


def format_lookups(
    schema: dict, default: str = LOOKUP_DEFAULT, strip_form_name: bool = True
) -> dict[str, dict]:
    """fieldFormatMap entries compiled from @aether_lookup annotations —
    reference _format_lookups/_format_single_lookup
    (index_handler.py:698-724): static_lookup with unknownKeyValue."""
    out = {}
    for path, pairs in lookup_fields(schema).items():
        key = remove_formname(path) if strip_form_name else path
        out[key] = {
            "id": "static_lookup",
            "params": {
                "lookupEntries": [
                    {"value": p["label"], "key": p["value"]} for p in pairs
                ],
                "unknownKeyValue": default,
            },
        }
    return out


def make_index_pattern(name: str, schema: dict) -> dict:
    """The index-pattern saved object — reference make_kibana_index
    (index_handler.py:284-297): title, elected timeFieldName, and the
    fieldFormatMap (escaped JSON, sorted keys; omitted when empty)."""
    lookups = format_lookups(schema)
    return {
        "attributes": {
            "title": name,
            "timeFieldName": elect_time_field(schema),
            "fieldFormatMap": _json.dumps(lookups, sort_keys=True)
            if lookups
            else None,
        }
    }


def _vis_fingerprint(spec: VisSpec) -> str:
    return content_hash(
        {"id": spec.vis_id, "title": spec.title, "type": spec.vis_type,
         "field": spec.field}
    )


def merge_kibana_artifacts(
    schema_name: str,
    index_pattern: dict,
    visualizations: dict[str, VisSpec],
    old_artifact: dict | None = None,
) -> tuple[dict | None, dict | None, dict[str, VisSpec]]:
    """Diff-gated artifact merge — reference merge_kibana_artifacts
    (index_handler.py:464-545): returns (index_pattern_to_write,
    new_artifact_hashes, visualizations_to_write). All three are None/empty
    when nothing changed, so callers skip the external write entirely.

    The artifact dict records content hashes of everything previously
    written ({'hashes': {'index': {schema: h}, 'visualization': {id: h}}});
    a field-level schema change (new lookup entry, different elected time
    field) changes the index-pattern hash and re-triggers exactly the
    changed objects."""
    index_hash = content_hash(index_pattern)
    vis_hashes = {k: _vis_fingerprint(v) for k, v in visualizations.items()}
    if not old_artifact:
        artifact = {
            "hashes": {
                "index": {schema_name: index_hash},
                "visualization": vis_hashes,
            }
        }
        return index_pattern, artifact, dict(visualizations)
    old_hashes = old_artifact.get("hashes", {})
    old_index_hash = old_hashes.get("index", {}).get(schema_name)
    old_vis_hashes = old_hashes.get("visualization", {})
    updated_visuals = {
        k: visualizations[k]
        for k, h in vis_hashes.items()
        if h not in old_vis_hashes.values()
    }
    if old_index_hash == index_hash and not updated_visuals:
        return None, None, {}
    artifact = {
        "hashes": {
            "index": {
                **old_hashes.get("index", {}),
                schema_name: index_hash,
            },
            "visualization": {**old_vis_hashes, **vis_hashes},
        }
    }
    merged = index_pattern if old_index_hash != index_hash else None
    return merged, artifact, updated_visuals
