"""Auto-visualization spec generation + deep merge goldens."""

from __future__ import annotations

import pytest

from aether_elasticsearch_consumer_spark.functions.merge import deep_merge
from aether_elasticsearch_consumer_spark.operators.autoviz import (
    auto_visualizations,
    schema_defined_visualizations,
)

SCHEMA = {
    "name": "facility",
    "type": "record",
    "fields": [
        {"name": "id", "type": "string"},
        {"name": "status", "type": ["null", "string"],
         "@aether_default_visualization": "pie"},
        {"name": "beds", "type": ["null", "int"]},
        {"name": "score", "type": ["null", "float"]},
        {"name": "location", "type": ["null", "string"],
         "@aether_extended_type": "geopoint"},
        {"name": "created", "type": ["null", "string"],
         "@aether_extended_type": "dateTime"},
        {"name": "_version", "type": ["null", "string"]},   # filtered
        {"name": "_id", "type": ["null", "string"]},        # reserved
        {"name": "blob", "type": ["null", "bytes"]},        # no handler
    ],
}


class TestAutoViz:
    def test_counts_and_filtering(self):
        specs = auto_visualizations("alias", SCHEMA)
        # id:2, status:2, beds:2, score:2, location:1, created:1 = 10;
        # _version/_id filtered, bytes unsupported
        assert len(specs) == 10
        assert not any(s.field in ("_version", "_id") for s in specs.values())

    def test_titles_and_ids(self):
        specs = auto_visualizations("alias", SCHEMA)
        pie = specs["alias_beds_beds_histogram"]
        assert pie.title == "Alias beds (beds -> Histogram)"
        assert pie.vis_type == "Histogram"

    def test_schema_defined_override(self):
        specs = schema_defined_visualizations("alias", SCHEMA)
        assert list(specs) == ["alias_status_status_piechart"]
        assert specs["alias_status_status_piechart"].vis_type == "PieChart"

    def test_specs_execute(self, spark):
        df = spark.createDataFrame(
            [("a", "op", 10, 1.5), ("b", "non", 22, 2.5), ("c", "op", 7, 0.5)],
            "id string, status string, beds int, score float",
        )
        specs = auto_visualizations("alias", SCHEMA)
        pie = specs["alias_status_status_piechart"].build(df).collect()
        assert {r["key"]: r["cnt"] for r in pie} == {"op": 2, "non": 1}
        hist = specs["alias_beds_beds_histogram"].build(df).collect()
        assert {r["bucket"]: r["cnt"] for r in hist} == {0.0: 1, 10.0: 1, 20.0: 1}


class TestDeepMerge:
    """Goldens mirror the reference's always_merger behavior
    (tests/test_unit.py:97-117)."""

    def test_dicts_recurse(self):
        a = {"x": {"y": 1, "z": 2}, "k": 1}
        b = {"x": {"y": 9, "w": 3}, "n": 4}
        assert deep_merge(a, b) == {"x": {"y": 9, "z": 2, "w": 3}, "k": 1, "n": 4}

    def test_lists_concat(self):
        assert deep_merge({"l": [1, 2]}, {"l": [3]}) == {"l": [1, 2, 3]}

    def test_scalar_overwrite_and_immutability(self):
        a = {"v": 1, "nested": {"l": [1]}}
        b = {"v": 2, "nested": {"l": [2]}}
        out = deep_merge(a, b)
        assert out == {"v": 2, "nested": {"l": [1, 2]}}
        assert a == {"v": 1, "nested": {"l": [1]}}  # inputs untouched

    def test_type_mismatch_right_wins(self):
        assert deep_merge({"v": [1]}, {"v": {"a": 1}}) == {"v": {"a": 1}}
