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


# -- index-pattern artifact + diff-gated merge (reference
#    index_handler.py:284-357,464-545) ----------------------------------------

LOOKUP_SCHEMA = {
    "name": "survey",
    "type": "record",
    "fields": [
        {"name": "id", "type": "string"},
        {"name": "created", "type": ["null", "string"],
         "@aether_extended_type": "dateTime"},
        {"name": "answer", "type": "string",
         "@aether_lookup": [
             {"label": "Yes", "value": "1"},
             {"label": "No", "value": "0"},
         ]},
        {"name": "nested", "type": {
            "type": "record", "name": "inner", "fields": [
                {"name": "grade", "type": "int",
                 "@aether_lookup": [{"label": "Pass", "value": "p"}]},
            ]}},
    ],
}


class TestLookupCompilation:
    def test_schema_walk_finds_nested(self):
        from aether_elasticsearch_consumer_spark.operators.ingest import (
            lookup_fields,
        )

        got = lookup_fields(LOOKUP_SCHEMA)
        assert set(got) == {"answer", "nested.grade"}
        assert got["answer"][0] == {"label": "Yes", "value": "1"}

    def test_decode_with_other_fallback(self, spark):
        from aether_elasticsearch_consumer_spark.operators.ingest import (
            IngestPipeline,
        )

        df = spark.createDataFrame(
            [("a", "1"), ("b", "0"), ("c", "weird"), ("d", None)],
            "id string, answer string",
        )
        flat = {
            "name": "survey", "type": "record",
            "fields": LOOKUP_SCHEMA["fields"][:3],
        }
        out = IngestPipeline(schema=flat).apply(df)
        got = {r["id"]: r["answer_decoded"] for r in out.collect()}
        assert got == {"a": "Yes", "b": "No", "c": "Other", "d": "Other"}

    def test_format_lookups_shape(self):
        from aether_elasticsearch_consumer_spark.operators.autoviz import (
            format_lookups,
        )

        fmt = format_lookups(LOOKUP_SCHEMA)
        assert fmt["answer"]["id"] == "static_lookup"
        assert fmt["answer"]["params"]["unknownKeyValue"] == "Other"
        assert {"value": "Yes", "key": "1"} in fmt["answer"]["params"]["lookupEntries"]


class TestIndexPatternMerge:
    def test_make_index_pattern(self):
        from aether_elasticsearch_consumer_spark.operators.autoviz import (
            make_index_pattern,
        )

        ip = make_index_pattern("tenant.survey", LOOKUP_SCHEMA)
        at = ip["attributes"]
        assert at["title"] == "tenant.survey"
        assert at["timeFieldName"] == "created"
        assert '"static_lookup"' in at["fieldFormatMap"]

    def test_merge_gating(self):
        from aether_elasticsearch_consumer_spark.operators.autoviz import (
            auto_visualizations,
            make_index_pattern,
            merge_kibana_artifacts,
        )

        ip = make_index_pattern("tenant.survey", LOOKUP_SCHEMA)
        vis = auto_visualizations("survey", LOOKUP_SCHEMA)
        # first write: everything emitted
        merged, art, upd = merge_kibana_artifacts("survey", ip, vis, None)
        assert merged is ip and set(upd) == set(vis)
        # unchanged: all gated out
        merged2, art2, upd2 = merge_kibana_artifacts("survey", ip, vis, art)
        assert merged2 is None and art2 is None and upd2 == {}
        # a new lookup entry changes the index pattern ONLY
        import copy

        s2 = copy.deepcopy(LOOKUP_SCHEMA)
        s2["fields"][2]["@aether_lookup"].append(
            {"label": "Maybe", "value": "2"}
        )
        ip2 = make_index_pattern("tenant.survey", s2)
        merged3, art3, upd3 = merge_kibana_artifacts("survey", ip2, vis, art)
        assert merged3 is ip2 and upd3 == {}
        assert art3["hashes"]["index"]["survey"] != art["hashes"]["index"]["survey"]
        # one retitled vis re-emits just that vis
        vis2 = dict(vis)
        k = next(iter(vis2))
        spec = vis2[k]
        vis2[k] = type(spec)(spec.vis_id, spec.title + " v2", spec.vis_type,
                             spec.field, spec.build)
        merged4, art4, upd4 = merge_kibana_artifacts("survey", ip, vis2, art)
        assert merged4 is None and list(upd4) == [k]
