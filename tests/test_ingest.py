"""Ingest-semantics layer tests — mirrors the reference's unit suite
(golden date coercion 10957→'2000-01-01' tests/test_processor.py:35-58,
masking/filter behavior, reserved renames, geopoint synthesis)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aether_elasticsearch_consumer_spark.functions.schema_map import (
    avro_schema_to_spark,
    derive_mapping,
    elect_time_field,
    most_permissive_avro_type,
)
from aether_elasticsearch_consumer_spark.operators.ingest import (
    ES_RESERVED,
    IngestPipeline,
    discover_geo_fields,
)

# Engine-native test schema exercising the reference's annotation surface
# (masking levels, geopoint discovery, logical date, unions, nesting) —
# see /root/reference/consumer/tests/__init__.py:744+ for the pattern.
SURVEY_SCHEMA = {
    "name": "TestHealthFacility",
    "type": "record",
    "fields": [
        {"name": "id", "type": "string"},
        {"name": "operational_status", "type": ["null", "string"]},
        {
            "name": "geometry",
            "type": [
                "null",
                {
                    "name": "geometry",
                    "type": "record",
                    "fields": [
                        {"name": "latitude", "type": ["null", "float"]},
                        {"name": "longitude", "type": ["null", "float"]},
                        {"name": "altitude", "type": ["null", "float"]},
                    ],
                },
            ],
        },
        {"name": "beds", "type": ["null", "int"], "@aether_masking": "private"},
        {"name": "staff_doctors", "type": ["null", "int"], "@aether_masking": "private"},
        {
            "name": "insurance",
            "type": ["null", {"type": "array", "items": "string"}],
            "@aether_masking": "public",
        },
        {
            "name": "mandatory_date",
            "type": ["null", {"type": "int", "logicalType": "date"}],
        },
        {
            "name": "optional_dt",
            "type": ["null", {"type": "long", "logicalType": "timestamp-millis"}],
        },
        {"name": "_id", "type": ["null", "string"]},
        {"name": "_version", "type": ["null", "string"]},
        {
            "name": "created",
            "type": ["null", "string"],
            "@aether_extended_type": "dateTime",
        },
    ],
}

MASK_LEVELS = ["public", "confidential", "secret", "top secret", "ufos"]


@pytest.fixture(scope="module")
def survey_df(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("operational_status", T.StringType()),
            T.StructField(
                "geometry",
                T.StructType(
                    [
                        T.StructField("latitude", T.FloatType()),
                        T.StructField("longitude", T.FloatType()),
                        T.StructField("altitude", T.FloatType()),
                    ]
                ),
            ),
            T.StructField("beds", T.IntegerType()),
            T.StructField("staff_doctors", T.IntegerType()),
            T.StructField("insurance", T.ArrayType(T.StringType())),
            T.StructField("mandatory_date", T.IntegerType()),
            T.StructField("optional_dt", T.LongType()),
            T.StructField("_id", T.StringType()),
            T.StructField("_version", T.StringType()),
            T.StructField("created", T.StringType()),
        ]
    )
    rows = [
        ("a", "operational", (9.07, 7.49, 100.0), 10, 2, ["nhis"], 10957, 946684800000, "x", "1", "2024-01-01T00:00:00"),
        ("b", "non_operational", (12.0, 8.6, 50.0), 5, 1, [], 0, 0, "y", "2", "2024-01-02T00:00:00"),
        ("c", "unknown", (None, None, None), None, None, None, None, None, "z", "3", None),
    ]
    return spark.createDataFrame(rows, schema)


class TestSchemaMap:
    def test_union_resolution_most_permissive(self):
        # reference test_processor.py:62-66 — table-order last match wins
        assert most_permissive_avro_type(["null", "string"]) == "string"
        assert most_permissive_avro_type(["int", "float"]) == "float"
        assert most_permissive_avro_type(["boolean", "int", "string"]) == "string"
        assert most_permissive_avro_type("long") == "long"

    def test_mapping_derivation(self):
        m = derive_mapping(SURVEY_SCHEMA)
        assert m["id"] == "keyword"
        assert m["beds"] == "integer"
        assert m["geometry"] == "object"
        assert m["insurance"] == "nested"
        assert m["mandatory_date"] == ("date", "date")
        assert m["optional_dt"] == ("date", "epoch_millis")
        assert m["created"] == "date"  # aether dateTime
        assert len(m) == len(SURVEY_SCHEMA["fields"])

    def test_spark_schema(self):
        st = avro_schema_to_spark(SURVEY_SCHEMA)
        by_name = {f.name: f for f in st.fields}
        assert isinstance(by_name["beds"].dataType, T.IntegerType)
        assert by_name["beds"].nullable
        assert not by_name["id"].nullable
        assert isinstance(by_name["geometry"].dataType, T.StructType)
        assert isinstance(by_name["insurance"].dataType, T.ArrayType)
        # logical date coerces to ISO string downstream
        assert isinstance(by_name["mandatory_date"].dataType, T.StringType)
        assert isinstance(by_name["optional_dt"].dataType, T.TimestampType)

    def test_time_field_election(self):
        # preferred wins if a date field; else 'timestamp' in name; else first
        assert elect_time_field(SURVEY_SCHEMA, "created") == "created"
        assert elect_time_field(SURVEY_SCHEMA) == "mandatory_date"


class TestGeoDiscovery:
    def test_finds_nested_lat_lon(self):
        got = discover_geo_fields(SURVEY_SCHEMA)
        assert got == ("geometry.latitude", "geometry.longitude")

    def test_missing_returns_none(self):
        assert discover_geo_fields({"name": "x", "fields": [{"name": "a", "type": "int"}]}) is None


class TestPipeline:
    def test_date_coercion_golden(self, spark, survey_df):
        """Golden from reference tests/test_processor.py:35-58: 10957 → '2000-01-01'."""
        p = IngestPipeline(schema=SURVEY_SCHEMA)
        out = p.apply(survey_df)
        rows = {r["id"]: r for r in out.collect()}
        assert rows["a"]["mandatory_date"] == "2000-01-01"
        assert rows["b"]["mandatory_date"] == "1970-01-01"
        assert rows["c"]["mandatory_date"] is None

    def test_filter_pass_values(self, spark, survey_df):
        p = IngestPipeline(
            schema=SURVEY_SCHEMA,
            topic_options={
                "filter_required": True,
                "filter_field_path": "operational_status",
                "filter_pass_values": ["operational"],
            },
        )
        out = p.apply(survey_df)
        assert [r["id"] for r in out.collect()] == ["a"]

    def test_masking_drops_above_emit_level(self, spark, survey_df):
        p = IngestPipeline(
            schema=SURVEY_SCHEMA,
            topic_options={
                "masking_annotation": "@aether_masking",
                "masking_levels": ["public", "private"],
                "masking_emit_level": "public",
            },
        )
        out = p.apply(survey_df)
        assert "beds" not in out.columns
        assert "staff_doctors" not in out.columns
        assert "insurance" in out.columns  # public ≤ public
        assert "id" in out.columns  # unannotated always passes

    def test_masking_emit_private_keeps_all(self, spark, survey_df):
        p = IngestPipeline(
            schema=SURVEY_SCHEMA,
            topic_options={
                "masking_annotation": "@aether_masking",
                "masking_levels": ["public", "private"],
                "masking_emit_level": "private",
            },
        )
        out = p.apply(survey_df)
        assert "beds" in out.columns and "insurance" in out.columns

    def test_reserved_renames(self, spark, survey_df):
        p = IngestPipeline(schema=SURVEY_SCHEMA)
        out = p.apply(survey_df)
        assert "es_reserved__id" in out.columns
        assert "es_reserved__version" in out.columns
        assert "_id" not in out.columns
        assert len(ES_RESERVED) == 14

    def test_geopoint_and_auto_ts(self, spark, survey_df):
        p = IngestPipeline(
            schema=SURVEY_SCHEMA,
            instructions={
                "_meta": {
                    "aet_geopoint": "geo_point",
                    "aet_auto_ts": "aet_auto_ts",
                }
            },
            batch_ts="2026-08-16T00:00:00.000000",
        )
        out = p.apply(survey_df)
        rows = {r["id"]: r for r in out.collect()}
        assert rows["a"]["geo_point"]["lat"] == pytest.approx(9.07, rel=1e-6)
        assert rows["a"]["geo_point"]["lon"] == pytest.approx(7.49, rel=1e-6)
        assert rows["c"]["geo_point"]["lat"] is None  # tolerant of nulls
        assert rows["b"]["aet_auto_ts"] == "2026-08-16T00:00:00.000000"

    def test_parent_join_payload(self, spark, survey_df):
        p = IngestPipeline(
            schema=SURVEY_SCHEMA,
            instructions={
                "_meta": {
                    "aet_parent_field": "operational_status",
                    "aet_join_field": "aet_join",
                }
            },
            type_name="facility",
        )
        out = p.apply(survey_df)
        row = {r["id"]: r for r in out.collect()}["a"]
        assert row["aet_join"]["name"] == "facility"
        assert row["aet_join"]["parent"] == "operational"


class TestNestedOps:
    def test_get_and_replace_nested(self, spark, survey_df):
        from pyspark.sql import functions as F

        from aether_elasticsearch_consumer_spark.operators.ingest import (
            get_nested,
            replace_nested,
        )

        got = survey_df.select(get_nested("geometry.latitude").alias("lat")).collect()
        assert got[0]["lat"] == pytest.approx(9.07, rel=1e-6)
        out = replace_nested(
            survey_df, "geometry.altitude", F.lit(999.0).cast("float")
        )
        rows = {r["id"]: r for r in out.collect()}
        assert rows["a"]["geometry"]["altitude"] == 999.0
        assert rows["a"]["geometry"]["latitude"] == pytest.approx(9.07, rel=1e-6)
        # top-level replace
        out2 = replace_nested(survey_df, "operational_status", F.lit("x"))
        assert {r["operational_status"] for r in out2.collect()} == {"x"}
