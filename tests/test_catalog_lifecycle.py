"""Catalog/lifecycle tests — mirrors the reference's integration suite:
idempotent conflict upsert (tests/test_job_consumer.py:158-171), schema
migration with doc preservation (tests/test__index_handler.py:143-196),
alias behavior, artifact hash gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aether_elasticsearch_consumer_spark.plans.lifecycle import (
    IndexLifecycle,
    get_alias_from_namespace,
    get_formname,
    index_name,
    remove_formname,
)
from aether_elasticsearch_consumer_spark.sources.catalog import Catalog

SCHEMA_V1 = {
    "name": "thing",
    "type": "record",
    "fields": [
        {"name": "id", "type": "string"},
        {"name": "poly", "type": ["null", "string"]},
    ],
}
# same field set, changed type — triggers migration (the reference's
# test scenario: 'poly' mistyped then retyped, test__index_handler.py:143-196)
SCHEMA_V2 = {
    "name": "thing",
    "type": "record",
    "fields": [
        {"name": "id", "type": "string"},
        {"name": "poly", "type": ["null", "int"]},
    ],
}


@pytest.fixture()
def catalog(spark, tmp_path):
    return Catalog(spark, tmp_path / "cat")


def test_name_munging():
    # F9 (index_handler.py:660-673)
    assert get_alias_from_namespace("eha_test_forms") == "eha_test"
    assert get_alias_from_namespace("plain") == "plain"
    assert remove_formname("proj.form1") == "proj"
    assert get_formname("proj.form1") == "form1"
    assert index_name("TENANT", "Topic") == "tenant.topic"


def test_snapshot_commit_and_read(spark, catalog):
    t = catalog.table("t1")
    df = spark.createDataFrame([("a", 1), ("b", 2)], "id string, v int")
    meta = t.commit(df)
    assert meta["count"] == 2 and meta["snapshot"] == "snap-0"
    assert sorted(r["id"] for r in t.read().collect()) == ["a", "b"]
    meta2 = t.commit(df.where(F.col("id") == "a"))
    assert meta2["snapshot"] == "snap-1" and t.count() == 1
    # time travel + rollback
    assert t.read("snap-0").count() == 2
    t.rollback("snap-0")
    assert t.count() == 2


def test_merge_upsert_idempotent_conflict(spark, catalog):
    """S4: create → conflict update → second conflict ignored
    (artifacts.py:513-550; test_job_consumer.py:158-171)."""
    t = catalog.table("t2")
    v1 = spark.createDataFrame([("a", 1), ("b", 1)], "id string, v int")
    t.merge_upsert(v1, "id")
    v2 = spark.createDataFrame([("a", 2), ("c", 1)], "id string, v int")
    t.merge_upsert(v2, "id")
    got = {r["id"]: r["v"] for r in t.read().collect()}
    assert got == {"a": 2, "b": 1, "c": 1}
    # replay the same merge → unchanged (idempotent)
    t.merge_upsert(v2, "id")
    got2 = {r["id"]: r["v"] for r in t.read().collect()}
    assert got2 == got
    # duplicate keys within one batch collapse deterministically
    v3 = spark.createDataFrame([("d", 1), ("d", 9)], "id string, v int")
    t.merge_upsert(v3, "id")
    assert {r["v"] for r in t.read().where("id='d'").collect()} == {9}


def test_alias_and_wildcard_listing(spark, catalog):
    df = spark.createDataFrame([("x", 1)], "id string, v int")
    catalog.table("tenant.topic_a").commit(df)
    catalog.table("tenant.topic_b").commit(df)
    catalog.table("other.z").commit(df)
    # S2 wildcard subscription (fnmatch, artifacts.py:246-250)
    assert catalog.list_tables("tenant.*") == ["tenant.topic_a", "tenant.topic_b"]
    catalog.set_alias("live", "tenant.topic_a")
    assert catalog.resolve("live").read().count() == 1


def test_reindex_count_parity(spark, catalog):
    src = catalog.table("src")
    src.commit(spark.range(100).select(F.col("id").cast("string").alias("id")))
    dst = catalog.table("dst")
    meta = src.reindex_to(dst)
    assert meta["count"] == 100


def test_lifecycle_migration_hash_gated(spark, catalog):
    lc = IndexLifecycle(catalog, "tenant")
    t = lc.ensure_index("things", SCHEMA_V1)
    docs = spark.createDataFrame([("a", "1001"), ("b", "1002")], "id string, poly string")
    lc.submit("things", docs, key="id")
    assert t.read().count() == 2

    # same schema → same physical table (hash short-circuit,
    # index_handler.py:221-232)
    t2 = lc.ensure_index("things", SCHEMA_V1)
    assert t2.path == t.path

    # changed schema → versioned migration preserving all docs
    t3 = lc.ensure_index("things", SCHEMA_V2)
    assert t3.path != t.path
    assert t3.read().count() == 2
    art = lc.get_artifacts()["tenant.things"]
    assert art["version"] == 1
    # alias (namespace-derived + full name) follows the migration
    assert catalog.resolve("tenant.things").read().count() == 2
    # upserts now land in the new physical table
    lc.submit("things", spark.createDataFrame([("c", "1003")], "id string, poly string"), key="id")
    assert t3.read().count() == 3
    assert t.read().count() == 2  # old version untouched


def test_read_json_messages_schema_enforced(spark, tmp_path):
    """JSON-lines source typed by an Avro schema (the reference's wire
    format) feeding the compiled ingest pipeline end to end."""
    import json as _json

    from aether_elasticsearch_consumer_spark.operators.ingest import IngestPipeline
    from aether_elasticsearch_consumer_spark.sources.catalog import (
        read_json_messages,
    )

    avro = {
        "name": "msg", "type": "record",
        "fields": [
            {"name": "id", "type": "string"},
            {"name": "n_days",
             "type": ["null", {"type": "int", "logicalType": "date"}]},
            {"name": "status", "type": ["null", "string"],
             "@aether_lookup": [{"label": "Open", "value": "o"}]},
        ],
    }
    lines = [
        {"id": "a", "n_days": 10957, "status": "o"},
        {"id": "b", "n_days": None, "status": "x", "extra": "dropped"},
        {"id": "c"},  # missing fields -> NULL
    ]
    p = tmp_path / "msgs.jsonl"
    p.write_text("\n".join(_json.dumps(x) for x in lines))
    df = read_json_messages(spark, str(p), avro)
    assert set(df.columns) == {"id", "n_days", "status"}
    out = IngestPipeline(schema=avro).apply(df)
    rows = {r["id"]: r for r in out.collect()}
    assert rows["a"]["n_days"] == "2000-01-01"          # F1 date coercion
    assert rows["a"]["status_decoded"] == "Open"        # F11 schema lookup
    assert rows["b"]["status_decoded"] == "Other"
    assert rows["c"]["status"] is None
