"""Aggregation library (A1-A4) + incremental ingest stream tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aether_elasticsearch_consumer_spark.functions.geo import geohash_np
from aether_elasticsearch_consumer_spark.operators.aggregations import (
    MISSING_LABEL,
    OTHER_LABEL,
    count_metric,
    date_histogram_agg,
    geohash_grid_agg,
    histogram_agg,
    terms_agg,
)
from aether_elasticsearch_consumer_spark.operators.ingest import IngestPipeline
from aether_elasticsearch_consumer_spark.sources.catalog import Catalog
from aether_elasticsearch_consumer_spark.streaming.ingest_stream import stream_ingest


@pytest.fixture(scope="module")
def events(spark, sf001_dir):
    return spark.read.parquet(f"{sf001_dir}/events.parquet")


def test_count_metric(events):
    assert count_metric(events).collect()[0]["cnt"] == events.count()


def test_terms_agg_by_count_and_key(events):
    by_count = terms_agg(events, "event_type", size=3).collect()
    assert len(by_count) == 3
    assert by_count[0]["cnt"] >= by_count[1]["cnt"] >= by_count[2]["cnt"]
    by_key = terms_agg(events, "event_type", size=2, order_by="_key", ascending=True).collect()
    assert [r["key"] for r in by_key] == sorted(r["key"] for r in by_key)


def test_terms_agg_missing_and_other(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), (None,), ("c",)], "k string"
    )
    got = {r["key"]: r["cnt"] for r in
           terms_agg(df, "k", size=1, missing_bucket=True, other_bucket=True).collect()}
    assert got["a"] == 2
    assert got[OTHER_LABEL] == 3  # b + c + missing
    got2 = {r["key"]: r["cnt"] for r in
            terms_agg(df, "k", size=10, missing_bucket=True).collect()}
    assert got2[MISSING_LABEL] == 1


def test_histogram_with_extended_bounds(spark):
    df = spark.createDataFrame([(1.0,), (7.0,), (12.0,)], "v double")
    got = histogram_agg(df, "v", 5, extended_bounds=(0, 20)).collect()
    assert [r["bucket"] for r in got] == [0.0, 5.0, 10.0, 15.0, 20.0]
    assert [r["cnt"] for r in got] == [1, 1, 1, 0, 0]


def test_date_histogram(events):
    got = date_histogram_agg(events, "ts", "day").collect()
    assert sum(r["cnt"] for r in got) == events.count()
    assert len(got) >= 1


def test_geohash_known_values():
    """Golden: geohash of (57.64911, 10.40744) is 'u4pruydqqvj'."""
    import numpy as np

    got = geohash_np(np.array([57.64911]), np.array([10.40744]), 11)
    assert got[0] == "u4pruydqqvj"
    assert geohash_np(np.array([0.0]), np.array([0.0]), 2)[0] == "s0"


def test_geohash_grid_agg(spark):
    df = spark.createDataFrame(
        [(57.6, 10.4), (57.7, 10.5), (-33.9, 18.4), (None, 5.0)],
        "lat double, lon double",
    )
    got = geohash_grid_agg(df, "lat", "lon", precision=2).collect()
    by_cell = {r["cell"]: r for r in got}
    assert by_cell["u4"]["cnt"] == 2
    assert by_cell["u4"]["centroid_lat"] == pytest.approx(57.65)
    assert len(got) == 2  # null row excluded


def test_stream_ingest_incremental(spark, tmp_path):
    """S1 incremental consumption + S4 idempotent merge via Structured
    Streaming file source with exactly-once checkpointing."""
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("status", T.StringType()),
        ]
    )
    in_dir, cp = str(tmp_path / "in"), str(tmp_path / "cp")
    catalog = Catalog(spark, tmp_path / "cat")
    table = catalog.table("stream_target")
    pipe = IngestPipeline(
        schema={"name": "s", "type": "record", "fields": [
            {"name": "id", "type": "string"},
            {"name": "status", "type": ["null", "string"]},
        ]},
        topic_options={
            "filter_required": True,
            "filter_field_path": "status",
            "filter_pass_values": ["ok"],
        },
    )
    spark.createDataFrame([("a", "ok"), ("b", "bad")], schema).write.parquet(
        in_dir + "/batch1"
    )
    stream_ingest(spark, in_dir + "/*", schema, pipe, table, "id", cp)
    assert {r["id"] for r in table.read().collect()} == {"a"}
    # second micro-batch arrives → only new files processed, merge upserts
    spark.createDataFrame([("a", "ok"), ("c", "ok")], schema).write.parquet(
        in_dir + "/batch2"
    )
    stream_ingest(spark, in_dir + "/*", schema, pipe, table, "id", cp)
    assert {r["id"] for r in table.read().collect()} == {"a", "c"}


class TestMetricAggFamily:
    """ES metric-agg family: stats / cardinality / percentiles / range /
    filters (one-pass conditional aggregation shapes)."""

    @pytest.fixture(scope="class")
    def ev(self, spark):
        rows = [(i, None if v is None else float(v), t) for i, (v, t) in enumerate(
            [(5, "click"), (55, "view"), (250, "click"), (75, "purchase"),
             (600, "click"), (30, "signup"), (None, "view")]
        )]
        return spark.createDataFrame(rows, "id long, value double, event_type string")

    def test_stats(self, ev):
        from aether_elasticsearch_consumer_spark.operators.aggregations import stats_agg

        r = stats_agg(ev, "value").collect()[0]
        assert r["cnt"] == 6 and r["min_v"] == 5.0 and r["max_v"] == 600.0
        assert r["sum_v"] == 1015.0

    def test_cardinality_exact_and_approx(self, ev):
        from aether_elasticsearch_consumer_spark.operators.aggregations import (
            cardinality_agg,
        )

        assert cardinality_agg(ev, "event_type").collect()[0]["cardinality"] == 4
        approx = cardinality_agg(ev, "event_type", exact=False, rsd=0.05)
        got = approx.collect()[0]["cardinality"]
        assert abs(got - 4) <= 1  # HLL++ within rsd at tiny n

    def test_percentiles_median(self, ev):
        from aether_elasticsearch_consumer_spark.operators.aggregations import (
            percentiles_agg,
        )

        r = percentiles_agg(ev, "value", [0.5]).collect()[0]
        assert r["p50"] == 65.0  # continuous interpolation of 6 values

    def test_range_overlapping_buckets_independent(self, spark):
        from aether_elasticsearch_consumer_spark.operators.aggregations import range_agg

        df = spark.createDataFrame([(10.0,), (60.0,), (300.0,)], "v double")
        # overlapping ranges: 60 falls in BOTH '50-500' and '*-100'
        got = {r["bucket"]: r["cnt"] for r in
               range_agg(df, "v", [(None, 100), (50, 500)]).collect()}
        assert got == {"*-100": 2, "50-500": 2}

    def test_filters_one_pass(self, ev):
        from pyspark.sql import functions as F

        from aether_elasticsearch_consumer_spark.operators.aggregations import (
            filters_agg,
        )

        r = filters_agg(ev, {
            "clicks": F.col("event_type") == "click",
            "big": F.col("value") > 100,
        }).collect()[0]
        assert r["clicks"] == 3 and r["big"] == 2


def test_stream_index_continuous(spark, tmp_path):
    """Continuous indexing: two arrival waves → two micro-batches → the
    live index is always a complete committed index and ends up
    search-equivalent to a monolithic build over everything."""
    from aether_elasticsearch_consumer_spark.fixtures.webtext import webtext_df
    from aether_elasticsearch_consumer_spark.operators.topk import IndexReader
    from aether_elasticsearch_consumer_spark.oracle.engine import (
        build_oracle_index,
        score_query,
    )
    from aether_elasticsearch_consumer_spark.plans.live_pointer import (
        resolve_live,
    )
    from aether_elasticsearch_consumer_spark.streaming.ingest_stream import (
        stream_index,
    )

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    full = webtext_df(spark, 200, partitions=2).cache()
    page = "cast(substring(url, length(url) - 7, 8) as int)"
    full.where(f"{page} < 120").coalesce(1).write.mode("overwrite").parquet(
        str(incoming / "wave1")
    )
    schema = spark.read.parquet(str(incoming / "wave1")).schema
    live = tmp_path / "live"
    kw = dict(docs_per_segment=64, term_buckets=4)

    def run():
        stream_index(
            spark, str(incoming / "*"), schema, str(live), str(tmp_path / "wk"),
            str(tmp_path / "ckpt"), max_files_per_trigger=1, **kw,
        )

    run()
    r1 = IndexReader(spark, str(live))
    assert r1.N == 120
    # second wave arrives; the SAME checkpointed stream picks up only it
    full.where(f"{page} >= 120").coalesce(1).write.mode("overwrite").parquet(
        str(incoming / "wave2")
    )
    run()
    r2 = IndexReader(spark, str(live))
    assert r2.N == 200
    docs = [
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(resolve_live(live) + "/docs/data")
        .select("doc_id", "text").collect()
    ]
    oracle = build_oracle_index(docs)
    for q in ["keta", "ba ke", "the"]:
        got = [(r["doc_id"], r["score"]) for r in r2.search(q, k=10).collect()]
        want = score_query(oracle, q, k=10)
        assert [g[0] for g in got] == [w[0] for w in want], q
    # replaying with the same checkpoint is a no-op (idempotent)
    run()
    assert IndexReader(spark, str(live)).N == 200
    full.unpersist()


def test_stream_index_replay_after_crash_is_noop(spark, tmp_path):
    """At-least-once replay: if the process dies BETWEEN the live-symlink
    repoint and the streaming checkpoint commit, the batch re-runs on
    restart. The per-batch offset record + already-live guard must make
    that replay a no-op — not a double-ingest under fresh doc ids."""
    from aether_elasticsearch_consumer_spark.fixtures.webtext import webtext_df
    from aether_elasticsearch_consumer_spark.operators.topk import IndexReader
    from aether_elasticsearch_consumer_spark.plans.live_pointer import (
        resolve_live,
    )
    from aether_elasticsearch_consumer_spark.streaming.ingest_stream import (
        stream_index,
    )

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    full = webtext_df(spark, 160, partitions=2).cache()
    page = "cast(substring(url, length(url) - 7, 8) as int)"
    full.where(f"{page} < 100").coalesce(1).write.parquet(str(incoming / "w1"))
    schema = spark.read.parquet(str(incoming / "w1")).schema
    live = tmp_path / "live"

    def run():
        stream_index(
            spark, str(incoming / "*"), schema, str(live),
            str(tmp_path / "wk"), str(tmp_path / "ckpt"),
            max_files_per_trigger=1, docs_per_segment=64, term_buckets=4,
        )

    run()
    full.where(f"{page} >= 100").coalesce(1).write.parquet(str(incoming / "w2"))
    run()
    assert IndexReader(spark, str(live)).N == 160
    before = {
        (r["doc_id"], r["url"])
        for r in spark.read.parquet(resolve_live(live) + "/docs/data")
        .select("doc_id", "url").collect()
    }
    # simulate the crash window: drop the LAST batch's commit marker so
    # the restarted stream replays it from the offsets log
    commits = sorted((tmp_path / "ckpt" / "commits").glob("[0-9]*"))
    commits[-1].unlink()
    crc = commits[-1].parent / f".{commits[-1].name}.crc"
    if crc.exists():
        crc.unlink()
    run()
    after = {
        (r["doc_id"], r["url"])
        for r in spark.read.parquet(resolve_live(live) + "/docs/data")
        .select("doc_id", "url").collect()
    }
    assert after == before
    assert IndexReader(spark, str(live)).N == 160
    full.unpersist()


def test_stream_index_upsert_mode(spark, tmp_path):
    """upsert=True — the reference's ACTUAL consumer semantics: wave 2
    re-delivers 3 urls with new text; after the stream drains, queries
    see only the latest version of each url and BM25 equals a
    latest-version-corpus oracle."""
    from aether_elasticsearch_consumer_spark.fixtures.webtext import webtext_df
    from aether_elasticsearch_consumer_spark.operators.topk import IndexReader
    from aether_elasticsearch_consumer_spark.oracle.engine import (
        build_oracle_index,
        score_query,
    )
    from aether_elasticsearch_consumer_spark.plans.live_pointer import (
        resolve_live,
    )
    from aether_elasticsearch_consumer_spark.streaming.ingest_stream import (
        stream_index,
    )
    from pyspark.sql import functions as F

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    full = webtext_df(spark, 120, partitions=2).select("url", "text", "lang")
    full.coalesce(1).write.parquet(str(incoming / "w1"))
    schema = spark.read.parquet(str(incoming / "w1")).schema
    live = tmp_path / "live"

    def run():
        stream_index(
            spark, str(incoming / "*"), schema, str(live),
            str(tmp_path / "wk"), str(tmp_path / "ckpt"),
            max_files_per_trigger=1, upsert=True,
            docs_per_segment=64, term_buckets=4,
        )

    run()
    assert IndexReader(spark, str(live)).N == 120
    (
        full.orderBy("url").limit(3)
        .select(
            "url",
            F.concat(F.lit("freshly replaced text for "), "url").alias("text"),
            "lang",
        )
        .coalesce(1).write.parquet(str(incoming / "w2"))
    )
    run()
    rd = IndexReader(spark, str(live))
    assert rd.N == 120  # 3 tombstoned + 3 new
    docs = spark.read.parquet(resolve_live(live) + "/docs/data").select(
        "doc_id", "url", "text"
    ).collect()
    latest = {}
    for r in sorted(docs, key=lambda r: r["doc_id"]):
        latest[r["url"]] = (r["doc_id"], r["text"])  # higher id = newer
    live_docs = list(latest.values())
    assert len(live_docs) == 120
    oracle = build_oracle_index(live_docs)
    for q in ["freshly replaced", "keta gera", "the"]:
        got = [(r["doc_id"], r["score"]) for r in rd.search(q, k=10).collect()]
        assert got == score_query(oracle, q, k=10), q
    hits = {r["doc_id"] for r in rd.match_docs("freshly", "and").collect()}
    assert len(hits) == 3
    # replay with the same checkpoint: no-op
    run()
    assert IndexReader(spark, str(live)).N == 120


def test_stream_percolate_alerts_on_new_docs_only(spark, tmp_path):
    """The ES watcher/alerting composition: saved query strings
    percolated against each micro-batch's NEW documents (the delta
    doc-id range — disjoint by the stream_index offset contract). Wave 2
    must alert only on wave-2 docs, and the union of both waves' alerts
    must equal percolation over the final live index."""
    from aether_elasticsearch_consumer_spark.fixtures.webtext import webtext_df
    from aether_elasticsearch_consumer_spark.functions.tokenizer import tokenize_py
    from aether_elasticsearch_consumer_spark.operators.topk import IndexReader
    from aether_elasticsearch_consumer_spark.streaming.ingest_stream import (
        stream_index,
    )
    from pyspark.sql import functions as F

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    full = webtext_df(spark, 160, partitions=2).cache()
    page = "cast(substring(url, length(url) - 7, 8) as int)"
    full.where(f"{page} < 100").coalesce(1).write.parquet(str(incoming / "w1"))
    schema = spark.read.parquet(str(incoming / "w1")).schema
    live = tmp_path / "live"
    queries = {"q_keta": "keta", "q_phrase": '"ba ke"', "q_not": "gera -keta"}

    def run():
        stream_index(
            spark, str(incoming / "*"), schema, str(live),
            str(tmp_path / "wk"), str(tmp_path / "ckpt"),
            max_files_per_trigger=1, docs_per_segment=64, term_buckets=4,
            with_positions=True,
        )

    run()
    n1 = IndexReader(spark, str(live)).N
    full.where(f"{page} >= 100").coalesce(1).write.parquet(str(incoming / "w2"))
    run()
    rd = IndexReader(spark, str(live))
    assert rd.N == 160
    all_alerts = {
        (r["query_id"], r["doc_id"]) for r in rd.percolate(queries).collect()
    }
    new_alerts = {
        (q, d) for q, d in all_alerts if d >= n1
    }
    # python replay over the live corpus
    docs = [
        (r["doc_id"], tokenize_py(r["text"]))
        for r in spark.read.parquet(str(rd.dir / "docs/data"))
        .select("doc_id", "text").collect()
    ]

    def matches(toks, qid):
        if qid == "q_keta":
            return "keta" in toks
        if qid == "q_phrase":
            return any(a == "ba" and b == "ke" for a, b in zip(toks, toks[1:]))
        return "gera" in toks and "keta" not in toks

    want_all = {
        (q, d) for d, toks in docs for q in queries if matches(toks, q)
    }
    assert all_alerts == want_all and all_alerts
    want_new = {(q, d) for q, d in want_all if d >= n1}
    assert new_alerts == want_new
    assert new_alerts and new_alerts != all_alerts  # both waves alerted
    full.unpersist()


def test_stream_windowed_counts_watermark_drops_late(spark, tmp_path):
    """Watermarked tumbling event-time counts: a second wave delivers one
    in-watermark late event (must be counted) and one event later than
    the watermark horizon (must be dropped); finalized windows emit
    exactly once (append mode)."""
    import datetime as dt

    from aether_elasticsearch_consumer_spark.streaming.windowed import (
        stream_windowed_counts,
    )

    incoming = tmp_path / "in"
    incoming.mkdir()
    T0 = dt.datetime(2024, 3, 1, 12, 0, 0)

    def rows(*specs):
        return [(T0 + dt.timedelta(minutes=m), k) for m, k in specs]

    schema = "ts timestamp, event_type string"
    spark.createDataFrame(
        rows((1, "a"), (2, "a"), (11, "b"), (61, "a")), schema
    ).coalesce(1).write.parquet(str(incoming / "w1"))
    sch = spark.read.parquet(str(incoming / "w1")).schema

    def run():
        stream_windowed_counts(
            spark, str(incoming / "*"), sch, str(tmp_path / "out"),
            str(tmp_path / "ckpt"), window="10 minutes",
            watermark="20 minutes",
        )

    run()
    # wave 2: minute 3 'a' is ~58 min late (past the 20-min watermark →
    # dropped); minute 55 'b' is within watermark (counted); minute 70
    # advances time
    spark.createDataFrame(
        rows((3, "a"), (55, "b"), (70, "a")), schema
    ).coalesce(1).write.parquet(str(incoming / "w2"))
    run()
    # wave 3: a minute-90 event advances the watermark past 13:00 so the
    # [12:50,13:00) window finalizes and emits
    spark.createDataFrame(rows((90, "a")), schema).coalesce(1).write.parquet(
        str(incoming / "w3")
    )
    run()
    got = {
        (r["window_start"].minute, r["key"]): r["cnt"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    # finalized windows: [12:00,12:10) a=2 — the minute-3 'a' arriving in
    # wave 2 was ~58 min late, beyond the 20-min watermark, and is DROPPED
    # (the count would be 3 otherwise); [12:10,12:20) b=1;
    # [12:50,13:00) b=1 (in-watermark late data counted); [13:00,13:10)
    # a=1 from wave 1's minute-61 event
    assert got[(0, "a")] == 2
    assert got[(10, "b")] == 1
    assert got[(50, "b")] == 1


def test_stream_dedup_first_seen_across_batches(spark, tmp_path):
    """applyInPandasWithState streaming dedup: re-delivered keys in the
    same or a later micro-batch are dropped; the ts-minimal first-batch
    row wins deterministically; checkpointed state enforces it across
    separate stream runs."""
    import datetime as dt

    from aether_elasticsearch_consumer_spark.streaming.windowed import (
        stream_dedup_first_seen,
    )

    incoming = tmp_path / "in"
    incoming.mkdir()
    T0 = dt.datetime(2024, 3, 1, 0, 0, 0)
    schema = "url string, ts timestamp, body string"

    def mk(*specs):
        return [(u, T0 + dt.timedelta(seconds=s), b) for u, s, b in specs]

    spark.createDataFrame(
        mk(("u1", 5, "u1-late"), ("u1", 2, "u1-first"), ("u2", 1, "u2-first")),
        schema,
    ).coalesce(1).write.parquet(str(incoming / "w1"))
    sch = spark.read.parquet(str(incoming / "w1")).schema

    def run():
        stream_dedup_first_seen(
            spark, str(incoming / "*"), sch, str(tmp_path / "out"),
            str(tmp_path / "ckpt"), key_col="url", order_col="ts",
        )

    run()
    # wave 2 re-delivers u1/u2 and introduces u3
    spark.createDataFrame(
        mk(("u1", 0, "u1-replay"), ("u2", 9, "u2-replay"), ("u3", 3, "u3-first")),
        schema,
    ).coalesce(1).write.parquet(str(incoming / "w2"))
    run()
    got = {
        r["url"]: r["body"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got == {"u1": "u1-first", "u2": "u2-first", "u3": "u3-first"}


def test_stream_auto_compact_triggers_mid_stream(spark, tmp_path):
    """compaction_policy wired into the streaming loop: a wave
    re-delivering >20% of urls pushes delete_ratio past the policy →
    the post-batch evaluation rebuilds and repoints; the live index ends
    tombstone-free with identical search results."""
    from aether_elasticsearch_consumer_spark.fixtures.webtext import webtext_df
    from aether_elasticsearch_consumer_spark.operators.topk import IndexReader
    from aether_elasticsearch_consumer_spark.plans.compaction import (
        CompactionPolicy,
        compaction_due,
    )
    from aether_elasticsearch_consumer_spark.plans.live_pointer import (
        resolve_live,
    )
    from aether_elasticsearch_consumer_spark.plans.tombstones import (
        has_deletes,
    )
    from aether_elasticsearch_consumer_spark.streaming.ingest_stream import (
        stream_index,
    )
    from pyspark.sql import functions as F

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    full = webtext_df(spark, 100, partitions=2).select("url", "text", "lang")
    full.coalesce(1).write.parquet(str(incoming / "w1"))
    schema = spark.read.parquet(str(incoming / "w1")).schema
    live = tmp_path / "live"
    policy = CompactionPolicy(max_delete_ratio=0.2, min_segment_fill=0.0)

    def run():
        stream_index(
            spark, str(incoming / "*"), schema, str(live),
            str(tmp_path / "wk"), str(tmp_path / "ckpt"),
            max_files_per_trigger=1, upsert=True,
            compaction_policy=policy,
            docs_per_segment=64, term_buckets=4,
        )

    run()
    # wave 2: re-deliver 25 urls → 25/125 total = 0.2 delete ratio → due
    (
        full.orderBy("url").limit(25)
        .select(
            "url",
            F.concat(F.lit("rewritten for "), "url").alias("text"),
            "lang",
        )
        .coalesce(1).write.parquet(str(incoming / "w2"))
    )
    run()
    resolved = resolve_live(live)
    assert "compact_" in resolved  # a compaction generation went live
    assert not has_deletes(resolved)  # tombstones physically purged
    rd = IndexReader(spark, str(live))
    assert rd.N == 100
    assert not compaction_due(spark, resolved, policy)["due"]
    hits = {r["doc_id"] for r in rd.match_docs("rewritten", "and").collect()}
    assert len(hits) == 25
    # replay: checkpointed stream is a no-op, pointer stable
    before = resolve_live(live)
    run()
    assert resolve_live(live) == before
