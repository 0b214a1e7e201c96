"""Incremental indexing: delta build at a doc-id offset + metadata-only
segment merge (X6) must be search-equivalent to a monolithic rebuild."""

from __future__ import annotations

import pytest

from aether_elasticsearch_consumer_spark.fixtures.webtext import webtext_df
from aether_elasticsearch_consumer_spark.operators.topk import IndexReader
from aether_elasticsearch_consumer_spark.oracle.engine import (
    build_oracle_index,
    score_query,
)
from aether_elasticsearch_consumer_spark.plans.index_build import IndexBuilder
from aether_elasticsearch_consumer_spark.plans.segments import (
    merge_indexes,
    next_doc_id_offset,
)

DPS = 256
TB = 8


@pytest.fixture(scope="module")
def merged(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("merge")
    # base: docs 0..599, delta: docs 600..799 of the same deterministic
    # stream (disjoint url sets)
    full = webtext_df(spark, 800, partitions=8).cache()
    base_src = full.where("url like '%page-000000%' or url like '%page-0000010%'")
    # simpler split: first 600 vs last 200 by the page number embedded in url
    page = "cast(substring(url, length(url) - 7, 8) as int)"
    base_src = full.where(f"{page} < 600")
    delta_src = full.where(f"{page} >= 600")

    b = IndexBuilder(spark, str(root / "base"), docs_per_segment=DPS, term_buckets=TB)
    b.build(base_src, fingerprint_extra="base800")
    off = next_doc_id_offset(spark, str(root / "base"))
    assert off % DPS == 0 and off >= 600
    d = IndexBuilder(
        spark, str(root / "delta"), docs_per_segment=DPS, term_buckets=TB,
        doc_id_offset=off,
    )
    d.build(delta_src, fingerprint_extra="delta800")
    merge_indexes(spark, str(root / "base"), str(root / "delta"), str(root / "merged"))
    full.unpersist()
    return str(root / "merged")


def test_merged_stats(spark, merged):
    st = spark.read.parquet(f"{merged}/stats/data").collect()[0]
    assert st["N"] == 800


def test_merged_search_matches_oracle(spark, merged):
    docs = (
        spark.read.parquet(f"{merged}/docs/data")
        .select("doc_id", "text")
        .toPandas()
    )
    oracle = build_oracle_index(list(zip(docs["doc_id"], docs["text"])))
    reader = IndexReader(spark, merged)
    for q in ["the", "ba ke", "keta gera rare", "zzznope"]:
        got = [(r["doc_id"], r["score"]) for r in reader.search(q, k=10).collect()]
        want = score_query(oracle, q, k=10)
        assert [g[0] for g in got] == [w[0] for w in want], q
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9)


def test_merge_is_idempotent(spark, merged, tmp_path_factory):
    # re-running the merge with the same fingerprint is a no-op
    base = merged.replace("merged", "base")
    delta = merged.replace("merged", "delta")
    m2 = merge_indexes(spark, base, delta, merged)
    assert all("fingerprint" in v for v in m2.values())


def test_layout_mismatch_rejected(spark, merged, tmp_path_factory):
    root = tmp_path_factory.mktemp("mismatch")
    other = IndexBuilder(
        spark, str(root / "other"), docs_per_segment=DPS * 2, term_buckets=TB
    )
    other.build(webtext_df(spark, 50, partitions=2), fingerprint_extra="o")
    with pytest.raises(ValueError):
        merge_indexes(spark, merged.replace("merged", "base"),
                      str(root / "other"), str(root / "x"))
