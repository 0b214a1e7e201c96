"""Policy-driven compaction (plans/compaction.py).

Contracts:
- the decision is pure metadata: delete-ratio / segment-fill / bound-scale
  triggers fire exactly at their thresholds;
- ``maybe_compact``: not due → no-op (pointer untouched); due → rebuild +
  atomic repoint, after which the reader through the SAME live pointer
  serves identical search results with ZERO tombstones and the policy
  reports healthy again;
- readers opened against the pre-compaction dir keep working (pointer
  resolves at open, the old generation is never mutated).
"""

from __future__ import annotations

import pytest

from aether_elasticsearch_consumer_spark.fixtures.webtext import webtext_df
from aether_elasticsearch_consumer_spark.operators.topk import IndexReader
from aether_elasticsearch_consumer_spark.plans.compaction import (
    CompactionPolicy,
    compaction_due,
    index_health,
    maybe_compact,
)
from aether_elasticsearch_consumer_spark.plans.index_build import IndexBuilder
from aether_elasticsearch_consumer_spark.plans.live_pointer import (
    commit_live_pointer,
    resolve_live,
)
from aether_elasticsearch_consumer_spark.plans.tombstones import (
    apply_deletes,
    has_deletes,
)

KW = dict(docs_per_segment=64, term_buckets=4)


@pytest.fixture(scope="module")
def live_idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("compaction")
    src = webtext_df(spark, 300, partitions=4)
    IndexBuilder(spark, str(root / "gen0"), **KW).build(
        src, fingerprint_extra="cpt300"
    )
    live = root / "live"
    commit_live_pointer(live, root / "gen0")
    return root, str(live)


def test_healthy_index_is_not_due(spark, live_idx):
    root, live = live_idx
    h = index_health(spark, resolve_live(live))
    assert h["tombstoned"] == 0 and h["delete_ratio"] == 0.0
    assert h["bound_scale"] == 1.0
    d = compaction_due(spark, resolve_live(live))
    assert not d["due"] and d["reasons"] == []
    res = maybe_compact(spark, live, str(root / "work"))
    assert res["compacted"] is False
    assert resolve_live(live).endswith("gen0")


def test_delete_ratio_trigger_threshold(spark, live_idx):
    root, live = live_idx
    base = resolve_live(live)
    apply_deletes(spark, base, list(range(0, 75)))  # 25% of 300
    d = compaction_due(spark, base, CompactionPolicy(max_delete_ratio=0.3))
    assert not d["due"]  # 0.25 < 0.3
    d = compaction_due(spark, base, CompactionPolicy(max_delete_ratio=0.25))
    assert d["due"] and "delete_ratio" in d["reasons"][0]


def test_maybe_compact_repoints_and_preserves_results(spark, live_idx):
    root, live = live_idx
    before = resolve_live(live)
    rd_before = IndexReader(spark, live)
    want = [
        (r["doc_id"], r["score"])
        for r in rd_before.search("keta gera", k=10).collect()
    ]
    res = maybe_compact(
        spark, live, str(root / "work"),
        CompactionPolicy(max_delete_ratio=0.25), tag="t1",
    )
    assert res["compacted"] is True
    after = resolve_live(live)
    assert after != before and after == res["new_index_dir"]
    # new generation: same results, zero tombstones, policy healthy
    rd_after = IndexReader(spark, live)
    got = [
        (r["doc_id"], r["score"])
        for r in rd_after.search("keta gera", k=10).collect()
    ]
    assert got == want
    assert not has_deletes(after)
    assert rd_after.N == rd_before.N == 225
    assert not compaction_due(spark, after, CompactionPolicy(0.25))["due"]
    # the superseded generation still serves (never mutated)
    rd_old = IndexReader(spark, before)
    assert [
        (r["doc_id"], r["score"])
        for r in rd_old.search("keta gera", k=10).collect()
    ] == want


def test_segment_fill_trigger(spark, live_idx):
    root, live = live_idx
    # post-compaction: 225 live docs, dps=64 → 4 segments, fill ≈ 0.88
    d = compaction_due(
        spark, resolve_live(live), CompactionPolicy(min_segment_fill=0.9)
    )
    assert d["due"] and "segment_fill" in d["reasons"][0]


def test_missing_live_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        maybe_compact(spark, str(tmp_path / "nope"), str(tmp_path / "w"))
