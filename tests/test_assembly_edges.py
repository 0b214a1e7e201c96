"""Direct micro-tests of the Arrow posting assembly (X3-X5 edge cases):
single-token groups, exact block boundaries, tf run-length counting,
delta restart at block starts, exact block-max impacts."""

from __future__ import annotations

import pyarrow as pa

from aether_elasticsearch_consumer_spark.functions.codec import decode_block
from aether_elasticsearch_consumer_spark.plans.index_build import (
    DL_BITS,
    _assemble_postings_arrow,
)


def mk(rows):
    return pa.table(
        {
            "packed": pa.array([(d << DL_BITS) | l for d, l, _ in rows], pa.int64()),
            "term": pa.array([t for _, _, t in rows]),
            "term_bucket": pa.array([0] * len(rows), pa.int32()),
        }
    )


def test_single_token_group():
    out = _assemble_postings_arrow(mk([(5, 10, "alpha")]), avgdl=10.0, dps=8192)
    assert out.num_rows == 1
    ids, tfs = decode_block(out["doc_deltas"][0].as_py(), out["tfs"][0].as_py())
    assert list(ids) == [5] and list(tfs) == [1]


def test_exact_block_boundaries():
    rows = [(i, 10, "b") for i in range(128)] + [(i, 10, "c") for i in range(129)]
    out = _assemble_postings_arrow(mk(rows), avgdl=10.0, dps=8192)
    d = {}
    for i in range(out.num_rows):
        t = out["term"][i].as_py()
        d.setdefault(t, []).append(
            (out["block_no"][i].as_py(), out["count"][i].as_py(),
             out["first_doc_id"][i].as_py(), out["last_doc_id"][i].as_py())
        )
    assert d["b"] == [(0, 128, 0, 127)]
    assert sorted(d["c"]) == [(0, 128, 0, 127), (1, 1, 128, 128)]


def test_tf_runlength_and_exact_blockmax():
    rows = [(1, 5, "x"), (1, 5, "x"), (2, 5, "x"), (1, 5, "y")]
    out = _assemble_postings_arrow(mk(rows), avgdl=5.0, dps=8192)
    got = {out["term"][i].as_py(): out["df_seg"][i].as_py() for i in range(out.num_rows)}
    assert got == {"x": 2, "y": 1}
    for i in range(out.num_rows):
        ids, tfs = decode_block(out["doc_deltas"][i].as_py(), out["tfs"][i].as_py())
        if out["term"][i].as_py() == "x":
            assert list(ids) == [1, 2] and list(tfs) == [2, 1]
            # tf=2, dl=5, avgdl=5 → 2/(2 + 1.2·(0.25+0.75)) = 0.625 exact
            assert abs(out["max_impact"][i].as_py() - 0.625) < 1e-12


def test_delta_restart_per_block():
    rows = [(i * 3, 10, "z") for i in range(300)]
    out = _assemble_postings_arrow(mk(rows), avgdl=10.0, dps=8192)
    all_ids = []
    for i in range(out.num_rows):
        ids, _ = decode_block(out["doc_deltas"][i].as_py(), out["tfs"][i].as_py())
        all_ids.extend(ids)
    assert all_ids == [i * 3 for i in range(300)]


def test_tf_preagg_build_is_byte_identical(spark, tmp_path_factory):
    """Round 6: all three postings pipelines — token-instance rows,
    map-side tf pre-aggregated (doc, term, tf) rows
    (make_token_pairs_arrow), and blob-group rows
    (make_posting_group_blobs_arrow, the default) — must produce
    byte-identical postings/term_stats."""
    from aether_elasticsearch_consumer_spark.fixtures.webtext import webtext_df
    import aether_elasticsearch_consumer_spark.plans.index_build as ib

    root = tmp_path_factory.mktemp("preagg")
    src = webtext_df(spark, 800, partitions=4)
    src.write.mode("overwrite").parquet(str(root / "src"))
    src = spark.read.parquet(str(root / "src"))
    old_token, old_row = ib._FORCE_TOKEN_LEVEL, ib._FORCE_ROW_PREAGG
    try:
        ib._FORCE_TOKEN_LEVEL = True
        ib.IndexBuilder(
            spark, str(root / "old"), docs_per_segment=256, term_buckets=8
        ).build(src, fingerprint_extra="old")
        ib._FORCE_TOKEN_LEVEL = False
        ib._FORCE_ROW_PREAGG = True
        ib.IndexBuilder(
            spark, str(root / "rows"), docs_per_segment=256, term_buckets=8
        ).build(src, fingerprint_extra="rows")
        ib._FORCE_ROW_PREAGG = False
        ib.IndexBuilder(
            spark, str(root / "new"), docs_per_segment=256, term_buckets=8
        ).build(src, fingerprint_extra="new")
    finally:
        ib._FORCE_TOKEN_LEVEL = old_token
        ib._FORCE_ROW_PREAGG = old_row
    for part in ("postings", "term_stats"):
        key = ["term_bucket", "term", "segment_id", "block_no"]
        if part == "term_stats":
            key = ["term_bucket", "term"]
        a = (
            spark.read.parquet(str(root / f"old/{part}/data"))
            .orderBy(*key)
            .collect()
        )
        r = (
            spark.read.parquet(str(root / f"rows/{part}/data"))
            .orderBy(*key)
            .collect()
        )
        b = (
            spark.read.parquet(str(root / f"new/{part}/data"))
            .orderBy(*key)
            .collect()
        )
        assert len(a) == len(r) and a == r, part
        assert len(a) == len(b) and a == b, part


def test_dict_vocab_guard_counts_before_collecting(spark, tmp_path_factory, monkeypatch):
    """Round-5 verdict item: the dict-coding vocabulary guard must decide
    via a distributed count BEFORE materializing the vocab on the driver
    (a 10^8-term vocab would OOM the driver inside the old guard). With
    max_vocab_broadcast below the vocab size, no toPandas may run and the
    build must fall back to the string path (identical output)."""
    from pyspark.sql import DataFrame

    from aether_elasticsearch_consumer_spark.fixtures.webtext import webtext_df
    from aether_elasticsearch_consumer_spark.plans.index_build import IndexBuilder

    root = tmp_path_factory.mktemp("vocabguard")
    src = webtext_df(spark, 200, partitions=2)
    src.write.mode("overwrite").parquet(str(root / "src"))
    src = spark.read.parquet(str(root / "src"))
    calls = []
    orig = DataFrame.toPandas
    monkeypatch.setattr(
        DataFrame, "toPandas", lambda self: calls.append(1) or orig(self)
    )
    IndexBuilder(
        spark, str(root / "idx"), docs_per_segment=128, term_buckets=4,
        term_coding="dict", max_vocab_broadcast=5,
    ).build(src, fingerprint_extra="vg")
    assert not calls, "vocab was materialized despite exceeding the cap"
    # fallback output matches a plain strings build
    IndexBuilder(
        spark, str(root / "idx2"), docs_per_segment=128, term_buckets=4
    ).build(src, fingerprint_extra="vg2")
    a = spark.read.parquet(str(root / "idx/postings/data")).orderBy(
        "term_bucket", "term", "segment_id", "block_no").collect()
    b = spark.read.parquet(str(root / "idx2/postings/data")).orderBy(
        "term_bucket", "term", "segment_id", "block_no").collect()
    assert a == b
