"""Deterministic dense doc_id assignment (SURVEY.md §7.3 risk 2).

The reference keys documents by ``id``/``url`` (artifacts.py:519); Lucene
assigns internal docIDs. We need dense int64 ids that are (a) deterministic
across reruns and parallelism levels, (b) assignable without a global sort
at 10^12 rows.

Scheme: bucket by ``xxhash64(url) mod n_buckets``; within a bucket, rank by
``url`` (window ``row_number``, shuffle is per-bucket, never global); global
id = bucket_offset + local_rank, where offsets are the cumulative bucket
counts (an ``n_buckets``-row aggregate collected to the driver and broadcast
back as a join-free CASE map). Ids are dense in [0, N) and each bucket owns
a contiguous id range → segments (doc-range partitions) align with buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_doc_ids(
    df: DataFrame, id_col: str = "url", n_buckets: int | None = 64,
    offset: int = 0,
) -> DataFrame:
    """Add dense deterministic ``doc_id`` int64 column starting at
    ``offset`` (used by incremental delta builds to occupy a doc-id range
    disjoint from the base index). Two jobs: one n_buckets-row count
    aggregate, one bucketed window rank.

    Sizing rule (each bucket's rank is ONE task's sort): expected bucket
    size = N / n_buckets, so pick n_buckets ≥ N / 10M to keep the largest
    window sort comfortably in one task's memory — ``n_buckets=None``
    derives max(64, 8 × defaultParallelism), which keeps buckets
    task-sized as the cluster (and with it the corpus a cluster of that
    size ingests) grows. xxhash64 spreads urls uniformly, so skew is
    binomial-tight; ids stay dense in [offset, offset+N) at ANY bucket
    count, and which count was used only permutes the url→id mapping
    (rank-identity across counts pinned in tests/test_index_parity.py)."""
    if n_buckets is None:
        n_buckets = max(64, 8 * df.sparkSession.sparkContext.defaultParallelism)
    bucketed = df.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
    )
    counts = (
        bucketed.groupBy("_bucket").count().orderBy("_bucket").collect()
    )
    offsets: dict[int, int] = {}
    acc = offset
    for row in counts:
        offsets[row["_bucket"]] = acc
        acc += row["count"]
    offset_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = Window.partitionBy("_bucket").orderBy(id_col)
    return (
        bucketed.withColumn("_rank", F.row_number().over(w) - F.lit(1))
        .withColumn(
            "doc_id",
            (offset_map[F.col("_bucket")] + F.col("_rank")).cast("long"),
        )
        .drop("_rank")
    )
