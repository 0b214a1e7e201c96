"""Inverted-index build (X3-X6) as a staged, checkpoint-resumable Spark plan.

Replaces the reference's per-doc ``es.create`` hot loop
(/root/reference/consumer/app/artifacts.py:513-550, num_messages=1) with a
batch dataflow:

  docs:      webtext → extract_text (Arrow UDF) → tokenize → doc_len
             → deterministic dense doc_id → parquet
  stats:     N, avgdl (one aggregate)
  doclens:   per-segment varbyte array of doc lengths (scorer sidecar)
  postings:  explode(tokens) → groupBy(term, doc_id).count  [two-phase
             partial agg] → applyInPandas over (segment_id, term_bucket)
             groups → per-term delta+varbyte blocks with exact idf-free
             block-max impact metadata → parquet partitioned by term_bucket
  term_stats: per-term global df → parquet partitioned by term_bucket

Scale design (10^12 docs):
- **No build-time join on term.** Blocks carry ``max_impact`` =
  max(tf/(tf+k1·(1−b+b·dl/avgdl))); idf multiplies in at query time from
  the tiny per-query df lookup. This removes the one skew-prone shuffle a
  naive design needs (postings ⋈ df on Zipf-head terms).
- **Head-term lists are structurally bounded**: the shuffle key is
  (segment_id, term_bucket); a term's postings within one group never
  exceed ``docs_per_segment`` rows, so "the" is split across segments by
  construction — long-posting-list splitting without a special case.
- groupBy(term, doc_id) benefits from map-side partial aggregation
  (Catalyst HashAggregate) — tf counting never ships raw token rows.
- postings partitioned by ``term_bucket`` (pmod(xxhash64(term), B)) and
  sorted by (term, segment_id) within files → a term query prunes to 1/B
  of files by directory and to few row-groups by min/max.
"""

from __future__ import annotations

from collections.abc import Iterable
from pathlib import Path

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import B as BM25_B
from .. import BLOCK_SIZE, K1
from ..functions.codec import delta_encode, varbyte_encode
from ..functions.html import extract_text
from ..functions.tokenizer import tokenize_col
from .checkpoint import content_hash, run_stage
from .doc_ids import assign_doc_ids

DEFAULT_DOCS_PER_SEGMENT = 8192
DEFAULT_TERM_BUCKETS = 16

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("segment_id", T.LongType(), False),
        T.StructField("term_bucket", T.IntegerType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("df_seg", T.LongType(), False),
        T.StructField(
            "blocks",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("first_doc_id", T.LongType(), False),
                        T.StructField("last_doc_id", T.LongType(), False),
                        T.StructField("count", T.IntegerType(), False),
                        T.StructField("max_impact", T.DoubleType(), False),
                        T.StructField("doc_deltas", T.BinaryType(), False),
                        T.StructField("tfs", T.BinaryType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)

DOCLENS_SCHEMA = T.StructType(
    [
        T.StructField("segment_id", T.LongType(), False),
        T.StructField("start_doc_id", T.LongType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("lens", T.BinaryType(), False),
    ]
)


def build_docs_df(source: DataFrame, profile: str = "ascii",
                  n_buckets: int = 64) -> DataFrame:
    """webtext → docs with text, tokens-derived doc_len, dense doc_id."""
    cols = set(source.columns)
    df = source
    if "text" not in cols:
        df = df.withColumn("text", extract_text("html"))
    df = df.withColumn("doc_len", F.size(tokenize_col("text", profile)))
    keep = [c for c in ("url", "warc_ts", "lang", "text", "doc_len") if c in cols or c in ("text", "doc_len")]
    df = df.select(*keep)
    return assign_doc_ids(df, "url", n_buckets=n_buckets).drop("_bucket")


def _assemble_postings(pdf: pd.DataFrame) -> pd.DataFrame:
    """One (segment_id, term_bucket) group of (term, doc_id, tf, doc_len)
    rows → one output row per term with compressed block-max blocks.
    Pure numpy within the group — no per-row Python."""
    seg = int(pdf["segment_id"].iloc[0])
    tb = int(pdf["term_bucket"].iloc[0])
    order = np.lexsort((pdf["doc_id"].to_numpy(), pdf["term"].to_numpy()))
    terms = pdf["term"].to_numpy()[order]
    doc_ids = pdf["doc_id"].to_numpy()[order].astype(np.int64)
    tfs = pdf["tf"].to_numpy()[order].astype(np.int64)
    dls = pdf["doc_len"].to_numpy()[order].astype(np.float64)
    avgdl = float(pdf["avgdl"].iloc[0])
    # idf-free impact — exact per-posting, so block maxes are exact bounds
    impact = tfs / (tfs + K1 * (1.0 - BM25_B + BM25_B * dls / avgdl))
    uniq, starts = np.unique(terms, return_index=True)
    bounds = np.append(starts, len(terms))
    out = []
    for i, term in enumerate(uniq):
        s, e = bounds[i], bounds[i + 1]
        blocks = []
        for bs in range(s, e, BLOCK_SIZE):
            be = min(bs + BLOCK_SIZE, e)
            ids = doc_ids[bs:be]
            blocks.append(
                {
                    "first_doc_id": int(ids[0]),
                    "last_doc_id": int(ids[-1]),
                    "count": int(be - bs),
                    "max_impact": float(impact[bs:be].max()),
                    "doc_deltas": varbyte_encode(delta_encode(ids)),
                    "tfs": varbyte_encode(tfs[bs:be] - 1),
                }
            )
        out.append((seg, tb, str(term), int(e - s), blocks))
    return pd.DataFrame(
        out, columns=["segment_id", "term_bucket", "term", "df_seg", "blocks"]
    )


def _assemble_doclens(pdf: pd.DataFrame) -> pd.DataFrame:
    seg = int(pdf["segment_id"].iloc[0])
    ids = pdf["doc_id"].to_numpy().astype(np.int64)
    lens = pdf["doc_len"].to_numpy().astype(np.int64)
    order = np.argsort(ids)
    ids, lens = ids[order], lens[order]
    start = int(ids[0])
    # doc_ids are dense → contiguous within a segment
    dense = np.zeros(int(ids[-1]) - start + 1, dtype=np.int64)
    dense[ids - start] = lens
    return pd.DataFrame(
        [(seg, start, len(dense), varbyte_encode(dense))],
        columns=["segment_id", "start_doc_id", "n_docs", "lens"],
    )


class IndexBuilder:
    """Checkpoint-resumable index build rooted at ``index_dir``.

    Layout::

        index_dir/docs/        url, doc_id, doc_len, text, ...
        index_dir/stats/       single row: N, avgdl, docs_per_segment, ...
        index_dir/doclens/     per-segment varbyte doc lengths
        index_dir/postings/    term_bucket=*/ block-compressed posting lists
        index_dir/term_stats/  term_bucket=*/ per-term global df
    """

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        profile: str = "ascii",
        docs_per_segment: int = DEFAULT_DOCS_PER_SEGMENT,
        term_buckets: int = DEFAULT_TERM_BUCKETS,
        id_buckets: int = 64,
    ):
        self.spark = spark
        self.dir = Path(index_dir)
        self.profile = profile
        self.dps = docs_per_segment
        self.term_buckets = term_buckets
        self.id_buckets = id_buckets

    def build(self, source: DataFrame, fingerprint_extra: object = None,
              force: bool = False) -> dict:
        fp = content_hash(
            {
                "profile": self.profile,
                "dps": self.dps,
                "term_buckets": self.term_buckets,
                "id_buckets": self.id_buckets,
                "source": fingerprint_extra,
                "v": 1,
            }
        )
        manifests = {}

        def docs_stage(tmp: str) -> dict:
            docs = build_docs_df(source, self.profile, self.id_buckets)
            docs.write.mode("overwrite").parquet(tmp + "/data")
            return {}

        manifests["docs"] = run_stage("docs", self.dir / "docs", fp, docs_stage, force)
        docs = self.spark.read.parquet(str(self.dir / "docs/data"))

        def stats_stage(tmp: str) -> dict:
            row = docs.agg(
                F.count("*").alias("N"), F.avg("doc_len").alias("avgdl")
            ).collect()[0]
            stats = self.spark.createDataFrame(
                [
                    (
                        int(row["N"]),
                        float(row["avgdl"]),
                        self.dps,
                        self.term_buckets,
                        self.profile,
                    )
                ],
                "N long, avgdl double, docs_per_segment long, term_buckets int, profile string",
            )
            stats.coalesce(1).write.mode("overwrite").parquet(tmp + "/data")
            return {"N": int(row["N"]), "avgdl": float(row["avgdl"])}

        manifests["stats"] = run_stage("stats", self.dir / "stats", fp, stats_stage, force)
        st = self.spark.read.parquet(str(self.dir / "stats/data")).collect()[0]
        avgdl = float(st["avgdl"])

        def doclens_stage(tmp: str) -> dict:
            (
                docs.select(
                    (F.col("doc_id") / self.dps).cast("long").alias("segment_id"),
                    "doc_id",
                    "doc_len",
                )
                .groupBy("segment_id")
                .applyInPandas(_assemble_doclens, DOCLENS_SCHEMA)
                .write.mode("overwrite")
                .parquet(tmp + "/data")
            )
            return {}

        manifests["doclens"] = run_stage(
            "doclens", self.dir / "doclens", fp, doclens_stage, force
        )

        def postings_stage(tmp: str) -> dict:
            tokens = docs.select(
                "doc_id",
                "doc_len",
                F.explode(tokenize_col("text", self.profile)).alias("term"),
            )
            tf = tokens.groupBy("term", "doc_id").agg(
                F.count("*").alias("tf"), F.first("doc_len").alias("doc_len")
            )
            enriched = tf.select(
                (F.col("doc_id") / self.dps).cast("long").alias("segment_id"),
                F.pmod(F.xxhash64("term"), F.lit(self.term_buckets))
                .cast("int")
                .alias("term_bucket"),
                "term",
                "doc_id",
                "tf",
                "doc_len",
                F.lit(avgdl).alias("avgdl"),
            )
            (
                enriched.groupBy("segment_id", "term_bucket")
                .applyInPandas(_assemble_postings, POSTINGS_SCHEMA)
                .repartition("term_bucket")
                .sortWithinPartitions("term", "segment_id")
                .write.mode("overwrite")
                .partitionBy("term_bucket")
                .parquet(tmp + "/data")
            )
            return {}

        manifests["postings"] = run_stage(
            "postings", self.dir / "postings", fp, postings_stage, force
        )

        def term_stats_stage(tmp: str) -> dict:
            postings = self.spark.read.parquet(str(self.dir / "postings/data"))
            (
                postings.groupBy("term_bucket", "term")
                .agg(F.sum("df_seg").alias("df"))
                .repartition("term_bucket")
                .sortWithinPartitions("term")
                .write.mode("overwrite")
                .partitionBy("term_bucket")
                .parquet(tmp + "/data")
            )
            return {}

        manifests["term_stats"] = run_stage(
            "term_stats", self.dir / "term_stats", fp, term_stats_stage, force
        )
        return manifests
