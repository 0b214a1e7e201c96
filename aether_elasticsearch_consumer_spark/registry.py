"""Query registry — the driver-facing catalogue of implemented operators.

Each entry pairs a Spark implementation ``(spark, sf_dir) -> DataFrame``
with (where SQL-expressible) an equivalent DuckDB oracle SQL string over the
same parquet tables. Column names/aliases match exactly on both sides; float
outputs are rounded identically on both sides so the driver's
order-insensitive value hash is stable.

Keys map to SURVEY.md §2 operator ids (see each docstring).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.bm25 import bm25_duckdb_sql
from .functions.tokenizer import ASCII_TOKEN_RE, tokenize_col, tokenize_duckdb_sql
from .operators.topk import naive_bm25_topk

Entry = tuple[Callable[[SparkSession, str], DataFrame], str | None]

_REGISTRY: dict[str, Entry] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        _REGISTRY[name] = (fn, sql)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: v[0] for k, v in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {k: v[1] for k, v in _REGISTRY.items() if v[1] is not None}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# --------------------------------------------------------------------------
# Full-text: X2 tokenization, X7 term match, X8/X9 BM25 top-k, A6 stats
# --------------------------------------------------------------------------

_TOKS_SQL = tokenize_duckdb_sql("text")
_Q1 = "spark join window"
_Q2 = "customer order line slow"


@register(
    "fulltext_bm25_topk",
    f"""
    WITH lens AS (
      SELECT doc_id, len({_TOKS_SQL}) AS doc_len, text FROM documents
    ),
    toks AS (
      SELECT doc_id, doc_len, unnest({_TOKS_SQL}) AS term FROM lens
    ),
    tf AS (
      SELECT doc_id, doc_len, term, count(*)::BIGINT AS tf
      FROM toks WHERE term IN ('join', 'spark', 'window')
      GROUP BY doc_id, doc_len, term
    ),
    dft AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
    stats AS (SELECT count(*)::BIGINT AS N, avg(doc_len) AS avgdl FROM lens)
    SELECT tf.doc_id AS doc_id,
           round(sum({bm25_duckdb_sql('tf.tf', 'dft.df', 'tf.doc_len', 'stats.N', 'stats.avgdl')}), 9) AS score
    FROM tf, dft, stats WHERE tf.term = dft.term
    GROUP BY tf.doc_id
    ORDER BY score DESC, doc_id ASC LIMIT 10
    """,
)
def fulltext_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8/X9: exhaustive BM25 top-k (Lucene-form idf, k1=1.2, b=0.75).

    Reference delegates this to ES (tests assert max_score:
    /root/reference/consumer/tests/test__index_handler.py:176-196)."""
    return naive_bm25_topk(_docs(spark, sf_dir), _Q1, k=10)


@register(
    "fulltext_term_match",
    f"""
    SELECT doc_id FROM documents
    WHERE len(list_filter({_TOKS_SQL}, t -> t = 'window')) > 0
    ORDER BY doc_id
    """,
)
def fulltext_term_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: term query — docs whose analyzed text contains the term."""
    d = _docs(spark, sf_dir)
    return (
        d.where(F.array_contains(tokenize_col("text"), "window"))
        .select("doc_id")
        .orderBy("doc_id")
    )


@register(
    "fulltext_term_df",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct({_TOKS_SQL})) AS term FROM documents
    )
    SELECT term, count(*)::BIGINT AS df FROM toks
    WHERE term IN ('spark', 'join', 'window', 'table', 'zzznope')
    GROUP BY term ORDER BY term
    """,
)
def fulltext_term_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: per-term document frequency (collection statistics)."""
    d = _docs(spark, sf_dir)
    return (
        d.select(
            "doc_id",
            F.explode(F.array_distinct(tokenize_col("text"))).alias("term"),
        )
        .where(F.col("term").isin(["spark", "join", "window", "table", "zzznope"]))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .orderBy("term")
    )


@register(
    "fulltext_collection_stats",
    f"""
    WITH lens AS (SELECT len({_TOKS_SQL}) AS doc_len FROM documents)
    SELECT count(*)::BIGINT AS N, round(avg(doc_len), 9) AS avgdl,
           sum(doc_len)::BIGINT AS total_tokens FROM lens
    """,
)
def fulltext_collection_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: N / avgdl / token totals — BM25 normalization inputs."""
    d = _docs(spark, sf_dir)
    return d.select(F.size(tokenize_col("text")).alias("doc_len")).agg(
        F.count("*").alias("N"),
        F.round(F.avg("doc_len"), 9).alias("avgdl"),
        F.sum("doc_len").alias("total_tokens"),
    )


@register(
    "fulltext_multiterm_and",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS ts FROM documents)
    SELECT doc_id FROM toks
    WHERE len(list_filter(ts, t -> t = 'spark')) > 0
      AND len(list_filter(ts, t -> t = 'join')) > 0
    ORDER BY doc_id
    """,
)
def fulltext_multiterm_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 AND fast path: conjunctive term intersection."""
    d = _docs(spark, sf_dir)
    toks = tokenize_col("text")
    return (
        d.where(F.array_contains(toks, "spark") & F.array_contains(toks, "join"))
        .select("doc_id")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Aggregations A1-A3 (Kibana visState semantics) over events
# --------------------------------------------------------------------------


@register(
    "agg_terms_topn",
    """
    SELECT event_type, count(*)::BIGINT AS cnt FROM events
    GROUP BY event_type ORDER BY cnt DESC, event_type ASC LIMIT 5
    """,
)
def agg_terms_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: `terms` bucket agg — top-N values by count
    (/root/reference/consumer/app/visualization.py:238-254)."""
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("event_type"))
        .limit(5)
    )


@register(
    "agg_histogram",
    """
    SELECT (floor(value / 5) * 5)::DOUBLE AS bucket, count(*)::BIGINT AS cnt
    FROM events GROUP BY bucket ORDER BY bucket
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: `histogram` bucket agg, interval=5
    (/root/reference/consumer/app/visualization.py:185-197)."""
    return (
        _events(spark, sf_dir)
        .groupBy((F.floor(F.col("value") / 5) * 5).cast("double").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
        .orderBy("bucket")
    )


@register(
    "agg_count_metric",
    "SELECT count(*)::BIGINT AS cnt FROM events",
)
def agg_count_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: bare `count` metric (every visState)."""
    return _events(spark, sf_dir).agg(F.count("*").alias("cnt"))


# --------------------------------------------------------------------------
# Ingest semantics P1 (filter), F11 (lookup decode) over driver tables
# --------------------------------------------------------------------------


@register(
    "ingest_filter_isin",
    """
    SELECT o_orderkey, o_orderpriority FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') ORDER BY o_orderkey
    """,
)
def ingest_filter_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: message filter — value ∈ filter_pass_values
    (/root/reference/consumer/app/artifacts.py:419-431)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        o.where(F.col("o_orderpriority").isin(["1-URGENT", "2-HIGH"]))
        .select("o_orderkey", "o_orderpriority")
        .orderBy("o_orderkey")
    )


@register(
    "ingest_lookup_decode",
    """
    SELECT event_id,
           CASE event_type WHEN 'click' THEN 'Clicked'
                           WHEN 'view' THEN 'Viewed'
                           ELSE 'Other' END AS decoded
    FROM events ORDER BY event_id
    """,
)
def ingest_lookup_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: static lookup decode with 'Other' fallback
    (/root/reference/consumer/app/index_handler.py:698-724)."""
    mapping = F.create_map(
        F.lit("click"), F.lit("Clicked"), F.lit("view"), F.lit("Viewed")
    )
    return (
        _events(spark, sf_dir)
        .select(
            "event_id",
            F.coalesce(mapping[F.col("event_type")], F.lit("Other")).alias("decoded"),
        )
        .orderBy("event_id")
    )
