"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship BM25 top-k over sf0.001 documents.
``queries()`` / ``oracle_sql()`` — registry of implemented operators
(SURVEY.md §2) with DuckDB oracle parity SQL; see
``aether_elasticsearch_consumer_spark/registry.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aether_elasticsearch_consumer_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: BM25 top-10 on sf0.001 documents through the real
    engine path (compressed block-max inverted index + MaxScore top-k)."""
    return registry.queries()["fulltext_bm25_topk"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
