"""Okapi BM25 (X8) — the scoring the reference asserts via ES ``max_score``
(/root/reference/consumer/tests/test__index_handler.py:179-196; ES default
similarity, k1=1.2, b=0.75).

Lucene's rank-preserving form (no (k1+1) numerator factor):

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    score   = idf(t) * tf / (tf + k1 * (1 - b + b * dl / avgdl))

One formula, three renderings kept literally in sync:
``bm25_cols`` (Catalyst Column — JVM, codegen), ``bm25_np`` (numpy — oracle
and WAND block scorer), ``bm25_duckdb_sql`` (the DuckDB oracle expression).
All use float64 end-to-end; ties broken by (score desc, doc_id asc).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import B, K1


def idf_np(N: int, df: np.ndarray | float) -> np.ndarray | float:
    return np.log(1.0 + (N - df + 0.5) / (df + 0.5))


def bm25_np(
    tf: np.ndarray,
    df: np.ndarray | float,
    dl: np.ndarray,
    N: int,
    avgdl: float,
    k1: float = K1,
    b: float = B,
) -> np.ndarray:
    tf = tf.astype(np.float64)
    norm = tf + k1 * (1.0 - b + b * (dl.astype(np.float64) / avgdl))
    return idf_np(N, df) * tf / norm


def bm25_cols(
    tf: Column, df: Column, dl: Column, N: Column, avgdl: Column,
    k1: float = K1, b: float = B,
) -> Column:
    tf_d = tf.cast("double")
    idf = F.log(F.lit(1.0) + (N.cast("double") - df + F.lit(0.5)) / (df + F.lit(0.5)))
    norm = tf_d + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * dl.cast("double") / avgdl
    )
    return idf * tf_d / norm


def bm25_duckdb_sql(
    tf: str, df: str, dl: str, N: str, avgdl: str, k1: float = K1, b: float = B
) -> str:
    idf = f"ln(1.0 + (({N})::DOUBLE - ({df}) + 0.5) / (({df}) + 0.5))"
    norm = f"(({tf})::DOUBLE + {k1} * (1.0 - {b} + {b} * ({dl})::DOUBLE / ({avgdl})))"
    return f"({idf} * ({tf})::DOUBLE / {norm})"
