"""Unicode tokenization — the analyzer the reference delegates to Lucene.

Reference evidence: ES analyzed-``string`` vs ``keyword`` mapping split
(/root/reference/consumer/app/config.py:43); BM25 ``max_score`` assertions on
analyzed term queries (/root/reference/consumer/tests/test__index_handler.py:176-196).

Design: ONE token definition used by (a) the distributed engine, (b) the
pure-Python oracle, and (c) the DuckDB oracle SQL the driver runs — so top-k
results are rank-identical across all three.

Two profiles:

- ``ascii`` (default): lowercase, then maximal runs of ``[a-z0-9]``.
  Expressible identically in Java regex (Spark), RE2 (DuckDB), and Python
  ``re`` — the profile used wherever a DuckDB oracle compares results.
- ``unicode``: lowercase, then maximal runs of Python word chars minus ``_``
  (letters/digits in any script). Used by the webtext path where the oracle
  is the same Python function (trivially byte-identical).

The engine-side tokenizer is a JVM expression (``lower`` + ``regexp_extract_all``
— whole-stage-codegen, zero Python) for the ascii profile, and an Arrow
``pandas_udf`` for the unicode profile (vectorized, never per-row Python,
per BASELINE.json input_hint).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASCII_TOKEN_RE = "[a-z0-9]+"
_ASCII_RE = re.compile(ASCII_TOKEN_RE)
_UNICODE_RE = re.compile(r"[^\W_]+", re.UNICODE)

PROFILES = ("ascii", "unicode")


def tokenize_py(text: str | None, profile: str = "ascii") -> list[str]:
    """Pure-Python tokenizer — the oracle's analyzer, and the spec."""
    if not text:
        return []
    rx = _ASCII_RE if profile == "ascii" else _UNICODE_RE
    return rx.findall(text.lower())


def tokenize_col(col: Column | str, profile: str = "ascii") -> Column:
    """Engine-side tokenizer as a Column expression → array<string>.

    ascii profile stays fully JVM-side (codegen'd); unicode profile routes
    through the Arrow pandas_udf.
    """
    c = F.col(col) if isinstance(col, str) else col
    if profile == "ascii":
        return F.regexp_extract_all(F.lower(c), F.lit(ASCII_TOKEN_RE), 0)
    return tokenize_pandas_udf(c)


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_pandas_udf(texts: pd.Series) -> pd.Series:
    # Arrow-batched; pandas .str ops run C-side where possible.
    lowered = texts.str.lower()
    return lowered.str.findall(_UNICODE_RE).map(
        lambda toks: toks if isinstance(toks, list) else []
    )


def tokenize_duckdb_sql(expr: str) -> str:
    """The exact same ascii tokenization as a DuckDB SQL expression.

    Returns a SQL fragment producing ``list<varchar>`` of tokens.
    """
    return f"regexp_extract_all(lower({expr}), '{ASCII_TOKEN_RE}')"
