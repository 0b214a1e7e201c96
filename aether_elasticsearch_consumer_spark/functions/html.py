"""HTML → text extraction (X1 in SURVEY.md §2.4).

The webtext contract (BASELINE.json input_hint) carries ``html:binary`` and a
ground-truth ``text:string``; the per-row invariant is **byte-identical
extracted text per url**. One pure-Python function is the spec; the engine
wraps the very same function in an Arrow ``pandas_udf`` (batched, never
per-row Python dispatch from Spark's side), so oracle and engine agree by
construction.

Extraction semantics (a deliberately small, deterministic subset of what a
production boilerplate-stripper does — the Spark-side plumbing is the point):

1. decode UTF-8 (errors → replacement char);
2. drop ``<script>``/``<style>``/``<nav>``/``<header>``/``<footer>`` elements
   and the whole ``<head>``, including their contents;
3. closing block tags (``p``, ``h1``-``h6``, ``div``, ``li``, ``br``,
   ``table``, ``tr``) become newlines;
4. every remaining tag is stripped;
5. HTML entities are unescaped;
6. runs of horizontal whitespace collapse to one space, runs of newlines to
   one newline, lines are stripped, leading/trailing whitespace trimmed.
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DROP_RE = re.compile(
    r"<(script|style|nav|header|footer|head)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_BLOCK_CLOSE_RE = re.compile(
    r"</(?:p|h[1-6]|div|li|table|tr)\s*>|<br\s*/?>", re.IGNORECASE
)
_TAG_RE = re.compile(r"<[^>]+>")
_HSPACE_RE = re.compile(r"[ \t\r\f\v]+")
_NL_RE = re.compile(r"\n+")


def extract_text_py(html_bytes: bytes | str | None) -> str:
    """Pure-Python extraction — the spec and the oracle."""
    if html_bytes is None:
        return ""
    raw = (
        html_bytes.decode("utf-8", errors="replace")
        if isinstance(html_bytes, (bytes, bytearray))
        else html_bytes
    )
    s = _DROP_RE.sub(" ", raw)
    s = _BLOCK_CLOSE_RE.sub("\n", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    s = _HSPACE_RE.sub(" ", s)
    s = _NL_RE.sub("\n", s)
    s = "\n".join(line.strip() for line in s.split("\n"))
    s = _NL_RE.sub("\n", s).strip()
    return s


@F.pandas_udf(T.StringType())
def extract_text_udf(html_col: pd.Series) -> pd.Series:
    # Arrow-batched; identical code path to the oracle → byte-identical.
    return html_col.map(extract_text_py)


def extract_text(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return extract_text_udf(c)
