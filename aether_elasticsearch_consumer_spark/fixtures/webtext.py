"""Deterministic Common-Crawl-style ``webtext`` fixture (FIXTURES.md §1).

Schema per BASELINE.json input_hint:
``url:string, warc_ts:timestamp, html:binary, text:string, lang:string``.

Generation is seeded and **per-doc counter-based** (numpy Philox keyed by
(seed, doc index)), so the table is bit-identical regardless of Spark
partitioning or parallelism level — a prerequisite for the determinism and
scaling-efficiency tests. Body text is a Zipfian (s≈1.07) draw over a 30k
synthetic vocabulary (head terms create realistic posting-list skew); doc
lengths are log-normal (median ≈200 tokens, tail to ~5k). ``text`` is the
ground truth that ``functions.html.extract_text`` must reproduce
byte-identically from ``html``.

Generation runs distributed via ``spark.range(n) → mapInPandas`` — no
driver-side materialization, scales to bench sizes.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SEED = 42
VOCAB_SIZE = 30_000
ZIPF_S = 1.07
LANGS = ["en", "fr", "de", "ha", "sw"]
LANG_W = np.array([0.55, 0.15, 0.12, 0.10, 0.08])
_EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

_SYLLABLES = [
    "ba", "ke", "li", "mo", "ta", "re", "su", "no", "vi", "da",
    "fu", "ge", "ho", "ji", "ka", "lu", "me", "ni", "po", "ra",
    "se", "to", "wa", "ze", "ch", "qu", "an", "er", "in", "on",
]
_HEAD_WORDS = [
    "the", "of", "and", "to", "in", "a", "is", "for", "on", "that",
    "with", "as", "by", "at", "from", "it", "this", "be", "are", "or",
]


def _make_vocab(size: int = VOCAB_SIZE) -> list[str]:
    """Deterministic vocabulary; rank-0 words are English-like stopwords."""
    vocab = list(_HEAD_WORDS)
    rng = np.random.Generator(np.random.Philox(key=SEED))
    syl = np.array(_SYLLABLES)
    while len(vocab) < size:
        n = rng.integers(2, 5)
        w = "".join(rng.choice(syl, size=n))
        vocab.append(w)
    # dedupe preserving order (collisions possible), then top up with suffixes
    seen: dict[str, None] = dict.fromkeys(vocab)
    vocab = list(seen)
    i = 0
    while len(vocab) < size:
        vocab.append(f"{vocab[20 + (i % 1000)]}{i}")
        i += 1
    return vocab[:size]


_VOCAB: list[str] | None = None
_ZIPF_CDF: np.ndarray | None = None


def vocab() -> list[str]:
    global _VOCAB
    if _VOCAB is None:
        _VOCAB = _make_vocab()
    return _VOCAB


def _zipf_cdf() -> np.ndarray:
    global _ZIPF_CDF
    if _ZIPF_CDF is None:
        ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
        p = ranks ** (-ZIPF_S)
        _ZIPF_CDF = np.cumsum(p / p.sum())
    return _ZIPF_CDF


def gen_doc(i: int, voc: list[str], cdf: np.ndarray) -> tuple[str, dt.datetime, bytes, str, str]:
    """Generate doc i — pure function of (SEED, i)."""
    rng = np.random.Generator(np.random.Philox(key=SEED, counter=i))
    lang = LANGS[int(rng.choice(len(LANGS), p=LANG_W))]
    n_tokens = int(np.clip(rng.lognormal(mean=5.3, sigma=0.7), 10, 5000))
    tok_idx = np.searchsorted(cdf, rng.random(n_tokens))
    tokens = [voc[j] for j in tok_idx]
    title = f"{tokens[0]} {tokens[1 % len(tokens)]} {i:08d}"
    paras = [" ".join(tokens[s : s + 60]) for s in range(0, n_tokens, 60)]
    url = f"https://site{i % 997}.example/{lang}/page-{i:08d}"
    text = title + "\n" + "\n".join(paras)
    body_ps = "".join(f"<p>{p}</p>" for p in paras)
    html = (
        f'<html><head><title>{title} &mdash; site</title>'
        f"<style>body{{margin:0;font:14px serif}}</style>"
        f"<script>var page={i};trk();</script></head>"
        f'<body><nav><a href="/">home</a> <a href="/{lang}/">index</a></nav>'
        f"<h1>{title}</h1>{body_ps}"
        f"<footer>&copy; 2024 site{i % 997}.example</footer></body></html>"
    ).encode("utf-8")
    ts = _EPOCH + dt.timedelta(seconds=int(i) * 37)
    return url, ts, html, text, lang


WEBTEXT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)


def webtext_df(spark: SparkSession, n_docs: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic generation of the webtext table.

    Default partition count tracks both corpus size and cluster width so
    downstream scans are never parallelism-starved (a 4-file input caps
    every scan stage at 4 tasks no matter how many cores exist)."""
    parts = partitions or max(
        spark.sparkContext.defaultParallelism * 2, n_docs // 10_000
    )

    def gen(batches):
        # mapInArrow + column-wise batch construction: the mapInPandas
        # form paid a pandas object-array transpose + block conversion
        # per batch on top of gen_doc (round 6 — values BIT-IDENTICAL,
        # asserted by tests/test_functions.py::test_webtext_arrow_path
        # against the per-doc generator; generation stays counter-based
        # per doc, so partitioning still can't change the table)
        import pyarrow as pa

        voc, cdf = vocab(), _zipf_cdf()
        for batch in batches:
            ids = batch.column("id").to_pylist()
            rows = [gen_doc(int(i), voc, cdf) for i in ids]
            urls, tss, htmls, texts, langs = zip(*rows) if rows else ((),) * 5
            yield pa.record_batch(
                [
                    pa.array(list(urls), pa.string()),
                    pa.array(list(tss), pa.timestamp("us", tz="UTC")),
                    pa.array(list(htmls), pa.binary()),
                    pa.array(list(texts), pa.string()),
                    pa.array(list(langs), pa.string()),
                ],
                names=["url", "warc_ts", "html", "text", "lang"],
            )

    return (
        spark.range(0, n_docs, numPartitions=parts)
        .mapInArrow(gen, schema=WEBTEXT_SCHEMA)
    )


def queries_set(n_queries: int = 100) -> list[dict]:
    """Reference query set (FIXTURES.md §2): head/mid/tail/absent strata,
    1–5 terms, k ∈ {10, 1, 100}. Deterministic (seed=7)."""
    rng = np.random.Generator(np.random.Philox(key=7))
    voc = vocab()
    strata = {
        "head": range(0, 50),
        "mid": range(200, 2000),
        "tail": range(10_000, 30_000),
    }
    out = []
    for qid in range(n_queries):
        n_terms = int(rng.integers(1, 6))
        terms = []
        for _ in range(n_terms):
            r = rng.random()
            if r < 0.4:
                terms.append(voc[int(rng.choice(list(strata["head"])))])
            elif r < 0.75:
                terms.append(voc[int(rng.choice(list(strata["mid"])))])
            elif r < 0.93:
                terms.append(voc[int(rng.choice(list(strata["tail"])))])
            else:
                terms.append(f"zzabsent{int(rng.integers(0, 100))}")
        k = [10, 1, 100][int(rng.choice(3, p=[0.8, 0.1, 0.1]))]
        out.append({"query_id": qid, "query": " ".join(terms), "k": k})
    return out
