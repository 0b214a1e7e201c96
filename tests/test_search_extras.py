"""search_after pagination, field collapse, more_like_this.

Contracts:
- cursor paging tiles the full ranking exactly (pages concatenated ==
  one big top-k; no dup, no gap), including page boundaries inside 9-dp
  score ties;
- collapse returns the per-key leaders of the EXHAUSTIVE match set;
- more_like_this term selection follows the documented tf·idf rule and
  retrieval drops the seed.
All verified against direct python evaluation over the same corpus.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest

from aether_elasticsearch_consumer_spark.fixtures.webtext import webtext_df
from aether_elasticsearch_consumer_spark.functions.bm25 import idf_np
from aether_elasticsearch_consumer_spark.operators.topk import IndexReader
from aether_elasticsearch_consumer_spark.oracle.engine import (
    build_oracle_index,
    score_query,
)
from aether_elasticsearch_consumer_spark.plans.index_build import IndexBuilder


@pytest.fixture(scope="module")
def xidx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("xtras")
    src = webtext_df(spark, 400, partitions=4)
    IndexBuilder(
        spark, str(root / "idx"), docs_per_segment=128, term_buckets=8
    ).build(src, fingerprint_extra="xtras400")
    docs = [
        (r["doc_id"], r["text"], r["lang"])
        for r in spark.read.parquet(str(root / "idx/docs/data"))
        .select("doc_id", "text", "lang")
        .collect()
    ]
    oracle = build_oracle_index([(i, t) for i, t, _ in docs])
    return IndexReader(spark, str(root / "idx")), docs, oracle


def test_cursor_pages_tile_the_ranking(xidx):
    rd, docs, oracle = xidx
    q = "the keta gera"  # head term → many matches, real tie structure
    want = score_query(oracle, q, k=30)
    page1 = [(r["doc_id"], r["score"]) for r in rd.search(q, k=10).collect()]
    assert page1 == want[:10]
    pages = list(page1)
    for _ in range(2):
        s, d = pages[-1][1], pages[-1][0]
        nxt = [
            (r["doc_id"], r["score"])
            for r in rd.search_after(q, s, d, k=10).collect()
        ]
        pages += nxt
    assert pages == want[:30]
    assert len({d for d, _ in pages}) == 30  # no dup, no gap


def test_cursor_page_through_tie_boundary(xidx):
    rd, docs, oracle = xidx
    # single stopword: masses of equal 9-dp scores — page boundaries land
    # INSIDE tie groups, exercising the (score, doc_id) composite cursor
    q = "the"
    want = score_query(oracle, q, k=40)
    got = []
    cursor = None
    while len(got) < 40:
        page = (
            rd.search(q, k=8)
            if cursor is None
            else rd.search_after(q, cursor[1], cursor[0], k=8)
        )
        rows = [(r["doc_id"], r["score"]) for r in page.collect()]
        assert rows, "premature exhaustion"
        got += rows
        cursor = rows[-1]
    assert got[:40] == want


def test_collapse_leaders_match_python(xidx):
    rd, docs, oracle = xidx
    q = "keta gera"
    scored = dict(score_query(oracle, q, k=10**9))
    best = {}
    for i, _, lang in docs:
        if i in scored:
            cand = (-scored[i], i)
            if lang not in best or cand < best[lang]:
                best[lang] = cand
    want = {(lang, i, -s) for lang, (s, i) in best.items()}
    keys = rd.spark.createDataFrame(
        [(i, lang) for i, _, lang in docs], "doc_id long, lang string"
    )
    got = {
        (r["lang"], r["doc_id"], r["score"])
        for r in rd.collapse_top_hits(q, keys, "lang").collect()
    }
    assert got == want and len(got) >= 3


def test_more_like_this_matches_python(xidx):
    rd, docs, oracle = xidx
    seed = docs[5][0]
    toks = Counter(
        t for t in __import__(
            "aether_elasticsearch_consumer_spark.functions.tokenizer",
            fromlist=["tokenize_py"],
        ).tokenize_py(docs[5][1])
    )
    ranked = sorted(
        (-round(c * float(idf_np(oracle.N, oracle.df(t))), 6), t)
        for t, c in toks.items()
    )[:10]
    terms = [t for _, t in ranked]
    want = [
        (d, s)
        for d, s in score_query(oracle, " ".join(terms), k=11)
        if d != seed
    ][:10]
    got = [
        (r["doc_id"], r["score"])
        for r in rd.more_like_this(seed, max_query_terms=10, k=10).collect()
    ]
    assert got == want and got
