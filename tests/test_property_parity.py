"""Property-based oracle parity (SURVEY.md §5): randomized small corpora
and queries — the distributed naive scorer must rank-match the pure-Python
oracle on arbitrary inputs, not just the fixed webtext fixture."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aether_elasticsearch_consumer_spark.operators.topk import naive_bm25_topk
from aether_elasticsearch_consumer_spark.oracle.engine import (
    build_oracle_index,
    score_query,
)

# small vocab forces heavy term overlap → exercises ties and df edge cases
WORDS = ["ape", "bee", "cat", "dog", "elk", "fox", "gnu", "hen"]
doc_strategy = st.lists(st.sampled_from(WORDS), min_size=0, max_size=30).map(" ".join)
corpus_strategy = st.lists(doc_strategy, min_size=1, max_size=12)
query_strategy = st.lists(st.sampled_from(WORDS + ["zzz"]), min_size=1, max_size=4).map(" ".join)


@pytest.mark.slow
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=corpus_strategy, query=query_strategy, k=st.integers(1, 6))
def test_naive_matches_oracle_on_random_corpora(spark, corpus, query, k):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    got = [
        (r["doc_id"], r["score"])
        for r in naive_bm25_topk(docs, query, k=k).collect()
    ]
    oracle = build_oracle_index(list(enumerate(corpus)))
    want = score_query(oracle, query, k=k)
    assert [g[0] for g in got] == [w[0] for w in want], (corpus, query, k)
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9)
