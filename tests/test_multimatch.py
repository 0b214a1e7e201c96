"""Multi-field index + multi_match semantics.

Contracts:
- a field sub-index shares the root's doc_id space but carries its OWN
  N/avgdl/df — per-field statistics isolation (the reason ES keeps one
  Lucene index per field);
- best_fields == dis_max over per-field match scores (max + tb·(sum−max)),
  most_fields == sum; both replayed exactly by a python evaluator over the
  per-field or_scores collected from the engine;
- per-field boost multiplies then re-rounds to 9 dp (the ^boost ladder);
- ES field-list syntax ["title^2", "body"] parses; unknown fields raise.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aether_elasticsearch_consumer_spark.fixtures.webtext import webtext_df
from aether_elasticsearch_consumer_spark.functions.tokenizer import tokenize_col
from aether_elasticsearch_consumer_spark.operators.multimatch import (
    MultiFieldIndex,
    parse_fields,
)
from aether_elasticsearch_consumer_spark.plans.index_build import IndexBuilder
from aether_elasticsearch_consumer_spark.plans.multi_field import (
    build_field_index,
    list_field_indexes,
)

Q = "keta gera tila"


@pytest.fixture(scope="module")
def mfidx(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mf") / "idx")
    src = webtext_df(spark, 300, partitions=4)
    IndexBuilder(spark, root, docs_per_segment=128, term_buckets=8).build(
        src, fingerprint_extra="mf300"
    )
    docs = MultiFieldIndex(spark, root).reader("text")  # root open works
    title = (
        docs.spark.read.parquet(f"{root}/docs/data")
        .select(
            "doc_id",
            F.array_join(F.slice(tokenize_col("text"), 1, 6), " ").alias("text"),
        )
    )
    build_field_index(
        spark, root, "title", title,
        docs_per_segment=128, term_buckets=8, fingerprint_extra="t6",
    )
    return MultiFieldIndex(spark, root)


def _rows(df):
    return {r["doc_id"]: r["score"] for r in df.collect()}


def test_field_discovery_and_unknown_field(mfidx):
    assert list_field_indexes(mfidx.dir) == ["title"]
    assert mfidx.fields() == ["text", "title"]
    with pytest.raises(KeyError):
        mfidx.reader("body")


def test_per_field_statistics_isolation(mfidx):
    rt, rtitle = mfidx.reader("text"), mfidx.reader("title")
    assert rt.N == rtitle.N  # same corpus
    assert rtitle.avgdl < rt.avgdl  # title = 6-token prefix
    # df under the title field can only shrink (prefix of the same tokens)
    for t, df_title in rtitle.term_dfs(["keta", "gera", "tila"]).items():
        assert df_title <= rt.term_dfs([t]).get(t, 0)


def test_parse_fields():
    assert parse_fields(["title^2", "body"]) == {"title": 2.0, "body": 1.0}
    assert parse_fields(["a^0.5"]) == {"a": 0.5}


@pytest.mark.parametrize("mode,tb", [("best_fields", 0.3), ("most_fields", 0.0)])
def test_multi_match_replays_per_field_or_scores(mfidx, mode, tb):
    fields = {"title": 2.0, "text": 1.0}
    per_field = {
        name: _rows(mfidx.field_scores(name, Q, boost))
        for name, boost in fields.items()
    }
    expect = {}
    for d in set().union(*per_field.values()):
        ss = [s[d] for s in per_field.values() if d in s]
        if mode == "most_fields":
            v = sum(ss)
        else:
            v = max(ss) + tb * (sum(ss) - max(ss))
        expect[d] = round(v, 9)
    want = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r["doc_id"], r["score"])
        for r in mfidx.multi_match(Q, fields, mode=mode, tie_breaker=tb, k=10)
        .collect()
    ]
    assert [(d, pytest.approx(s, abs=2e-9)) for d, s in want] == got


def test_boost_reorders_toward_boosted_field(mfidx):
    # an extreme title boost must rank title-hit docs above body-only hits
    top = [
        r["doc_id"]
        for r in mfidx.multi_match(
            Q, {"title": 50.0, "text": 1.0}, mode="best_fields", k=5
        ).collect()
    ]
    title_hits = set(_rows(mfidx.field_scores("title", Q)))
    assert title_hits  # fixture must actually have title matches
    lead = min(len(title_hits), 5)
    assert set(top[:lead]) <= title_hits


def test_bad_mode_raises(mfidx):
    with pytest.raises(ValueError):
        mfidx.multi_match(Q, {"text": 1.0}, mode="cross_fields")


def test_combined_fields_replays_bm25f(mfidx):
    """combined_fields == python BM25F-simple over per-field tf/dl
    collected straight from the engine's primitives."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    def r9(x: float) -> float:
        # Spark F.round is HALF_UP on the shortest-repr decimal; python
        # round() is half-even (the documented replay trap)
        return float(Decimal(repr(x)).quantize(Decimal("1e-9"), ROUND_HALF_UP))

    from aether_elasticsearch_consumer_spark import B, K1
    from aether_elasticsearch_consumer_spark.functions.tokenizer import (
        tokenize_py,
    )

    fields = {"title": 2.0, "text": 1.0}
    terms = sorted(set(tokenize_py(Q)))
    tf = {}   # (doc, term) -> blended tf
    dl = {}   # doc -> blended dl (all docs)
    avgdl = 0.0
    N = mfidx.reader("text").N
    for name, w in sorted(fields.items()):
        rd = mfidx.reader(name)
        avgdl += w * rd.avgdl
        for r in rd.term_freqs(terms).collect():
            k_ = (r["doc_id"], r["term"])
            tf[k_] = tf.get(k_, 0.0) + w * r["tf"]
        for r in (
            rd.spark.read.parquet(f"{rd.dir}/docs/data")
            .select("doc_id", "doc_len").collect()
        ):
            dl[r["doc_id"]] = dl.get(r["doc_id"], 0.0) + w * r["doc_len"]
    df = {}
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1
    scores = {}
    for (d, t), v in tf.items():
        idf = math.log(1.0 + (N - df[t] + 0.5) / (df[t] + 0.5))
        s = r9(idf * v / (v + K1 * (1 - B + B * dl[d] / avgdl)))
        scores[d] = scores.get(d, 0.0) + s
    want = sorted(
        ((d, r9(s)) for d, s in scores.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    got = [
        (r["doc_id"], r["score"])
        for r in mfidx.combined_fields(Q, fields, k=10).collect()
    ]
    assert [(d, pytest.approx(s, abs=2e-9)) for d, s in want] == got
    # blended scores are a genuinely different quantity than dis_max
    best = _rows(mfidx.multi_match(Q, fields, k=10))
    assert any(
        d in best and abs(best[d] - s) > 1e-9 for d, s in got
    ) or len(got) < 2


def test_cross_fields_replays_blended_df(mfidx):
    """cross_fields == python replay: per-term max-field BM25 under the
    blended (max over fields) document frequency."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    def r9(x):
        return float(Decimal(repr(x)).quantize(Decimal("1e-9"), ROUND_HALF_UP))

    from aether_elasticsearch_consumer_spark import B, K1
    from aether_elasticsearch_consumer_spark.functions.tokenizer import (
        tokenize_py,
    )

    fields = {"title": 2.0, "text": 1.0}
    terms = sorted(set(tokenize_py(Q)))
    N = mfidx.reader("text").N
    dfb = {}
    for name in fields:
        for t, d in mfidx.reader(name).term_dfs(terms).items():
            dfb[t] = max(dfb.get(t, 0), d)
    per_term = {}
    for name, w in sorted(fields.items()):
        rd = mfidx.reader(name)
        dl = {
            r["doc_id"]: r["doc_len"]
            for r in rd.spark.read.parquet(f"{rd.dir}/docs/data")
            .select("doc_id", "doc_len").collect()
        }
        for r in rd.term_freqs(terms).collect():
            d, t, tfv = r["doc_id"], r["term"], r["tf"]
            idf = math.log(1.0 + (N - dfb[t] + 0.5) / (dfb[t] + 0.5))
            s = r9(
                idf * tfv / (tfv + K1 * (1 - B + B * dl[d] / rd.avgdl)) * w
            )
            key = (d, t)
            per_term[key] = max(per_term.get(key, float("-inf")), s)
    scores = {}
    for (d, _), s in per_term.items():
        scores[d] = scores.get(d, 0.0) + r9(s)
    want = sorted(
        ((d, r9(s)) for d, s in scores.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    got = [
        (r["doc_id"], r["score"])
        for r in mfidx.cross_fields(Q, fields, k=10).collect()
    ]
    assert [(d, pytest.approx(s, abs=2e-9)) for d, s in want] == got
