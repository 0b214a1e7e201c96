"""Oracle parity — the correctness bar from BASELINE.json north_rule:
top-k docIDs and BM25 scores rank-identical to the single-node oracle on
the reference query set (mirrors the reference's ES max_score integration
assertions, /root/reference/consumer/tests/test__index_handler.py:143-196).
"""

from __future__ import annotations

import pytest

from aether_elasticsearch_consumer_spark.fixtures.webtext import (
    queries_set,
    webtext_df,
)
from aether_elasticsearch_consumer_spark.functions.html import extract_text_py
from aether_elasticsearch_consumer_spark.operators.topk import (
    IndexReader,
    naive_bm25_topk,
)
from aether_elasticsearch_consumer_spark.oracle.engine import (
    build_oracle_index,
    score_query,
)
from aether_elasticsearch_consumer_spark.plans.index_build import IndexBuilder

N_DOCS = 1000
N_QUERIES = 25


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index"))
    src = webtext_df(spark, N_DOCS, partitions=8)
    IndexBuilder(spark, d, docs_per_segment=256, term_buckets=8).build(
        src, fingerprint_extra={"n": N_DOCS}
    )
    return d


@pytest.fixture(scope="module")
def docs_pd(spark, index_dir):
    return (
        spark.read.parquet(f"{index_dir}/docs/data")
        .select("doc_id", "url", "text")
        .toPandas()
        .sort_values("doc_id")
    )


@pytest.fixture(scope="module")
def oracle(docs_pd):
    return build_oracle_index(
        list(zip(docs_pd["doc_id"], docs_pd["text"])), profile="ascii"
    )


def test_extraction_byte_identical(spark):
    """input_hint invariant: byte-identical extracted text per url."""
    pdf = webtext_df(spark, 200, partitions=4).toPandas()
    for _, row in pdf.iterrows():
        assert extract_text_py(row["html"]) == row["text"], row["url"]


def test_doc_ids_dense_and_deterministic(spark, index_dir, docs_pd):
    ids = docs_pd["doc_id"].to_numpy()
    assert ids.min() == 0 and ids.max() == N_DOCS - 1
    assert len(set(ids)) == N_DOCS
    # re-assign at a different parallelism level → identical mapping
    from aether_elasticsearch_consumer_spark.plans.index_build import build_docs_df

    again = (
        build_docs_df(webtext_df(spark, N_DOCS, partitions=3))
        .select("url", "doc_id")
        .toPandas()
    )
    merged = docs_pd.merge(again, on="url", suffixes=("", "_again"))
    assert (merged["doc_id"] == merged["doc_id_again"]).all()


def test_stats_match_oracle(spark, index_dir, oracle):
    st = spark.read.parquet(f"{index_dir}/stats/data").collect()[0]
    assert st["N"] == oracle.N
    assert st["avgdl"] == pytest.approx(oracle.avgdl, rel=1e-12)


def test_term_stats_match_oracle(spark, index_dir, oracle):
    got = {
        r["term"]: r["df"]
        for r in spark.read.parquet(f"{index_dir}/term_stats/data").collect()
    }
    want = {t: len(p[0]) for t, p in oracle.postings.items()}
    assert got == want


@pytest.mark.parametrize("qi", range(N_QUERIES))
def test_topk_rank_identical(spark, index_dir, oracle, qi):
    q = queries_set()[qi]
    reader = IndexReader(spark, index_dir)
    got = [
        (r["doc_id"], r["score"])
        for r in reader.search(q["query"], k=q["k"]).collect()
    ]
    want = [(d, round(s, 9)) for d, s in score_query(oracle, q["query"], k=q["k"])]
    assert [g[0] for g in got] == [w[0] for w in want], q
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9), (q, gd)


def test_naive_scorer_matches_oracle(spark, index_dir, oracle):
    docs = spark.read.parquet(f"{index_dir}/docs/data")
    q = queries_set()[0]
    got = [
        (r["doc_id"], r["score"])
        for r in naive_bm25_topk(docs, q["query"], k=10).collect()
    ]
    want = score_query(oracle, q["query"], k=10)
    assert [g[0] for g in got] == [w[0] for w in want]


def test_empty_and_absent_queries(spark, index_dir):
    reader = IndexReader(spark, index_dir)
    assert reader.search("", k=10).count() == 0
    assert reader.search("zzabsentnowhere42", k=10).count() == 0


def test_resume_skips_completed_stages(spark, index_dir):
    """Re-running the build with the same fingerprint is a no-op (hash-gated
    resume, reference idiom index_handler.py:341-343)."""
    src = webtext_df(spark, N_DOCS, partitions=8)
    b = IndexBuilder(spark, index_dir, docs_per_segment=256, term_buckets=8)
    manifests = b.build(src, fingerprint_extra={"n": N_DOCS})
    # elapsed recorded at first build; identical manifest returned on resume
    assert all("fingerprint" in m for m in manifests.values())


def test_edge_k_values(spark, index_dir):
    reader = IndexReader(spark, index_dir)
    assert reader.search("the", k=0).count() == 0
    assert reader.search("the", k=-3).count() == 0
    assert reader.search("the", k=1).count() == 1
    # k far beyond corpus: returns all matching docs, still ordered
    big = reader.search("keta", k=10**6).collect()
    assert all(
        big[i]["score"] >= big[i + 1]["score"] for i in range(len(big) - 1)
    )


def test_empty_text_docs_indexable(spark, tmp_path):
    src = spark.createDataFrame(
        [("https://x/1", "hello world"), ("https://x/2", ""), ("https://x/3", "!!!")],
        "url string, text string",
    )
    d = str(tmp_path / "edge_idx")
    IndexBuilder(spark, d, docs_per_segment=4, term_buckets=2).build(
        src, fingerprint_extra="edge"
    )
    reader = IndexReader(spark, d)
    assert reader.N == 3
    hits = reader.search("hello", k=10).collect()
    assert len(hits) == 1


def test_doc_id_bucket_count_invariance(spark, tmp_path_factory):
    """Changing the doc-id bucket count only permutes the url→id mapping:
    ids stay dense in [0, N) and search results are identical per url
    (the documented sizing rule lets n_buckets grow with the cluster
    without changing results)."""
    from pyspark.sql import functions as F

    from aether_elasticsearch_consumer_spark.fixtures.webtext import webtext_df
    from aether_elasticsearch_consumer_spark.operators.topk import IndexReader
    from aether_elasticsearch_consumer_spark.plans.index_build import IndexBuilder

    root = tmp_path_factory.mktemp("bkts")
    src = webtext_df(spark, 400, partitions=4).cache()
    readers = {}
    for nb in (16, 128):
        d = str(root / f"idx{nb}")
        IndexBuilder(
            spark, d, docs_per_segment=128, term_buckets=8, id_buckets=nb
        ).build(src, fingerprint_extra=f"nb{nb}")
        ids = [r["doc_id"] for r in
               spark.read.parquet(d + "/docs/data").select("doc_id").collect()]
        assert sorted(ids) == list(range(400)), nb  # dense at any count
        readers[nb] = (IndexReader(spark, d),
                       spark.read.parquet(d + "/docs/data").select("doc_id", "url"))
    for q in ["keta", "ba ke ra", "the"]:
        res = {}
        for nb, (rd, docs) in readers.items():
            hits = rd.search(q, k=10).join(docs, "doc_id")
            res[nb] = sorted((r["url"], r["score"]) for r in hits.collect())
        assert res[16] == res[128], q
    src.unpersist()


def test_degenerate_corpora(spark, tmp_path_factory):
    """Builds and searches must survive degenerate inputs: empty-text
    docs (zero tokens -> no postings but real doclens entries), a
    single-doc corpus, and queries over terms that exist nowhere."""
    from pyspark.sql import functions as F

    from aether_elasticsearch_consumer_spark.operators.topk import IndexReader
    from aether_elasticsearch_consumer_spark.plans.index_build import IndexBuilder

    root = tmp_path_factory.mktemp("degen")
    rows = [
        ("https://a.example/1", "alpha beta gamma alpha"),
        ("https://a.example/2", ""),            # empty text
        ("https://a.example/3", "!!! ???"),     # tokenizes to nothing
        ("https://a.example/4", "beta"),
    ]
    src = spark.createDataFrame(rows, "url string, text string")
    b = IndexBuilder(spark, str(root / "idx"), docs_per_segment=2, term_buckets=4)
    b.build(src, fingerprint_extra="degen")
    r = IndexReader(spark, str(root / "idx"))
    assert r.N == 4
    hits = r.search("alpha beta", k=10).collect()
    assert len(hits) == 2 and hits[0]["score"] > hits[1]["score"]
    assert r.search("zzznope", k=5).collect() == []
    assert r.match_docs("alpha beta", "and").count() == 1
    assert r.match_docs("alpha beta", "or").count() == 2

    one = spark.createDataFrame([("https://b.example/1", "solo doc words")],
                                "url string, text string")
    b2 = IndexBuilder(spark, str(root / "one"), docs_per_segment=8, term_buckets=2)
    b2.build(one, fingerprint_extra="one")
    r2 = IndexReader(spark, str(root / "one"))
    got = r2.search("solo", k=3).collect()
    assert [h["doc_id"] for h in got] == [0]


def test_adversarial_query_shapes(spark, index_dir, oracle):
    """Rank identity under hostile shapes: huge k (past the corpus), long
    disjunctions, repeated query terms (deduped by the analyzer on both
    sides), and all-stopword queries (worst-case exhaustive scoring)."""
    from aether_elasticsearch_consumer_spark.fixtures.webtext import vocab

    from aether_elasticsearch_consumer_spark.operators.topk import IndexReader

    reader = IndexReader(spark, index_dir)
    v = vocab()
    shapes = [
        ("the", 1000),                                   # k > matches? head term, huge k
        ("the the the", 10),                             # repeated terms
        (" ".join(v[60:68]), 25),                        # 8-term disjunction
        (f"{v[100]} zzznope1 zzznope2 {v[101]}", 10),    # mixed absent
        ("the of and to in", 10),                        # all stopwords
    ]
    for q, k in shapes:
        got = [
            (r["doc_id"], r["score"])
            for r in reader.search(q, k=k).collect()
        ]
        want = [(d, round(s, 9)) for d, s in score_query(oracle, q, k=k)]
        assert got == want, (q, k)


def test_concurrent_searches_are_deterministic(spark, index_dir):
    """One reader, many threads: concurrent searches must neither
    interfere nor produce different results than serial execution."""
    import concurrent.futures as cf

    from aether_elasticsearch_consumer_spark.fixtures.webtext import vocab
    from aether_elasticsearch_consumer_spark.operators.topk import IndexReader

    reader = IndexReader(spark, index_dir)
    v = vocab()
    queries = [f"{v[50 + i]} {v[200 + i]}" for i in range(8)]
    serial = {
        q: [(r["doc_id"], r["score"]) for r in reader.search(q, k=10).collect()]
        for q in queries
    }

    def run(q):
        return q, [
            (r["doc_id"], r["score"]) for r in reader.search(q, k=10).collect()
        ]

    with cf.ThreadPoolExecutor(max_workers=8) as ex:
        for q, res in ex.map(run, queries):
            assert res == serial[q], q


def test_crash_windows_in_stage_commit(spark, tmp_path):
    """run_stage's two crash windows, exercised end-to-end on a real
    build: (a) output dir renamed but manifest never written (crash
    between the two) — the stage must re-run and converge; (b) a stale
    __tmp__ dir from a killed attempt — must be swept, never merged.
    After both injections the index answers queries identically to an
    untouched build."""
    import shutil

    src = webtext_df(spark, 120, partitions=2)
    kw = dict(docs_per_segment=32, term_buckets=4)
    ref = str(tmp_path / "ref")
    IndexBuilder(spark, ref, **kw).build(src, fingerprint_extra="cw")
    want = [
        (r["doc_id"], r["score"])
        for r in IndexReader(spark, ref).search("keta gera the", k=10).collect()
    ]

    d = str(tmp_path / "crash")
    IndexBuilder(spark, d, **kw).build(src, fingerprint_extra="cw")
    # (a) crash between rename and manifest write of term_stats
    import os

    os.remove(os.path.join(d, "term_stats", "_MANIFEST.json"))
    # (b) stale tmp dir from a killed postings attempt
    stale = os.path.join(d, "postings.__tmp__")
    os.makedirs(os.path.join(stale, "data"), exist_ok=True)
    with open(os.path.join(stale, "data", "junk.parquet"), "wb") as f:
        f.write(b"not parquet")
    IndexBuilder(spark, d, **kw).build(src, fingerprint_extra="cw")
    assert not os.path.exists(stale)
    got = [
        (r["doc_id"], r["score"])
        for r in IndexReader(spark, d).search("keta gera the", k=10).collect()
    ]
    assert got == want and got


def test_webtext_arrow_generation_matches_per_doc_generator(spark):
    """Round 6: webtext_df moved from mapInPandas to mapInArrow with
    column-wise batch construction. The table must stay BIT-IDENTICAL to
    the per-doc counter-based generator regardless of partitioning."""
    import datetime as dt

    from aether_elasticsearch_consumer_spark.fixtures.webtext import (
        _zipf_cdf,
        gen_doc,
        vocab,
        webtext_df,
    )

    rows = webtext_df(spark, 300, partitions=5).orderBy("url").collect()
    voc, cdf = vocab(), _zipf_cdf()
    exp = sorted((gen_doc(i, voc, cdf) for i in range(300)), key=lambda r: r[0])
    assert len(rows) == 300
    for r, e in zip(rows, exp):
        assert (r["url"], bytes(r["html"]), r["text"], r["lang"]) == (
            e[0], e[2], e[3], e[4],
        )
        assert r["warc_ts"].replace(tzinfo=dt.timezone.utc) == e[1]
