"""Banded fuzzy/suggest expansion (deletion-neighborhood sidecar).

Contract: with the sidecar present, ``expand_fuzzy``/``suggest_terms``
return BIT-IDENTICAL results to the full-dictionary Levenshtein scan
while reading only the needle's variant-bucket directories — the
symmetric-delete lemma makes the banded candidate set a superset of the
Levenshtein ball, and the exact JVM re-check trims it back.
"""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from aether_elasticsearch_consumer_spark.fixtures.webtext import webtext_df
from aether_elasticsearch_consumer_spark.functions.tokenizer import tokenize_py
from aether_elasticsearch_consumer_spark.operators.topk import IndexReader
from aether_elasticsearch_consumer_spark.plans.fuzzy_index import (
    delete_variants_py,
    fuzzy_meta,
)
from aether_elasticsearch_consumer_spark.plans.index_build import IndexBuilder


@pytest.fixture(scope="module")
def banded(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("fuzzband")
    src = webtext_df(spark, 400, partitions=4)
    IndexBuilder(
        spark, str(root / "idx"), docs_per_segment=128, term_buckets=8
    ).build(src, fingerprint_extra="fz400")
    plain = IndexReader(spark, str(root / "idx"))
    plain.ensure_fuzzy_sidecar(max_edits=2)
    rd = IndexReader(spark, str(root / "idx"))  # fresh reader sees sidecar
    docs = [
        (r["doc_id"], tokenize_py(r["text"]))
        for r in spark.read.parquet(str(root / "idx/docs/data"))
        .select("doc_id", "text")
        .collect()
    ]
    return rd, docs


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


NEEDLES = ["keta", "kxta", "windoq", "ho", "zzznope", "a"]


@pytest.mark.parametrize("needle", NEEDLES)
@pytest.mark.parametrize("edits", [1, 2])
def test_banded_expansion_matches_bruteforce(banded, needle, edits):
    rd, docs = banded
    vocab = {t for _, toks in docs for t in toks}
    want = sorted(t for t in vocab if _lev(t, needle) <= edits)
    assert rd._fuzzy_meta() is not None
    got = rd.expand_fuzzy(needle, max_edits=edits, max_terms=100_000)
    assert got == want, needle


def test_banded_suggest_matches_fallback(banded, spark, tmp_path_factory):
    rd, docs = banded
    # an identical index WITHOUT the sidecar = the fallback scan path
    root = tmp_path_factory.mktemp("fuzzplain")
    IndexBuilder(
        spark, str(root / "idx"), docs_per_segment=128, term_buckets=8
    ).build(webtext_df(spark, 400, partitions=4), fingerprint_extra="fz400")
    plain = IndexReader(spark, str(root / "idx"))
    assert plain._fuzzy_meta() is None
    for needle in ["windoq", "keta", "kxta"]:
        got = [(r["term"], r["df"]) for r in rd.suggest_terms(needle, 3, 1).collect()]
        want = [(r["term"], r["df"]) for r in plain.suggest_terms(needle, 3, 1).collect()]
        assert got == want, needle
    # non-degenerate: the fixture vocabulary must yield suggestions for
    # at least the in-vocabulary needle's neighbors
    assert [r["term"] for r in rd.suggest_terms("kxta", 3, 1).collect()]


def test_banded_read_is_directory_pruned(banded):
    """The scale property: the banded candidate read must list ONLY the
    needle's variant-bucket directories — a strict subset of the sidecar
    (the whole point vs the full-dictionary scan)."""
    rd, _ = banded
    meta = fuzzy_meta(rd.dir)
    needle, edits = "windoq", 1
    cand = rd._fuzzy_candidates(needle, edits)
    files = cand.inputFiles()
    from aether_elasticsearch_consumer_spark.functions.xxhash import (
        spark_pmod_bucket,
    )

    allowed = {
        spark_pmod_bucket(v, meta["variant_buckets"])
        for v in delete_variants_py(needle, edits)
    }
    assert files
    for f in files:
        assert "vbucket=" in f
        vb = int(f.split("vbucket=")[1].split("/")[0])
        assert vb in allowed, f
    all_files = glob.glob(str(rd.dir / "fuzzy/variants/data/vbucket=*/*.parquet"))
    assert len(files) < len(all_files)
    # and the variant predicate reaches the parquet scan (row-group
    # min/max pruning inside the probed dirs — files are variant-sorted)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "variant" in plan.split("PushedFilters")[1][:300]


def test_sidecar_build_is_idempotent(banded):
    rd, _ = banded
    m1 = rd.ensure_fuzzy_sidecar(max_edits=2)
    m2 = rd.ensure_fuzzy_sidecar(max_edits=2)
    assert m1["fingerprint"] == m2["fingerprint"]


def test_higher_edits_than_sidecar_falls_back(banded):
    """A query needing more edits than the sidecar stores must fall back
    to the exact full scan (never silently under-match)."""
    rd, docs = banded
    vocab = {t for _, toks in docs for t in toks}
    needle = "keta"
    want = sorted(t for t in vocab if _lev(t, needle) <= 3)
    got = rd.expand_fuzzy(needle, max_edits=3, max_terms=100_000)
    assert got == want
