"""Unordered (Lucene SloppyPhraseScorer) slop semantics.

Contracts:
- the engine's min-range-cover sweep equals an EXHAUSTIVE python evaluator
  (all position assignments, max(p_i − i) − min(p_i − i) ≤ slop) on random
  phrases over the webtext fixture — docs and freqs;
- transposed text matches at slop ≥ 2 and not below (the Lucene-doc
  example: "b a" matches ``"a b"~2``);
- unordered ⊇ in-order at equal slop, and equals it at slop 0/1 for
  two-term phrases whenever no transposition exists;
- repeated-term phrases raise (documented restriction).
"""

from __future__ import annotations

import random
from itertools import product

import pytest

from aether_elasticsearch_consumer_spark.fixtures.webtext import webtext_df
from aether_elasticsearch_consumer_spark.functions.tokenizer import tokenize_py
from aether_elasticsearch_consumer_spark.operators.topk import IndexReader
from aether_elasticsearch_consumer_spark.plans.index_build import IndexBuilder


@pytest.fixture(scope="module")
def uidx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("uslop")
    src = webtext_df(spark, 400, partitions=4)
    IndexBuilder(
        spark, str(root / "idx"), docs_per_segment=128, term_buckets=8,
        with_positions=True,
    ).build(src, fingerprint_extra="uslop400")
    docs = [
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(str(root / "idx/docs/data"))
        .select("doc_id", "text").collect()
    ]
    return IndexReader(spark, str(root / "idx")), docs


def py_unordered(toks: list[str], terms: list[str], slop: int) -> int:
    """Exhaustive evaluator: #distinct valid window-end shifted keys."""
    pos = {t: [p for p, w in enumerate(toks) if w == t] for t in terms}
    if any(not v for v in pos.values()):
        return 0
    ends = set()
    for assign in product(*(pos[t] for t in terms)):
        if len(set(assign)) != len(assign):
            continue
        ss = [p - i for i, p in enumerate(assign)]
        if max(ss) - min(ss) <= slop:
            ends.add(max(ss) + len(terms))  # the engine's biased window end
    return len(ends)


def test_transposition_needs_slop_2(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("utiny")
    rows = [
        (0, "alpha beta gap"),       # in order, adjacent
        (1, "beta alpha gap"),       # transposed, adjacent → span 2
        (2, "alpha gap beta"),       # in order, one gap → span 1
        (3, "beta gap gap alpha"),   # transposed, gapped → span 4
        (4, "alpha only here"),
    ]
    src = spark.createDataFrame(rows, "doc_id long, text string")
    IndexBuilder(
        spark, str(root / "i"), docs_per_segment=8, term_buckets=4,
        id_col="doc_id", with_positions=True,
    ).build(src, fingerprint_extra="utiny")
    rd = IndexReader(spark, str(root / "i"))

    def got(slop, in_order=False):
        return {
            r["doc_id"]
            for r in rd.phrase_docs(
                "alpha beta", slop=slop, in_order=in_order
            ).collect()
        }

    assert got(0) == {0}
    assert got(1) == {0, 2}
    assert got(2) == {0, 1, 2}          # transposition unlocks at 2
    assert got(4) == {0, 1, 2, 3}
    # in-order never admits the transposed docs
    assert got(4, in_order=True) == {0, 2}


def test_unordered_matches_exhaustive_random(uidx):
    rd, docs = uidx
    rng = random.Random(5)
    toks_by_doc = {d: tokenize_py(t) for d, t in docs}
    doc_ids = sorted(toks_by_doc)
    checked = 0
    for _ in range(12):
        # draw co-occurring terms from one document (shuffled → plenty of
        # out-of-order matches), evaluate across the whole corpus
        ts0 = toks_by_doc[rng.choice(doc_ids)]
        m = rng.choice([2, 2, 3])
        slop = rng.choice([0, 1, 2, 4, 7])
        # a tight window of the doc guarantees an assignment whose span
        # fits realistic slops; shuffling the draw covers out-of-order
        start = rng.randrange(max(1, len(ts0) - (m + slop)))
        window = list(dict.fromkeys(ts0[start : start + m + slop]))
        if len(window) < m:
            continue
        terms = rng.sample(window, m)
        got = {
            r["doc_id"]: r["phrase_freq"]
            for r in rd.phrase_docs(
                " ".join(terms), with_freq=True, slop=slop, in_order=False
            ).collect()
        }
        want = {
            d: f
            for d, ts in toks_by_doc.items()
            if (f := py_unordered(ts, terms, slop)) > 0
        }
        assert got == want, (terms, slop)
        checked += len(want)
    assert checked >= 5, "fixture too sparse for the sampled phrases"


def test_unordered_superset_of_in_order(uidx):
    rd, docs = uidx
    toks0 = tokenize_py(docs[0][1])
    # pick two distinct mid-doc tokens
    uniq = list(dict.fromkeys(toks0))
    phrase = f"{uniq[1]} {uniq[2]}"
    for slop in (1, 3):
        ordered = {
            r["doc_id"]
            for r in rd.phrase_docs(phrase, slop=slop, in_order=True).collect()
        }
        unordered = {
            r["doc_id"]
            for r in rd.phrase_docs(phrase, slop=slop, in_order=False).collect()
        }
        assert ordered <= unordered, (phrase, slop)


def test_repeated_terms_raise(uidx):
    rd, _ = uidx
    with pytest.raises(ValueError, match="disjoint"):
        rd.phrase_docs("keta gera keta", slop=2, in_order=False)
    # ordered path still serves repeated-term phrases
    rd.phrase_docs("keta gera keta", slop=2, in_order=True).collect()


def py_span_near(toks, terms, slop):
    """Exhaustive raw-position span_near (unordered): distinct positions,
    max − min <= slop + m − 1."""
    pos = {t: [p for p, w in enumerate(toks) if w == t] for t in terms}
    if any(not v for v in pos.values()):
        return False
    m = len(terms)
    for assign in product(*(pos[t] for t in terms)):
        if len(set(assign)) != len(assign):
            continue
        if max(assign) - min(assign) <= slop + m - 1:
            return True
    return False


def test_span_near_unordered_matches_exhaustive(uidx):
    rd, docs = uidx
    rng = random.Random(7)
    toks_by_doc = {d: tokenize_py(t) for d, t in docs}
    doc_ids = sorted(toks_by_doc)
    checked = 0
    for _ in range(8):
        ts0 = toks_by_doc[rng.choice(doc_ids)]
        m = rng.choice([2, 3])
        slop = rng.choice([0, 1, 3])
        start = rng.randrange(max(1, len(ts0) - (m + slop)))
        window = list(dict.fromkeys(ts0[start : start + m + slop]))
        if len(window) < m:
            continue
        terms = rng.sample(window, m)
        got = {
            r["doc_id"]
            for r in rd.span_near_docs(terms, slop=slop, in_order=False).collect()
        }
        want = {
            d for d, ts in toks_by_doc.items() if py_span_near(ts, terms, slop)
        }
        assert got == want, (terms, slop)
        checked += len(want)
    assert checked >= 5


def test_span_near_vs_phrase_slop_semantics(spark, tmp_path_factory):
    """span_near slop=0 unordered matches the adjacent transposition;
    match_phrase slop=0 never does (the defining difference)."""
    root = tmp_path_factory.mktemp("spansem")
    rows = [(0, "alpha beta x"), (1, "beta alpha x"), (2, "alpha x beta")]
    src = spark.createDataFrame(rows, "doc_id long, text string")
    from aether_elasticsearch_consumer_spark.plans.index_build import (
        IndexBuilder as IB,
    )

    IB(spark, str(root / "i"), docs_per_segment=8, term_buckets=4,
       id_col="doc_id", with_positions=True).build(src, fingerprint_extra="sn")
    rd = IndexReader(spark, str(root / "i"))
    near0 = {
        r["doc_id"]
        for r in rd.span_near_docs(["alpha", "beta"], 0, in_order=False).collect()
    }
    assert near0 == {0, 1}  # transposition allowed, gap not
    phrase0 = {
        r["doc_id"] for r in rd.phrase_docs("alpha beta", slop=0).collect()
    }
    assert phrase0 == {0}
    # ordered span_near == ordered sloppy window
    nearo = {
        r["doc_id"]
        for r in rd.span_near_docs(["alpha", "beta"], 1, in_order=True).collect()
    }
    assert nearo == {0, 2}
