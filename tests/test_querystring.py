"""Lucene query-string parser + index-backed execution.

Parse-table goldens pin the grammar (the reference's saved-search query
language, visualization.py:46-53); execution parity checks every operator
combination against an independent pure-Python evaluation of the same
query over the tokenized corpus.
"""

from __future__ import annotations

import fnmatch

import pytest

from aether_elasticsearch_consumer_spark.fixtures.webtext import webtext_df
from aether_elasticsearch_consumer_spark.functions.querystring import (
    Bool,
    Fuzzy,
    Phrase,
    Prefix,
    Term,
    Wildcard,
    parse_query_string,
)
from aether_elasticsearch_consumer_spark.functions.tokenizer import tokenize_py
from aether_elasticsearch_consumer_spark.operators.topk import IndexReader
from aether_elasticsearch_consumer_spark.plans.index_build import IndexBuilder

GOLDENS = [
    ("keta", Term("keta")),
    ('"ba ke"', Phrase("ba ke")),
    ("wind*", Prefix("wind")),
    ("w?nd", Wildcard("w?nd")),
    ("ke*a", Wildcard("ke*a")),
    ("keta~", Fuzzy("keta", 2)),
    ("keta~1", Fuzzy("keta", 1)),
    ("text:keta", Term("keta")),
    ('text:"ba ke"', Phrase("ba ke")),
    ("keta gera", Bool(should=(Term("keta"), Term("gera")))),
    ("keta OR gera", Bool(should=(Term("keta"), Term("gera")))),
    ("keta AND gera", Bool(must=(Term("keta"), Term("gera")))),
    (
        "keta AND gera AND holi",
        Bool(must=(Term("keta"), Term("gera"), Term("holi"))),
    ),
    (
        "keta -gera",
        Bool(should=(Term("keta"),), must_not=(Term("gera"),)),
    ),
    (
        "+keta gera",
        Bool(must=(Term("keta"),), should=(Term("gera"),)),
    ),
    (
        "keta AND NOT gera",
        Bool(must=(Term("keta"),), must_not=(Term("gera"),)),
    ),
    (
        '"ba ke" AND ke* -holi',
        Bool(
            must=(
                Bool(must=(Phrase("ba ke"), Prefix("ke")),),
            ),
            must_not=(Term("holi"),),
        ),
    ),
    (
        "(keta OR gera) AND holi",
        Bool(
            must=(
                Bool(should=(Term("keta"), Term("gera"))),
                Term("holi"),
            )
        ),
    ),
]


@pytest.mark.parametrize("q,want", GOLDENS, ids=[g[0] for g in GOLDENS])
def test_parse_goldens(q, want):
    assert parse_query_string(q) == want


@pytest.mark.parametrize(
    "q",
    [
        "",
        "-keta",
        "NOT keta",
        "keta^2",
        '"a b"~3',
        "[1 TO 2]",
        "unknownfield:keta",
        "(keta",
        "keta)",
        "field:",
        "~2",
    ],
)
def test_parse_rejects(q):
    with pytest.raises(ValueError):
        parse_query_string(q)


# ---------------------------------------------------------------------------
# execution parity vs a pure-Python evaluator
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def qs_index(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qsidx")
    src = webtext_df(spark, 400, partitions=4)
    IndexBuilder(
        spark, str(root / "idx"), docs_per_segment=128, term_buckets=8,
        with_positions=True,
    ).build(src, fingerprint_extra="qs400")
    docs = [
        (r["doc_id"], tokenize_py(r["text"]))
        for r in spark.read.parquet(str(root / "idx/docs/data"))
        .select("doc_id", "text").collect()
    ]
    return IndexReader(spark, str(root / "idx")), docs


def _py_eval(docs, node) -> set[int]:
    if isinstance(node, Term):
        terms = tokenize_py(node.text)
        return {i for i, t in docs if any(x in t for x in terms)}
    if isinstance(node, Phrase):
        seq = tokenize_py(node.text)
        out = set()
        for i, t in docs:
            for j in range(len(t) - len(seq) + 1):
                if t[j : j + len(seq)] == seq:
                    out.add(i)
                    break
        return out
    if isinstance(node, Prefix):
        return {i for i, t in docs if any(x.startswith(node.text) for x in t)}
    if isinstance(node, Wildcard):
        return {
            i
            for i, t in docs
            if any(fnmatch.fnmatchcase(x, node.pattern) for x in t)
        }
    if isinstance(node, Fuzzy):
        import Levenshtein  # noqa: F401  (not in container)

        raise AssertionError("unused")
    if isinstance(node, Bool):
        universe = {i for i, _ in docs}
        if node.must:
            base = universe
            for m in node.must:
                base = base & _py_eval(docs, m)
        else:
            base = set()
            for s in node.should:
                base |= _py_eval(docs, s)
        for n in node.must_not:
            base -= _py_eval(docs, n)
        return base
    raise TypeError(node)


QUERIES = [
    "keta",
    "keta gera",
    "the AND keta",
    '"{PH}"',
    '"{PH}" AND ke* -holi',
    "(keta OR gera) AND NOT holi",
    "+keta -gera rata",
    "text:keta AND w?pora",
]


def _common_bigram(docs) -> str:
    """A real adjacent token pair occurring in several docs."""
    from collections import Counter

    c = Counter()
    for _, t in docs[:80]:
        c.update(zip(t, t[1:]))
    (a, b), n = c.most_common(1)[0]
    assert n >= 3
    return f"{a} {b}"


@pytest.mark.parametrize("q", QUERIES, ids=QUERIES)
def test_execution_matches_python_eval(qs_index, q):
    rd, docs = qs_index
    q = q.replace("{PH}", _common_bigram(docs))
    got = {r["doc_id"] for r in rd.query_string_docs(q).collect()}
    want = _py_eval(docs, parse_query_string(q))
    assert got == want, q
    assert want, f"degenerate test: {q} matched nothing"


def test_fuzzy_execution_matches_expansion(qs_index):
    rd, docs = qs_index
    got = {r["doc_id"] for r in rd.query_string_docs("keta~1").collect()}
    terms = set(rd.expand_fuzzy("keta", 1))
    want = {i for i, t in docs if terms & set(t)}
    assert got == want and got


def test_query_string_scored_matches_python(qs_index):
    """Scored execution: must/should term clauses each contribute their
    9-dp-rounded BM25, sums re-round, filter = boolean semantics — the
    exact ladder replicated in python over the oracle index."""
    from collections import defaultdict

    from aether_elasticsearch_consumer_spark.oracle.engine import (
        build_oracle_index,
        score_query,
    )

    rd, docs = qs_index
    # the fixture stores tokenized docs; rebuild texts for the oracle
    oracle = build_oracle_index([(i, " ".join(t)) for i, t in docs])
    total = defaultdict(float)
    for term in ["the", "keta", "rata"]:
        for d, s in score_query(oracle, term, k=10**9):
            total[d] += s  # score_query already rounds each part to 9 dp
    filt = {
        i for i, t in docs if "the" in t and "keta" in t
    }
    want = sorted(
        ((d, round(s, 9)) for d, s in total.items() if d in filt),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    got = [
        (r["doc_id"], r["score"])
        for r in rd.query_string_search("the AND keta rata", k=10).collect()
    ]
    assert got == want and got


def test_parser_is_total():
    """Fuzz: the parser either returns an AST or raises ValueError — never
    any other exception (parsers attract IndexError/RecursionError on
    adversarial input)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.text(
            alphabet='ab ()"+-*?~:ANDORT\\^/[]{}',
            min_size=0,
            max_size=40,
        )
    )
    def fuzz(q):
        try:
            parse_query_string(q)
        except ValueError:
            pass

    fuzz()
