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
    ('"ba ke"~2', Phrase("ba ke", 2)),
    ('"ba ke"~0', Phrase("ba ke", 0)),
    ('text:"ba ke"~3', Phrase("ba ke", 3)),
    ("keta^2", Term("keta", 2.0)),
    ("keta^0.5", Term("keta", 0.5)),
    ('"ba ke"^1.5', Phrase("ba ke", 0, 1.5)),
    ('"ba ke"~2^3', Phrase("ba ke", 2, 3.0)),
    ("wind*^1.5", Prefix("wind", 1.5)),
    ("w?nd^2", Wildcard("w?nd", 2.0)),
    ("keta~1^2", Fuzzy("keta", 1, 2.0)),
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
        "ke^2a",
        "keta^",
        '"a b"~',
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


def _py_slop_freq(toks: list[str], seq: list[str], slop: int) -> int:
    """Independent in-order sloppy-phrase evaluator: a start position is a
    match if the remaining terms appear in order with total displacement
    p_last - p_first - (m-1) <= slop (exhaustive search per start, NOT the
    engine's greedy walk — so the test checks greedy's optimality too)."""
    def ok_from(p: int, rest: list[str], budget: int) -> bool:
        if not rest:
            return True
        for q in range(p + 1, min(p + 1 + budget, len(toks) - len(rest)) + 1):
            if toks[q] == rest[0] and ok_from(q, rest[1:], budget - (q - p - 1)):
                return True
        return False

    n = 0
    for p, t in enumerate(toks):
        if t == seq[0] and ok_from(p, seq[1:], slop):
            n += 1
    return n


def _py_eval(docs, node) -> set[int]:
    if isinstance(node, Term):
        terms = tokenize_py(node.text)
        return {i for i, t in docs if any(x in t for x in terms)}
    if isinstance(node, Phrase):
        seq = tokenize_py(node.text)
        out = set()
        for i, t in docs:
            if _py_slop_freq(t, seq, node.slop):
                out.add(i)
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
    '"{PH}"~1',
    '"{PH}"~3',
    '"{SKIP}"~2',
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


def _common_skipgram(docs) -> str:
    """A token pair frequent at gap 2 (slop-2 hit, usually not adjacent) —
    makes the sloppy queries exercise genuinely non-exact matches."""
    from collections import Counter

    c = Counter()
    for _, t in docs[:80]:
        c.update(zip(t, t[2:]))
    (a, b), n = c.most_common(1)[0]
    assert n >= 3
    return f"{a} {b}"


@pytest.mark.parametrize("q", QUERIES, ids=QUERIES)
def test_execution_matches_python_eval(qs_index, q):
    rd, docs = qs_index
    q = q.replace("{PH}", _common_bigram(docs))
    q = q.replace("{SKIP}", _common_skipgram(docs))
    got = {r["doc_id"] for r in rd.query_string_docs(q).collect()}
    want = _py_eval(docs, parse_query_string(q))
    assert got == want, q
    assert want, f"degenerate test: {q} matched nothing"


def test_phrase_slop_freq_matches_exhaustive(qs_index):
    """phrase_docs(slop, with_freq) vs the exhaustive per-start evaluator:
    match sets AND freqs, at several slops, for 2- and 3-term phrases —
    the 3-term cases are where a non-optimal greedy walk would diverge
    (greedy must find an assignment whenever the exhaustive search does)."""
    from collections import Counter

    rd, docs = qs_index
    c2, c3 = Counter(), Counter()
    for _, t in docs[:80]:
        c2.update(zip(t, t[2:]))
        c3.update(zip(t, t[1:], t[2:]))
    (a, b), _ = c2.most_common(1)[0]
    (x, y, z), n3 = c3.most_common(1)[0]
    assert n3 >= 2
    cases = [(f"{a} {b}", 1), (f"{a} {b}", 2), (f"{a} {b}", 5),
             (f"{x} {y} {z}", 0), (f"{x} {y} {z}", 1), (f"{x} {y} {z}", 3)]
    for phrase, slop in cases:
        seq = phrase.split()
        got = {
            r["doc_id"]: r["phrase_freq"]
            for r in rd.phrase_docs(phrase, with_freq=True, slop=slop).collect()
        }
        want = {
            i: f
            for i, t in docs
            if (f := _py_slop_freq(t, seq, slop)) > 0
        }
        assert got == want, (phrase, slop)
        assert want, f"degenerate: {phrase}~{slop} matched nothing"
    # slop=0 through the sloppy path must equal the exact-intersection path
    exact = {r["doc_id"] for r in rd.phrase_docs(f"{x} {y} {z}").collect()}
    sloppy0 = {
        r["doc_id"]
        for r in rd.phrase_docs(f"{x} {y} {z}", with_freq=True, slop=0).collect()
    }
    assert exact == sloppy0


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


def test_query_string_boost_matches_python(qs_index):
    """Boosted scoring ladder: clause BM25 rounds to 9 dp, multiplies by
    the boost, re-rounds, per-doc sums re-round — replayed in python over
    the oracle index; the boost must actually change the ranking vs the
    unboosted query for the test to mean anything."""
    from collections import defaultdict

    from aether_elasticsearch_consumer_spark.oracle.engine import (
        build_oracle_index,
        score_query,
    )

    rd, docs = qs_index
    oracle = build_oracle_index([(i, " ".join(t)) for i, t in docs])
    total = defaultdict(float)
    for term, boost in [("keta", 3.0), ("rata", 1.0)]:
        for d, s in score_query(oracle, term, k=10**9):
            total[d] += round(s * boost, 9) if boost != 1.0 else s
    want = sorted(
        ((d, round(s, 9)) for d, s in total.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    got = [
        (r["doc_id"], r["score"])
        for r in rd.query_string_search("keta^3 rata", k=10).collect()
    ]
    assert got == want and got
    unboosted = [
        r["doc_id"] for r in rd.query_string_search("keta rata", k=10).collect()
    ]
    assert [d for d, _ in got] != unboosted, "boost did not change ranking"


def test_bool_minimum_should_match(qs_index):
    rd, docs = qs_index
    clauses = ["keta", "gera", "rata"]
    sets = [{i for i, t in docs if c in t} for c in clauses]
    for msm in (1, 2, 3):
        got = {
            r["doc_id"]
            for r in rd.bool_docs(
                should=clauses, minimum_should_match=msm
            ).collect()
        }
        want = {
            i
            for i, _ in docs
            if sum(i in s for s in sets) >= msm
        }
        assert got == want, msm
        assert want or msm == 3, f"degenerate at msm={msm}"
    # msm beyond the clause count matches nothing
    assert rd.bool_docs(should=clauses, minimum_should_match=4).count() == 0
    # msm with must: must filters, should count still enforced
    got = {
        r["doc_id"]
        for r in rd.bool_docs(
            must=["the"], should=clauses, minimum_should_match=2
        ).collect()
    }
    the = {i for i, t in docs if "the" in t}
    want = {i for i in the if sum(i in s for s in sets) >= 2}
    assert got == want and got
