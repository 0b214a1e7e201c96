"""Resource store / job status (§3.3 API surface) + unicode-profile
end-to-end index parity."""

from __future__ import annotations

import jsonschema
import pytest

from aether_elasticsearch_consumer_spark.operators.topk import IndexReader
from aether_elasticsearch_consumer_spark.oracle.engine import (
    build_oracle_index,
    score_query,
)
from aether_elasticsearch_consumer_spark.plans.index_build import IndexBuilder
from aether_elasticsearch_consumer_spark.plans.resources import (
    ResourceStore,
    job_status,
)

GOOD_SUB = {
    "id": "s1",
    "topic_pattern": "tenant.*",
    "topic_options": {
        "filter_required": True,
        "filter_field_path": "status",
        "filter_pass_values": ["ok"],
        "masking_annotation": "@aether_masking",
        "masking_levels": ["public", "private"],
        "masking_emit_level": "public",
    },
}


class TestResourceStore:
    def test_crud_and_validation(self, tmp_path):
        store = ResourceStore(tmp_path, "tenant_a")
        assert store.describe() == ["job", "subscription"]
        assert store.validate("subscription", GOOD_SUB) == []
        store.add("subscription", GOOD_SUB)
        assert store.list("subscription") == ["s1"]
        assert store.get("subscription", "s1")["topic_pattern"] == "tenant.*"
        # invalid: unknown property
        bad = {**GOOD_SUB, "nope": 1}
        assert store.validate("subscription", bad)
        with pytest.raises(jsonschema.ValidationError):
            store.add("subscription", bad)
        # job referencing the subscription
        store.add("job", {"id": "j1", "subscriptions": ["s1"],
                          "index": {"profile": "unicode"}})
        assert store.list("job") == ["j1"]
        assert store.delete("subscription", "s1")
        assert store.list("subscription") == []
        assert not store.delete("subscription", "s1")

    def test_tenant_isolation(self, tmp_path):
        a = ResourceStore(tmp_path, "tenant_a")
        b = ResourceStore(tmp_path, "tenant_b")
        a.add("subscription", GOOD_SUB)
        assert b.list("subscription") == []

    def test_job_status_absent(self, tmp_path):
        assert job_status(tmp_path / "nope")["state"] == "absent"


UNICODE_DOCS = [
    ("u0", "Ĝis la revido! Ĉi tiu teksto estas esperanta kaj ĝoja."),
    ("u1", "Überraschung: größte Straße, schöne Grüße aus München."),
    ("u2", "Ĉi tiu alia teksto parolas pri ĝojo kaj muziko ĉie."),
    ("u3", "plain ascii text with no diacritics at all here"),
    ("u4", "größte Überraschung in München: Straße voller Musik."),
]


class TestUnicodeProfile:
    def test_unicode_index_matches_oracle(self, spark, tmp_path):
        """The unicode analyzer (Arrow pandas_udf path) must be
        rank-identical to the oracle end-to-end through build + search."""
        src = spark.createDataFrame(
            [(f"https://x.example/{i}", t) for i, t in UNICODE_DOCS],
            "url string, text string",
        )
        d = str(tmp_path / "uidx")
        IndexBuilder(
            spark, d, profile="unicode", docs_per_segment=4, term_buckets=4
        ).build(src, fingerprint_extra="unicode5")
        docs = (
            spark.read.parquet(f"{d}/docs/data")
            .select("doc_id", "text")
            .toPandas()
        )
        oracle = build_oracle_index(
            list(zip(docs["doc_id"], docs["text"])), profile="unicode"
        )
        reader = IndexReader(spark, d)
        assert reader.profile == "unicode"
        for q in ["ĝoja ĉi", "GRÖSSTE Straße", "plain", "münchen musik"]:
            got = [(r["doc_id"], r["score"]) for r in reader.search(q, k=5).collect()]
            want = score_query(oracle, q, k=5)
            assert [g[0] for g in got] == [w[0] for w in want], q
            for (gd, gs), (wd, ws) in zip(got, want):
                assert gs == pytest.approx(ws, abs=1e-9)

    def test_job_status_complete(self, spark, tmp_path):
        src = spark.createDataFrame(
            [("https://x/1", "hello world")], "url string, text string"
        )
        d = str(tmp_path / "sidx")
        IndexBuilder(spark, d, docs_per_segment=4, term_buckets=2).build(
            src, fingerprint_extra="one"
        )
        st = job_status(d)
        assert st["state"] == "complete"
        assert set(st["stages"]) >= {"docs", "doclens", "stats", "postings", "term_stats"}


def test_pause_resume_cycle(spark, tmp_path):
    """Cooperative pause: the builder refuses to start/continue while the
    flag exists; resume + re-run continues losslessly from checkpoints."""
    import pytest as _pytest

    from aether_elasticsearch_consumer_spark.fixtures.webtext import webtext_df
    from aether_elasticsearch_consumer_spark.plans.index_build import IndexBuilder
    from aether_elasticsearch_consumer_spark.plans.resources import (
        JobPausedError,
        job_status,
        pause_job,
        resume_job,
    )

    d = str(tmp_path / "idx")
    src = webtext_df(spark, 60, partitions=2)
    pause_job(d)
    b = IndexBuilder(spark, d, docs_per_segment=32, term_buckets=4)
    with _pytest.raises(JobPausedError):
        b.build(src, fingerprint_extra="pr")
    assert job_status(d)["state"] == "paused"
    assert resume_job(d) and not resume_job(d)
    m = b.build(src, fingerprint_extra="pr")
    assert job_status(d)["state"] == "complete"
    assert set(m) == {"docs", "doclens", "stats", "postings", "term_stats"}


def test_unicode_round3_surface(spark, tmp_path):
    """Round-3 reader ops on a unicode-profile positional index: phrase,
    highlight, query-string, tombstones — the Arrow tokenizer path must
    serve them identically to the python analyzer."""
    from aether_elasticsearch_consumer_spark.functions.tokenizer import tokenize_py
    from aether_elasticsearch_consumer_spark.plans.tombstones import apply_deletes

    src = spark.createDataFrame(
        [(f"https://x.example/{i}", t) for i, t in UNICODE_DOCS],
        "url string, text string",
    )
    d = str(tmp_path / "uidx3")
    IndexBuilder(
        spark, d, profile="unicode", docs_per_segment=4, term_buckets=4,
        with_positions=True,
    ).build(src, fingerprint_extra="unicode-r3")
    rd = IndexReader(spark, d)
    docs = [
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(f"{d}/docs/data")
        .select("doc_id", "text").collect()
    ]
    toks = {i: tokenize_py(t, "unicode") for i, t in docs}
    # phrase: pick a real bigram from doc 0
    big = f"{toks[0][0]} {toks[0][1]}"
    want = {
        i for i, tt in toks.items()
        if any(tt[j:j+2] == toks[0][:2] for j in range(len(tt) - 1))
    }
    got = {r["doc_id"] for r in rd.phrase_docs(big).collect()}
    assert got == want and got
    # highlight on a unicode term
    term = toks[0][0]
    frs = {r["doc_id"]: r["fragment"] for r in rd.highlight(term, window=2).collect()}
    for i, frag in frs.items():
        assert f"<em>{term}</em>" in frag
    assert frs
    # query-string with a unicode atom
    hits = {r["doc_id"] for r in rd.query_string_docs(f'"{big}"').collect()}
    assert hits == want
    # tombstone a matching doc; it must vanish from all of the above
    victim = sorted(want)[0]
    apply_deletes(spark, d, [victim])
    rd2 = IndexReader(spark, d)
    assert victim not in {r["doc_id"] for r in rd2.phrase_docs(big).collect()}
    assert victim not in {
        r["doc_id"] for r in rd2.highlight(term, window=2).collect()
    }


def test_unicode_round4_surface(spark, tmp_path):
    """Round-4 reader ops on a unicode-profile positional index: phrase
    slop, phrase-prefix, banded fuzzy (deletion variants over non-ASCII
    codepoints), query-level highlight, and fuzzy-after-tombstones — the
    Arrow tokenizer and the python analyzer must agree on all of them."""
    from aether_elasticsearch_consumer_spark.functions.tokenizer import tokenize_py
    from aether_elasticsearch_consumer_spark.plans.tombstones import apply_deletes

    src = spark.createDataFrame(
        [(f"https://x.example/{i}", t) for i, t in UNICODE_DOCS],
        "url string, text string",
    )
    d = str(tmp_path / "uidx4")
    IndexBuilder(
        spark, d, profile="unicode", docs_per_segment=4, term_buckets=4,
        with_positions=True,
    ).build(src, fingerprint_extra="unicode-r4")
    rd = IndexReader(spark, d)
    docs = [
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(f"{d}/docs/data")
        .select("doc_id", "text").collect()
    ]
    toks = {i: tokenize_py(t, "unicode") for i, t in docs}
    a, b = toks[0][0], toks[0][2]  # gap-2 pair from doc 0
    # slop: a ... b within window 1+slop, in order
    for slop in (1, 3):
        got = {
            r["doc_id"]
            for r in rd.phrase_docs(f"{a} {b}", slop=slop).collect()
        }
        want = {
            i
            for i, tt in toks.items()
            if any(
                tt[p] == a and b in tt[p + 1:p + 2 + slop]
                for p in range(len(tt))
            )
        }
        assert got == want, slop
    assert rd.phrase_docs(f"{a} {b}", slop=3).count() >= 1
    # phrase-prefix: head a, prefix = first char of b
    pfx = b[0]
    exp = {t for tt in toks.values() for t in tt if t.startswith(pfx)}
    got = {
        r["doc_id"]
        for r in rd.phrase_prefix_docs(f"{a} {pfx}").collect()
    }
    want = {
        i
        for i, tt in toks.items()
        if any(tt[p] == a and p + 1 < len(tt) and tt[p + 1] in exp
               for p in range(len(tt)))
    }
    assert got == want
    # banded fuzzy over non-ASCII codepoints: sidecar variants must use
    # codepoint deletion on both sides (python needle vs Catalyst dict)
    rd.ensure_fuzzy_sidecar(max_edits=2)
    rd2 = IndexReader(spark, d)
    vocab = {t for tt in toks.values() for t in tt}

    def lev(x, y):
        dp = list(range(len(y) + 1))
        for i, cx in enumerate(x, 1):
            prev, dp[0] = dp[0], i
            for j, cy in enumerate(y, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (cx != cy))
        return dp[len(y)]

    needle = max(vocab, key=len)  # longest unicode term
    for e in (1, 2):
        got_f = rd2.expand_fuzzy(needle, max_edits=e, max_terms=10_000)
        want_f = sorted(t for t in vocab if lev(t, needle) <= e)
        assert got_f == want_f, (needle, e)
    # query-level highlight over a unicode query
    frs = {
        r["doc_id"]: r["fragment"]
        for r in rd.highlight_query(f'{a} OR "{a} {b}"~3', window=2).collect()
    }
    assert frs
    for frag in frs.values():
        assert "<em>" in frag
    # tombstone a doc: fuzzy/slop/prefix must all drop it
    victim = sorted(want)[0] if want else docs[0][0]
    apply_deletes(spark, d, [victim])
    rd3 = IndexReader(spark, d)
    assert victim not in {
        r["doc_id"] for r in rd3.phrase_docs(f"{a} {b}", slop=3).collect()
    }
    assert victim not in {
        r["doc_id"] for r in rd3.phrase_prefix_docs(f"{a} {pfx}").collect()
    }
    assert victim not in {
        r["doc_id"]
        for r in rd3.fuzzy_docs(needle, max_edits=1, max_terms=10_000).collect()
    }
