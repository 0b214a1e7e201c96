"""ES ``multi_match`` — one query string scored against several fields.

Reference parity: the consumer maps every schema field into the ES index
(/root/reference/consumer/app/index_handler.py:616-639), where ES's standard
way to query across those fields is ``multi_match`` with per-field boosts
(``fields: ["title^2", "body"]``).  Semantics implemented here, per the ES
docs' definitions:

- ``best_fields`` (ES default): each field scores the whole query as a
  ``match`` (OR-sum of per-term BM25 under THAT field's statistics); the doc
  score is the best field's score, plus ``tie_breaker`` × the sum of the
  other fields' scores — i.e. exactly a ``dis_max`` over per-field match
  clauses (the equivalence ES documents; the engine's dis_max lives at
  operators/topk.py and this module folds the same max/sum ladder).
- ``most_fields``: the doc score is the SUM of the per-field scores — the
  "same text analyzed different ways" mode.

Scoring ladder (oracle-replayable, same as every scored query here): each
per-field score is or_scores' round(Σ round(bm25_term, 9), 9); a per-field
boost multiplies then re-rounds to 9 dp; the cross-field combine
(max + tie_breaker·(sum − max), or plain sum) re-rounds to 9 dp; ties break
(score desc, doc_id asc).

Scale shape: per-field scoring is the root engine's pruned
term_bucket-partitioned read against that field's OWN sub-index (small —
field text, not body text); the cross-field combine is ONE hash aggregate
over the unioned (doc_id, score) streams — ids and doubles only, no
payload.  Nothing here scans an index of another field.
"""

from __future__ import annotations

from functools import reduce
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tokenizer import tokenize_py
from ..plans.multi_field import field_index_dir, list_field_indexes
from .topk import TOPK_SCHEMA, IndexReader

VALID_MODES = ("best_fields", "most_fields")


def parse_fields(fields: list[str]) -> dict[str, float]:
    """ES field-list syntax: ``["title^2", "body"]`` → {"title": 2.0,
    "body": 1.0}."""
    out: dict[str, float] = {}
    for f in fields:
        name, _, boost = f.partition("^")
        out[name] = float(boost) if boost else 1.0
    return out


class MultiFieldIndex:
    """Root index (the primary analyzed-text field, conventionally named
    ``text``) plus per-field sub-indexes under ``<root>/fields/``.

    Readers open lazily and cache — a multi_match touching 2 of N fields
    lists 2 sub-indexes' files, never all N."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        primary_field: str = "text",
    ):
        self.spark = spark
        self.dir = str(index_dir)
        self.primary_field = primary_field
        self._readers: dict[str, IndexReader] = {}

    def fields(self) -> list[str]:
        return [self.primary_field, *list_field_indexes(self.dir)]

    def reader(self, field: str) -> IndexReader:
        rd = self._readers.get(field)
        if rd is None:
            d = (
                self.dir
                if field == self.primary_field
                else str(field_index_dir(self.dir, field))
            )
            if field != self.primary_field and not (Path(d) / "stats").is_dir():
                raise KeyError(
                    f"no sub-index for field {field!r} under {self.dir} "
                    f"(have: {self.fields()})"
                )
            rd = IndexReader(self.spark, d)
            self._readers[field] = rd
        return rd

    def field_scores(self, field: str, query: str, boost: float = 1.0) -> DataFrame:
        """Uncut per-field match scores: or_scores under the field's own
        N/avgdl/df, ×boost, 9-dp ladder."""
        s = self.reader(field).or_scores(query)
        if boost != 1.0:
            s = s.select(
                "doc_id", F.round(F.col("score") * float(boost), 9).alias("score")
            )
        return s

    def multi_match(
        self,
        query: str,
        fields: dict[str, float] | list[str],
        mode: str = "best_fields",
        tie_breaker: float = 0.0,
        k: int = 10,
    ) -> DataFrame:
        if mode not in VALID_MODES:
            raise ValueError(f"mode must be one of {VALID_MODES}, got {mode!r}")
        if isinstance(fields, list):
            fields = parse_fields(fields)
        parts = [
            self.field_scores(name, query, boost)
            for name, boost in sorted(fields.items())
        ]
        parts = [p for p in parts if p is not None]
        if not parts:
            return self.spark.createDataFrame([], TOPK_SCHEMA)
        allparts = reduce(DataFrame.unionByName, parts)
        grouped = allparts.groupBy("doc_id").agg(
            F.max("score").alias("_mx"), F.sum("score").alias("_sm")
        )
        if mode == "most_fields":
            scored = grouped.select(
                "doc_id", F.round(F.col("_sm"), 9).alias("score")
            )
        else:
            scored = grouped.select(
                "doc_id",
                F.round(
                    F.col("_mx")
                    + F.lit(float(tie_breaker)) * (F.col("_sm") - F.col("_mx")),
                    9,
                ).alias("score"),
            )
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def cross_fields(
        self,
        query: str,
        fields: dict[str, float] | list[str],
        k: int = 10,
        tie_breaker: float = 0.0,
    ) -> DataFrame:
        """ES ``multi_match`` type=cross_fields — TERM-centric blending
        (the "first-name/last-name split across fields" query): each term
        is scored in every field under a BLENDED document frequency
        df_blend(t) = max_f df_f(t) (the Lucene BlendedTermQuery
        max-frequency rewrite cross_fields is built on — evens out idf so
        a term rare in one field can't dominate), per-field boosts
        multiply tf-side inputs' scores; per term the doc takes the BEST
        field's score (+ tie_breaker × the rest), and the per-term
        winners sum per doc.  Ladder: per (doc,term,field) round 9 →
        per-term combine round 9 → per-doc sum round 9.

        Scale shape: pruned per-field (doc_id, term, tf) reads, dl from
        each field's doc_id-sorted docs sidecar joined candidate-side,
        df_blend is a per-query-term scalar map broadcast into the plan;
        combines are hash aggregates over candidate-sized rows."""
        from .. import B as BM25_B
        from .. import K1
        from ..functions.bm25 import bm25_cols

        if isinstance(fields, list):
            fields = parse_fields(fields)
        items = sorted(fields.items())
        terms = sorted(
            set(tokenize_py(query, self.reader(items[0][0]).profile))
        )
        if not terms:
            return self.spark.createDataFrame([], TOPK_SCHEMA)
        dfb: dict[str, int] = {}
        for name, _ in items:
            for t, d in self.reader(name).term_dfs(terms).items():
                dfb[t] = max(dfb.get(t, 0), d)
        dfb = {t: d for t, d in dfb.items() if d > 0}
        if not dfb:
            return self.spark.createDataFrame([], TOPK_SCHEMA)
        df_map = self.spark.createDataFrame(
            [(t, d) for t, d in sorted(dfb.items())], "term string, dfb long"
        )
        N = self.reader(items[0][0]).N
        parts = []
        for name, w in items:
            rd = self.reader(name)
            dl = self.spark.read.parquet(str(Path(rd.dir) / "docs/data")).select(
                "doc_id", "doc_len"
            )
            s = (
                rd.term_freqs(list(dfb))
                .join(F.broadcast(df_map), "term")
                .join(dl, "doc_id")
                .select(
                    "doc_id", "term",
                    F.round(
                        bm25_cols(
                            F.col("tf"), F.col("dfb").cast("double"),
                            F.col("doc_len"), F.lit(N).cast("double"),
                            F.lit(float(rd.avgdl)), k1=K1, b=BM25_B,
                        )
                        * F.lit(float(w)),
                        9,
                    ).alias("s"),
                )
            )
            parts.append(s)
        per_term = (
            reduce(DataFrame.unionByName, parts)
            .groupBy("doc_id", "term")
            .agg(F.max("s").alias("_mx"), F.sum("s").alias("_sm"))
            .select(
                "doc_id",
                F.round(
                    F.col("_mx")
                    + F.lit(float(tie_breaker)) * (F.col("_sm") - F.col("_mx")),
                    9,
                ).alias("s"),
            )
        )
        scored = per_term.groupBy("doc_id").agg(
            F.round(F.sum("s"), 9).alias("score")
        )
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def combined_fields(
        self,
        query: str,
        fields: dict[str, float] | list[str],
        k: int = 10,
    ) -> DataFrame:
        """ES ``combined_fields`` — BM25F's "simple" weighted variant
        (the principled alternative to best/most_fields the ES docs
        describe, per Robertson/Zaragoza/Taylor's simple BM25F): term
        frequencies BLEND across fields BEFORE length normalization
        instead of scoring each field separately:

            tf*(d,t) = Σ_f w_f · tf_f(d,t)
            dl*(d)   = Σ_f w_f · dl_f(d)
            avgdl*   = Σ_f w_f · avgdl_f
            df*(t)   = |{d : t in ANY queried field of d}|
            score(d) = Σ_t round(idf(df*) · tf*/(tf* + k1·(1−b+b·dl*/avgdl*)), 9)

        summed per doc and re-rounded (the standard ladder).  All sums
        over fields run in sorted field-name order (two-field sums are
        order-exact in IEEE anyway; documented for determinism beyond 2).

        Scale shape: per-field (doc_id, term, tf) comes off the pruned
        postings read (``term_freqs``); dl* joins each field's
        doc_id-sorted docs sidecar against the candidate set only
        (row-group-pruned point lookups); df* and the blend are hash
        aggregates over candidate-sized id/term/double rows."""
        from .. import B as BM25_B
        from .. import K1

        if isinstance(fields, list):
            fields = parse_fields(fields)
        items = sorted(fields.items())
        terms = sorted(
            set(tokenize_py(query, self.reader(items[0][0]).profile))
        )
        if not terms:
            return self.spark.createDataFrame([], TOPK_SCHEMA)
        parts = [
            self.reader(name)
            .term_freqs(terms)
            .select(
                "doc_id", "term",
                (F.col("tf").cast("double") * F.lit(float(w))).alias("wtf"),
            )
            for name, w in items
        ]
        ptf = (
            reduce(DataFrame.unionByName, parts)
            .groupBy("doc_id", "term")
            .agg(F.sum("wtf").alias("wtf"))
        )
        dft = ptf.groupBy("term").agg(F.count("*").alias("df"))
        cand = ptf.select("doc_id").distinct()
        dl_parts = []
        avgdl_star = 0.0
        N = self.reader(items[0][0]).N
        for name, w in items:
            rd = self.reader(name)
            avgdl_star += float(w) * rd.avgdl
            docs = self.spark.read.parquet(str(Path(rd.dir) / "docs/data"))
            dl_parts.append(
                docs.join(F.broadcast(cand), "doc_id", "left_semi").select(
                    "doc_id",
                    (F.col("doc_len").cast("double") * F.lit(float(w))).alias(
                        "wdl"
                    ),
                )
            )
        dls = (
            reduce(DataFrame.unionByName, dl_parts)
            .groupBy("doc_id")
            .agg(F.sum("wdl").alias("wdl"))
        )
        from ..functions.bm25 import bm25_cols

        per_term = (
            ptf.join(F.broadcast(dft), "term")
            .join(dls, "doc_id")
            .select(
                "doc_id",
                F.round(
                    bm25_cols(
                        F.col("wtf"), F.col("df").cast("double"),
                        F.col("wdl"), F.lit(N).cast("double"),
                        F.lit(float(avgdl_star)), k1=K1, b=BM25_B,
                    ),
                    9,
                ).alias("s"),
            )
        )
        scored = per_term.groupBy("doc_id").agg(
            F.round(F.sum("s"), 9).alias("score")
        )
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
