"""Single-node oracle engine (SURVEY.md §5, §7.1 step 1).

Pure Python/numpy, zero Spark: extract → tokenize → exhaustive BM25 → top-k.
Uses the *same* ``extract_text_py`` / ``tokenize_py`` / BM25 formula modules
as the distributed engine, so any disagreement is an engine bug, not an
analyzer drift. This plays the role of the reference's Elasticsearch backend
in its scoring tests (/root/reference/consumer/tests/test__index_handler.py:176-196).
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

import numpy as np

from .. import B, K1
from ..functions.bm25 import bm25_np
from ..functions.tokenizer import tokenize_py


@dataclass
class OracleIndex:
    doc_ids: np.ndarray            # int64, sorted ascending
    doc_lens: np.ndarray           # int64 aligned with doc_ids
    postings: dict[str, tuple[np.ndarray, np.ndarray]]  # term -> (doc_ids, tfs)
    N: int = 0
    avgdl: float = 0.0
    profile: str = "ascii"
    extra: dict = field(default_factory=dict)

    def df(self, term: str) -> int:
        p = self.postings.get(term)
        return 0 if p is None else len(p[0])


def build_oracle_index(
    docs: list[tuple[int, str]], profile: str = "ascii"
) -> OracleIndex:
    """docs: list of (doc_id, text). Exhaustive in-memory inverted index."""
    docs = sorted(docs, key=lambda d: d[0])
    doc_ids = np.array([d[0] for d in docs], dtype=np.int64)
    lens = np.zeros(len(docs), dtype=np.int64)
    post: dict[str, tuple[list[int], list[int]]] = {}
    for i, (doc_id, text) in enumerate(docs):
        toks = tokenize_py(text, profile)
        lens[i] = len(toks)
        for term, tf in Counter(toks).items():
            ids, tfs = post.setdefault(term, ([], []))
            ids.append(doc_id)
            tfs.append(tf)
    postings = {
        t: (np.array(ids, dtype=np.int64), np.array(tfs, dtype=np.int64))
        for t, (ids, tfs) in post.items()
    }
    N = len(docs)
    avgdl = float(lens.mean()) if N else 0.0
    return OracleIndex(doc_ids, lens, postings, N, avgdl, profile)


def score_query(
    index: OracleIndex, query: str, k: int = 10, k1: float = K1, b: float = B
) -> list[tuple[int, float]]:
    """Exhaustive BM25 OR-semantics top-k → [(doc_id, score)] with the
    engine's tie-break: (score desc, doc_id asc). Duplicate query terms
    score once per unique term (Lucene bool-OR of term queries dedups)."""
    terms = sorted(set(tokenize_py(query, index.profile)))
    acc: dict[int, float] = {}
    dl_by_id = dict(zip(index.doc_ids.tolist(), index.doc_lens.tolist()))
    for t in terms:
        p = index.postings.get(t)
        if p is None:
            continue
        ids, tfs = p
        dls = np.array([dl_by_id[i] for i in ids.tolist()], dtype=np.int64)
        scores = bm25_np(tfs, float(len(ids)), dls, index.N, index.avgdl, k1, b)
        for doc_id, s in zip(ids.tolist(), scores.tolist()):
            acc[doc_id] = acc.get(doc_id, 0.0) + s
    # Determinism contract (SURVEY.md §7.3 risk 1): accumulate per-term
    # contributions in ascending-term order in float64, then round to 9
    # decimals before ranking — both engines do exactly this, so ulp-level
    # summation-order noise can never flip a rank; residual ties fall to
    # the (score desc, doc_id asc) tie-break identically on both sides.
    ranked = sorted(
        ((d, round(s, 9)) for d, s in acc.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )
    return ranked[:k]
