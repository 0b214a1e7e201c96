"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk`` — exact cosine top-k. Arrow ``mapInPandas`` with a
  numpy matmul per batch (BLAS), partial top-k per partition, driver merge
  via orderBy.limit — the correctness baseline, O(N·d) scan fully
  distributed.
- ``lsh_topk`` / ``ivf_topk`` — ONE-SHOT ad-hoc variants that prune
  compute (fewer cosines) but still scan the corpus once: signatures /
  assignments are computed on the fly. Useful for a single exploratory
  query over data with no index. For repeated queries — and for anything
  at corpus scale — use ``plans/ann_index.py`` (``LshAnnIndex`` /
  ``IvfAnnIndex``): signatures/assignments are persisted at build time
  and a query reads ONLY the matching partition directories.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOPK_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("cosine", T.DoubleType(), False),
    ]
)


def _select_topk_ids(ids: np.ndarray, cos: np.ndarray, k: int):
    """k best by (cosine desc, id asc) over ROUNDED cosines, keeping every
    row tied at the k-th boundary before the composite sort — argpartition
    on raw floats can drop the lowest-id member of a 6-dp tie and diverge
    from the (cosine DESC, vec_id ASC) oracle ordering."""
    if len(ids) > k:
        kth = np.partition(cos, len(cos) - k)[len(cos) - k]
        keep = cos >= kth
        ids, cos = ids[keep], cos[keep]
    order = np.lexsort((ids, -cos))
    return ids[order][:k], cos[order][:k]


def _cosine_batch(ids, mat, q):
    qn = q / np.linalg.norm(q)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return ids, (mat @ qn) / norms


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float] | np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: per-partition numpy matmul + bounded top-k,
    global merge via orderBy(cosine desc, id asc).limit(k)."""
    q = np.asarray(query_vec, dtype=np.float64)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best_ids: list[np.ndarray] = []
        best_sc: list[np.ndarray] = []
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            _, cos = _cosine_batch(ids, mat, q)
            # round BEFORE trimming: the ranking contract is on 6-dp values
            ids, cos = _select_topk_ids(ids, np.round(cos, 6), k)
            best_ids.append(ids)
            best_sc.append(cos)
        if not best_ids:
            return
        ids = np.concatenate(best_ids)
        cos = np.concatenate(best_sc)
        ids, cos = _select_topk_ids(ids, cos, k)
        yield pd.DataFrame({"vec_id": ids, "cosine": cos})

    per_part = df.select(id_col, vec_col).mapInPandas(score, TOPK_SCHEMA)
    return per_part.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def _planes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.Generator(np.random.Philox(key=seed))
    return rng.standard_normal((n_planes, dim))


def signature_bits(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n, d) × (p, d) → packed int64 signatures (p ≤ 63)."""
    bits = (mat @ planes.T) >= 0
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    return (bits.astype(np.int64) * weights).sum(axis=1)


def lsh_topk(
    df: DataFrame,
    query_vec: list[float] | np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    max_hamming: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: hyperplane-signature pruning + exact re-rank of
    the surviving candidates (multi-probe by hamming radius)."""
    q = np.asarray(query_vec, dtype=np.float64)
    dim = len(q)
    planes = _planes(dim, n_planes, seed)
    q_sig = int(signature_bits(q[None, :], planes)[0])

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            sigs = signature_bits(mat, planes)
            xor = np.bitwise_xor(sigs, q_sig).astype(np.uint64)
            ham = np.zeros(len(ids), dtype=np.int64)
            for b in range(n_planes):
                ham += ((xor >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
            keep = ham <= max_hamming
            if not keep.any():
                continue
            _, cos = _cosine_batch(ids[keep], mat[keep], q)
            yield pd.DataFrame(
                {"vec_id": ids[keep], "cosine": np.round(cos, 6)}
            )

    per_part = df.select(id_col, vec_col).mapInPandas(score, TOPK_SCHEMA)
    return per_part.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def ivf_topk(
    df: DataFrame,
    query_vec: list[float] | np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF: centroids = deterministic sample (every Nth vector by id),
    probe the ``nprobe`` centroids nearest the query, exact-score only
    rows assigned to those lists. At scale the assignment is a stored
    column and the probe is a partition-pruned read."""
    q = np.asarray(query_vec, dtype=np.float64)
    sample = (
        df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(n_centroids * 50)
        .toPandas()
    )
    step = max(1, len(sample) // n_centroids)
    cent = np.stack(sample[vec_col].to_numpy()[::step][:n_centroids]).astype(
        np.float64
    )
    cent_n = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    probe = set(
        np.argsort(-(cent_n @ (q / np.linalg.norm(q))))[:nprobe].tolist()
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            mat_n = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
            )
            assign = np.argmax(mat_n @ cent_n.T, axis=1)
            keep = np.isin(assign, list(probe))
            if not keep.any():
                continue
            _, cos = _cosine_batch(ids[keep], mat[keep], q)
            yield pd.DataFrame(
                {"vec_id": ids[keep], "cosine": np.round(cos, 6)}
            )

    per_part = df.select(id_col, vec_col).mapInPandas(score, TOPK_SCHEMA)
    return per_part.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def sq8_codebook(
    df: DataFrame, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension (min, max) over the corpus — the SQ8 codebook.
    min/max are exact selections (no float accumulation), so any
    evaluation order yields bit-identical values; the codebook is
    dim-sized (bytes) and ships to workers in the task closure."""
    from pyspark.sql import functions as F

    rows = (
        df.select(F.posexplode(F.col(vec_col)).alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.min(F.col("x").cast("double")).alias("mn"),
            F.max(F.col("x").cast("double")).alias("mx"),
        )
        .orderBy("pos")
        .collect()
    )
    mn = np.array([r["mn"] for r in rows], dtype=np.float64)
    mx = np.array([r["mx"] for r in rows], dtype=np.float64)
    return mn, mx


def sq8_topk(
    df: DataFrame,
    query_vec: list[float] | np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: tuple[np.ndarray, np.ndarray] | None = None,
) -> DataFrame:
    """Scalar-quantized (SQ8, faiss-style) cosine top-k: each dimension
    linearly quantized to uint8 against the corpus min/max, searched by
    reconstructing ``r = mn + code·span/255`` and scoring the FULL query
    against the reconstruction — 4× less vector memory/IO than float32
    with near-exact recall, the standard first compression step before
    IVF-PQ at 100-TB embedding scale.

    code = floor((x−mn)/span·255 + 0.5) — explicit HALF_UP floor (numpy
    round is half-even; the DuckDB oracle replays the same floor), in
    [0, 255] by construction since mn/mx are exact corpus stats; flat
    dimensions (mx == mn) pin code 0 / r = mn.  Scoring, rounding (6 dp)
    and (cosine desc, id asc) tie-handling are shared with
    ``brute_force_topk``."""
    if codebook is None:
        codebook = sq8_codebook(df, vec_col)
    mn, mx = codebook
    span = np.where(mx > mn, mx - mn, 1.0)
    q = np.asarray(query_vec, dtype=np.float64)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            # clip: with a caller-supplied (stale/foreign) codebook,
            # vectors outside its min/max would otherwise produce codes
            # no real uint8 store could hold (round-5 advice)
            codes = np.clip(
                np.floor((mat - mn) / span * 255.0 + 0.5), 0.0, 255.0
            )
            recon = mn + codes * span / 255.0
            ids, cos = _cosine_batch(
                pdf[id_col].to_numpy().astype(np.int64), recon, q
            )
            ids, cos = _select_topk_ids(ids, np.round(cos, 6), k)
            yield pd.DataFrame({"vec_id": ids, "cosine": cos})

    part = df.select(id_col, vec_col).mapInPandas(score, TOPK_SCHEMA)
    return part.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    k_rrf: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (the ES 8.x hybrid-search combiner for
    BM25 + kNN retrievers): each input ranking contributes
    1/(k_rrf + rank) per doc; fused score = the sum, ties (score desc,
    id asc).  Inputs are ALREADY-CUT top-N frames (retriever outputs),
    so the rank window runs over ≤N rows per ranking — never the corpus;
    the fuse is one hash aggregate over ids+doubles.  Rank is assigned
    on each frame's OWN (score-column desc, id asc) total order, making
    the fusion deterministic and SQL-replayable."""
    from pyspark.sql import Window

    parts = []
    for df in rankings:
        others = [c for c in df.columns if c != id_col]
        if len(others) != 1:
            # round-5 advice: silently ranking by an arbitrary extra
            # column is a correctness trap — demand (id, score) frames
            raise ValueError(
                f"rrf_fuse input must have exactly ({id_col}, <score>) "
                f"columns, got {df.columns}"
            )
        score_col = others[0]
        w = Window.orderBy(F.desc(score_col), F.asc(id_col))
        parts.append(
            df.select(
                F.col(id_col).alias("__id"),
                F.row_number().over(w).alias("__rank"),
            )
        )
    from functools import reduce

    allp = reduce(DataFrame.unionByName, parts)
    fused = (
        allp.groupBy("__id")
        .agg(
            F.round(
                F.sum(F.lit(1.0) / (F.lit(float(k_rrf)) + F.col("__rank"))), 6
            ).alias("rrf_score")
        )
        .select(F.col("__id").alias(id_col), "rrf_score")
    )
    return fused.orderBy(F.desc("rrf_score"), F.asc(id_col)).limit(k)
