"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference surface (its idempotent doc-id upsert, S4, is exact
dedup by key); these cover content-level dedup at corpus scale:

- ``exact_dedup``        — hash-groupBy on normalized content (one shuffle,
                           map-side partial agg)
- ``minhash_lsh``        — shingle → minhash signature → banded LSH
                           bucket-join; all JVM-side Column ops (no Python
                           in the hot path), candidate pairs verified with
                           true Jaccard. The scale path: cost is
                           O(docs × bands) shuffle, never O(n²).
- ``simhash``            — 64-bit weighted bit-vote fingerprint (Arrow UDF,
                           vectorized bit ops), hamming-distance buckets
- ``ngram_jaccard_pairs``— exact n-gram Jaccard within blocking keys
- ``embedding_neardup``  — cosine near-duplicate pairs within blocks

Determinism: all hash coefficients derive from a fixed seed; minhash uses
universal hashing (a·x+b mod p) over 31-bit folds of xxhash64 so products
stay in int64 — reproducible across cluster sizes.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.tokenizer import tokenize_col

MERSENNE_P = (1 << 31) - 1  # 2^31 - 1, prime


def _minhash_coeffs(n_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = np.random.Generator(np.random.Philox(key=seed))
    a = rng.integers(1, MERSENNE_P, size=n_hashes, dtype=np.int64)
    b = rng.integers(0, MERSENNE_P, size=n_hashes, dtype=np.int64)
    return list(zip(a.tolist(), b.tolist()))


def exact_dedup(
    df: DataFrame, content_cols: list[str], keep_by: str
) -> DataFrame:
    """Keep one row per distinct content (min ``keep_by`` wins — stable).
    One hash-shuffle; the md5 is computed JVM-side."""
    h = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in content_cols]))
    w = df.withColumn("_h", h)
    winners = w.groupBy("_h").agg(F.min(keep_by).alias(keep_by))
    return w.join(winners, ["_h", keep_by], "inner").drop("_h")


def shingle_hashes(
    text: Column, n: int = 3, profile: str = "ascii", hashed: bool = True
) -> Column:
    """Word n-gram shingles, all Column ops: tokenize → sliding window via
    transform(sequence) → (optionally) xxhash64 folded to 31 bits.
    hashed=False keeps raw gram strings (SQL-oracle-comparable); hashed=True
    is the scale path (fixed-width ints shuffle ~5× lighter than strings)."""
    toks = tokenize_col(text, profile)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    if not hashed:
        return F.array_distinct(grams)
    return F.array_distinct(
        F.transform(grams, lambda g: F.pmod(F.xxhash64(g), F.lit(MERSENNE_P)))
    )


def minhash_signature(
    shingles: Column, n_hashes: int = 64, seed: int = 42
) -> Column:
    """array<int31 hash> → array<long> minhash signature (universal
    hashing; empty docs get sentinel p)."""
    coeffs = _minhash_coeffs(n_hashes, seed)
    mins = [
        F.coalesce(
            F.array_min(
                F.transform(
                    shingles,
                    lambda x: F.pmod(F.lit(a) * x + F.lit(b), F.lit(MERSENNE_P)),
                )
            ),
            F.lit(MERSENNE_P),
        )
        for a, b in coeffs
    ]
    return F.array(*mins)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.7,
    profile: str = "ascii",
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard ≥ threshold).

    Stages: signature (narrow) → explode bands (×bands) → groupBy bucket
    (shuffle on band hash — uniform by construction) → within-bucket pairs
    → exact Jaccard verification on the shingle sets. Only docs sharing a
    band bucket are ever paired, so worst case is bounded by bucket sizes,
    not n²."""
    rows = bands  # rows per band = n_hashes // bands
    r = n_hashes // bands
    base = df.select(
        F.col(id_col).alias("id"),
        shingle_hashes(F.col(text_col), shingle_n, profile).alias("sh"),
    ).withColumn("sig", minhash_signature(F.col("sh"), n_hashes))
    banded = base.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.xxhash64(
                            F.lit(i), F.slice("sig", i * r + 1, r)
                        ).alias("bucket"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sh", "bb.band", "bb.bucket")
    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sh").alias("sh_a"),
            F.col("r.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        cand.withColumn("jaccard", F.round(jac, 6))
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
        .orderBy("id_a", "id_b")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    n: int = 3,
    threshold: float = 0.5,
    profile: str = "ascii",
    hashed: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard pairs within blocking keys (the small-block
    exact variant; use minhash_lsh_pairs when blocks are unbounded)."""
    base = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in block_cols],
        shingle_hashes(F.col(text_col), n, profile, hashed).alias("sh"),
    )
    left, right = base.alias("l"), base.alias("r")
    on = [F.col(f"l.{c}") == F.col(f"r.{c}") for c in block_cols]
    on.append(F.col("l.id") < F.col("r.id"))
    jac = F.size(F.array_intersect(F.col("l.sh"), F.col("r.sh"))) / F.size(
        F.array_union(F.col("l.sh"), F.col("r.sh"))
    )
    return (
        left.join(right, on)
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        .orderBy("id_a", "id_b")
    )


# -- SimHash ----------------------------------------------------------------


def _token_hash64(tokens: list[str]) -> np.ndarray:
    """Deterministic 64-bit token hashes (crc32 high/low halves)."""
    return np.array(
        [
            (zlib.crc32(t.encode()) << 32) | zlib.crc32((t + "\x00s").encode())
            for t in tokens
        ],
        dtype=np.uint64,
    )


def simhash_py(tokens: list[str]) -> int:
    """64-bit simhash: per-bit weighted vote over token hashes."""
    if not tokens:
        return 0
    uniq, counts = np.unique(np.array(tokens), return_counts=True)
    hashes = _token_hash64(list(uniq))
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
        np.int64
    )
    votes = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
    return int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


@F.pandas_udf(T.LongType())
def simhash_udf(token_arrays: pd.Series) -> pd.Series:
    out = np.empty(len(token_arrays), dtype=np.int64)
    for i, toks in enumerate(token_arrays):
        v = simhash_py(list(toks) if toks is not None else [])
        out[i] = np.uint64(v).astype(np.int64)  # two's-complement fold
    return pd.Series(out)


def simhash_col(text: Column, profile: str = "ascii") -> Column:
    return simhash_udf(tokenize_col(text, profile))


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    profile: str = "ascii",
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming, using the
    pigeonhole block trick: split 64 bits into (max_hamming+1) chunks —
    any qualifying pair collides on ≥1 exact chunk → bucket-join on chunk
    value, verify hamming via bit_count(xor). Scale: shuffle on chunk
    values, never n²."""
    chunks = max_hamming + 1
    # chunk boundaries must cover ALL 64 bits (pigeonhole requires a full
    # partition): distribute the remainder across the first chunks
    base_w, rem = divmod(64, chunks)
    bounds = []
    start = 0
    for i in range(chunks):
        w = base_w + (1 if i < rem else 0)
        bounds.append((start, w))
        start += w
    sh = df.select(
        F.col(id_col).alias("id"), simhash_col(F.col(text_col), profile).alias("sim")
    )
    banded = sh.select(
        "id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftrightunsigned(F.col("sim"), off)
                        .bitwiseAND(F.lit(-1 if w >= 64 else (1 << w) - 1))
                        .alias("val"),
                    )
                    for i, (off, w) in enumerate(bounds)
                ]
            )
        ).alias("cv"),
    ).select("id", "sim", "cv.chunk", "cv.val")
    l, r = banded.alias("l"), banded.alias("r")
    ham = F.bit_count(F.col("l.sim").bitwiseXOR(F.col("r.sim")))
    return (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            ham.alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("hamming") <= max_hamming)
        .orderBy("id_a", "id_b")
    )


# -- embedding near-dup ------------------------------------------------------


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str | None = None,
    threshold: float = 0.95,
) -> DataFrame:
    """Cosine near-duplicate pairs. With block_col: exact within blocks;
    without: exact all-pairs (only for small corpora — the LSH variant in
    operators/similarity.py is the unbounded-scale path)."""
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )
    norm = lambda a: F.sqrt(dot(a, a))  # noqa: E731
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        *([F.col(block_col).alias("blk")] if block_col else []),
    )
    l, r = base.alias("l"), base.alias("r")
    on = [F.col("l.id") < F.col("r.id")]
    if block_col:
        on.append(F.col("l.blk") == F.col("r.blk"))
    cos = dot(F.col("l.v"), F.col("r.v")) / (norm(F.col("l.v")) * norm(F.col("r.v")))
    return (
        l.join(r, on)
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.round(cos, 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .orderBy("id_a", "id_b")
    )
