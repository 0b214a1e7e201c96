"""Persisted ANN indexes: partition-pruned reads + recall vs brute force.

The scale contract under test: a query must read a STRICT SUBSET of the
index's partition directories (pruning happens at the file listing, not
after a full scan), and the exact re-rank keeps results rank-identical to
brute force over the candidate set.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from aether_elasticsearch_consumer_spark.operators.similarity import (
    brute_force_topk,
)
from aether_elasticsearch_consumer_spark.plans.ann_index import (
    IvfAnnIndex,
    LshAnnIndex,
    _hamming_ball,
)


def test_hamming_ball_counts():
    assert len(_hamming_ball(0b101010, 6, 0)) == 1
    assert len(_hamming_ball(0b101010, 6, 1)) == 7
    assert len(_hamming_ball(0b101010, 6, 2)) == 1 + 6 + 15
    got = _hamming_ball(0b11, 2, 2)
    assert sorted(got) == [0, 1, 2, 3]


@pytest.fixture(scope="module")
def emb(spark, sf001_dir):
    return spark.read.parquet(f"{sf001_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def qvec(emb):
    row = emb.where(F.col("vec_id") == 7).collect()[0]
    return np.array(row["embedding"], dtype=np.float64)


@pytest.fixture(scope="module")
def lsh_idx(spark, emb, tmp_path_factory):
    d = tmp_path_factory.mktemp("lsh")
    return LshAnnIndex.build(
        spark, emb, str(d / "idx"), n_planes=16, prefix_bits=6, seed=42
    )


@pytest.fixture(scope="module")
def ivf_idx(spark, emb, tmp_path_factory):
    d = tmp_path_factory.mktemp("ivf")
    return IvfAnnIndex.build(spark, emb, str(d / "idx"), n_centroids=16)


class TestLshIndex:
    def test_query_reads_partition_subset(self, lsh_idx, qvec):
        all_parts = [
            p for p in (lsh_idx.dir / "data").iterdir()
            if p.name.startswith("sig_prefix=")
        ]
        probed = lsh_idx.probe_paths(qvec, max_hamming=2)
        assert 0 < len(probed) < len(all_parts)
        # and the Spark scan's file listing is confined to those dirs
        df = lsh_idx.query(qvec, k=5, max_hamming=2)
        files = set()
        cand = lsh_idx.spark.read.option(
            "basePath", str(lsh_idx.dir / "data")
        ).parquet(*probed)
        files.update(cand.inputFiles())
        assert all(any(str(pp) in f for pp in probed) for f in files)
        assert df.count() > 0

    def test_recall_vs_brute_force(self, emb, lsh_idx, qvec):
        # the fixture embeddings are near-random (best cosine ≈ 0.35 →
        # P[bit differs] ≈ 0.38, expected hamming ≈ 6/16), so full recall
        # needs a wide budget; tighter budgets trade recall for pruning
        got = [
            (r["vec_id"], r["cosine"])
            for r in lsh_idx.query(qvec, k=10, max_hamming=10).collect()
        ]
        want = [
            (r["vec_id"], r["cosine"])
            for r in brute_force_topk(emb, qvec, k=10).collect()
        ]
        assert got == want
        # narrow budget: every hit is still a true cosine, ranked correctly
        narrow = lsh_idx.query(qvec, k=10, max_hamming=4).collect()
        want_map = dict(want)
        got_n = [(r["vec_id"], r["cosine"]) for r in narrow]
        exact = {
            r["vec_id"]: r["cosine"]
            for r in brute_force_topk(emb, qvec, k=len(want) + 500).collect()
        }
        for vid, cos in got_n:
            assert exact.get(vid, want_map.get(vid)) == cos

    def test_self_is_top1(self, lsh_idx, qvec):
        top = lsh_idx.query(qvec, k=1, max_hamming=0).collect()
        assert top and top[0]["vec_id"] == 7
        assert top[0]["cosine"] == pytest.approx(1.0, abs=1e-6)


class TestIvfIndex:
    def test_centroids_deterministic(self, spark, emb, ivf_idx, tmp_path_factory):
        d2 = tmp_path_factory.mktemp("ivf2")
        again = IvfAnnIndex.build(spark, emb, str(d2 / "idx"), n_centroids=16)
        assert np.array_equal(ivf_idx.centroids, again.centroids)

    def test_query_reads_partition_subset(self, ivf_idx, qvec):
        all_parts = [
            p for p in (ivf_idx.dir / "data").iterdir()
            if p.name.startswith("list_id=")
        ]
        probed = ivf_idx.probe_paths(qvec, nprobe=4)
        assert 0 < len(probed) <= 4 < len(all_parts)
        got = ivf_idx.query(qvec, k=5, nprobe=4).collect()
        assert got and got[0]["vec_id"] == 7

    def test_full_probe_equals_brute_force(self, emb, ivf_idx, qvec):
        got = [
            (r["vec_id"], r["cosine"])
            for r in ivf_idx.query(qvec, k=10, nprobe=16).collect()
        ]
        want = [
            (r["vec_id"], r["cosine"])
            for r in brute_force_topk(emb, qvec, k=10).collect()
        ]
        assert got == want


def test_lsh_append_equals_full_build(spark, tmp_path):
    """Incremental LSH maintenance: build on half the vectors, append the
    other half — every query must answer EXACTLY like a from-scratch
    build over the union (stateless hyperplane hashing + same stored
    planes)."""
    from aether_elasticsearch_consumer_spark.plans.ann_index import LshAnnIndex
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    h1, h2 = emb.where(F.col("vec_id") % 2 == 0), emb.where(F.col("vec_id") % 2 == 1)
    inc = LshAnnIndex.build(spark, h1, str(tmp_path / "inc"), n_planes=16, prefix_bits=6)
    inc.append(h2)
    full = LshAnnIndex.build(spark, emb, str(tmp_path / "full"), n_planes=16, prefix_bits=6)
    for qid in (3, 7, 11):
        qv = emb.where(F.col("vec_id") == qid).collect()[0]["embedding"]
        a = [(r["vec_id"], r["cosine"]) for r in inc.query(qv, k=10, max_hamming=6, max_prefix_hamming=2).collect()]
        b = [(r["vec_id"], r["cosine"]) for r in full.query(qv, k=10, max_hamming=6, max_prefix_hamming=2).collect()]
        assert a == b and a, qid


def test_ivf_append_equals_pinned_centroid_build(spark, tmp_path):
    """Incremental IVF maintenance (FAISS add() semantics): append onto
    frozen centroids == from-scratch build that pins the same centroid
    ids."""
    from aether_elasticsearch_consumer_spark.plans.ann_index import IvfAnnIndex
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    h1, h2 = emb.where(F.col("vec_id") % 2 == 0), emb.where(F.col("vec_id") % 2 == 1)
    inc = IvfAnnIndex.build(spark, h1, str(tmp_path / "inc"), n_centroids=8)
    cent_ids = None
    # recover the centroid ids the half-build picked (smallest xxhash64)
    cent_ids = [
        r["vec_id"]
        for r in h1.select("vec_id")
        .withColumn("_h", F.xxhash64(F.col("vec_id")))
        .orderBy("_h", "vec_id").limit(8).collect()
    ]
    inc.append(h2)
    full = IvfAnnIndex.build(
        spark, emb, str(tmp_path / "full"), centroid_ids=cent_ids
    )
    for qid in (3, 7, 11):
        qv = emb.where(F.col("vec_id") == qid).collect()[0]["embedding"]
        a = [(r["vec_id"], r["cosine"]) for r in inc.query(qv, k=10, nprobe=4).collect()]
        b = [(r["vec_id"], r["cosine"]) for r in full.query(qv, k=10, nprobe=4).collect()]
        assert a == b and a, qid
