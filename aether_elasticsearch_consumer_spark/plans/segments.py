"""Segment merge / incremental indexing (X6).

The reference's only bulk-combine primitive is the reindex migration
(index_handler.py:188-218); Lucene handles real segment merges internally.
Here merging is explicit and cheap by construction: every index keeps dense
doc_ids in [0, N), so a delta index built with a ``doc_id_offset`` of the
base's N occupies a disjoint doc-id range, and merging is a pure
metadata-plus-union operation — **no posting list is ever decoded**:

- postings: union of block rows (disjoint doc ranges → block-max metadata
  and delta encodings stay valid verbatim);
- doclens: union of segment sidecars (segment ids offset);
- term_stats: groupBy(term).sum(df) over the union;
- stats: N/avgdl recombine arithmetically.

The merged output commits under the same stage-manifest contract, so a
crashed merge re-runs idempotently. This is the incremental-ingest path:
build a small delta index from new docs (same IndexBuilder, offset ids),
then merge — the base is never rewritten except term_stats.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .checkpoint import content_hash, run_stage


def _read_stats(spark: SparkSession, d: Path):
    return spark.read.parquet(str(d / "stats/data")).collect()[0]


def merge_indexes(
    spark: SparkSession, base_dir: str, delta_dir: str, out_dir: str,
    force: bool = False,
) -> dict:
    """Merge two indexes with disjoint doc-id ranges into ``out_dir``.

    The delta must have been built with doc_ids offset past the base's
    (see ``IndexBuilder`` + ``doc_id_offset``); segment ids must also be
    disjoint, which holds when the delta's ids start at the base's N and
    both use the same docs_per_segment.
    """
    base, delta, out = Path(base_dir), Path(delta_dir), Path(out_dir)
    sb, sd = _read_stats(spark, base), _read_stats(spark, delta)
    def _pos(row):
        return bool(row["positions"]) if "positions" in row.__fields__ else False

    if (
        sb["docs_per_segment"] != sd["docs_per_segment"]
        or sb["term_buckets"] != sd["term_buckets"]
        or sb["profile"] != sd["profile"]
        or _pos(sb) != _pos(sd)
    ):
        raise ValueError("cannot merge indexes with different layouts")
    from .tombstones import delete_stats, has_deletes, union_delete_sidecars

    # the fingerprint must track the inputs' tombstone state: the same
    # (base, delta) pair with a grown delete set is a DIFFERENT merge
    del_state = [
        delete_stats(p) if has_deletes(p) else None for p in (base, delta)
    ]
    fp = content_hash(
        {"base": str(base), "delta": str(delta), "deletes": del_state, "v": 2}
    )
    manifests = {}

    def union_stage(name: str):
        def stage(tmp: str) -> dict:
            a = spark.read.parquet(str(base / name / "data"))
            b = spark.read.parquet(str(delta / name / "data"))
            # schema evolution across index format versions: a pre-v3 base
            # has no `positions` column; missing columns fill NULL, which
            # readers only touch when the positions flag is set (and the
            # layout check above already rejects mixed-flag merges)
            w = a.unionByName(b, allowMissingColumns=True).write.mode("overwrite")
            if name == "postings":
                w = w.partitionBy("term_bucket")
            w.parquet(tmp + "/data")
            return {}

        return stage

    for name in ("docs", "doclens", "postings"):
        manifests[name] = run_stage(name, out / name, fp, union_stage(name), force)

    def term_stats_stage(tmp: str) -> dict:
        a = spark.read.parquet(str(base / "term_stats/data"))
        b = spark.read.parquet(str(delta / "term_stats/data"))
        (
            a.unionByName(b)
            .groupBy("term_bucket", "term")
            .agg(F.sum("df").alias("df"))
            .repartition("term_bucket")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .partitionBy("term_bucket")
            .parquet(tmp + "/data")
        )
        return {}

    manifests["term_stats"] = run_stage(
        "term_stats", out / "term_stats", fp, term_stats_stage, force
    )

    def stats_stage(tmp: str) -> dict:
        n = int(sb["N"]) + int(sd["N"])
        avgdl = (
            float(sb["avgdl"]) * int(sb["N"]) + float(sd["avgdl"]) * int(sd["N"])
        ) / n
        # each side's block max_impacts were computed against ITS build
        # avgdl; the merged reader prunes against the merged avgdl, which
        # can exceed either side's and make stored bounds underestimates.
        # Keep the MIN build avgdl so the reader's bound inflation
        # (avgdl / build_avgdl) stays conservative for every block.
        def _bavg(row):
            return float(row["build_avgdl"]) if "build_avgdl" in row.__fields__ else float(row["avgdl"])

        build_avgdl = min(_bavg(sb), _bavg(sd))
        spark.createDataFrame(
            [(n, avgdl, build_avgdl, int(sb["docs_per_segment"]),
              int(sb["term_buckets"]), sb["profile"], _pos(sb))],
            "N long, avgdl double, build_avgdl double, docs_per_segment long,"
            " term_buckets int, profile string, positions boolean",
        ).coalesce(1).write.mode("overwrite").parquet(tmp + "/data")
        return {"N": n, "avgdl": avgdl, "build_avgdl": build_avgdl}

    manifests["stats"] = run_stage("stats", out / "stats", fp, stats_stage, force)

    if any(del_state):
        # tombstones carry through as pure metadata: doc-id and segment-id
        # ranges of the two sides are disjoint, so the delete sidecars
        # union exactly like doclens/postings — no posting ever decodes
        def deletes_stage(tmp: str) -> dict:
            union_delete_sidecars(spark, base, delta, tmp)
            return {}

        manifests["deletes"] = run_stage(
            "deletes", out / "deletes", fp, deletes_stage, force
        )
    return manifests


def next_doc_id_offset(spark: SparkSession, base_dir: str) -> int:
    """Smallest docs_per_segment-aligned doc_id past the base index's max —
    the offset a delta build must use to keep segments disjoint."""
    base = Path(base_dir)
    st = _read_stats(spark, base)
    dps = int(st["docs_per_segment"])
    max_id = (
        spark.read.parquet(str(base / "docs/data"))
        .agg(F.max("doc_id").alias("m"))
        .collect()[0]["m"]
    )
    return (int(max_id) // dps + 1) * dps
