#!/usr/bin/env python
"""Benchmark harness (driver contract): runs headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Covers three surfaces:
1. registry headline queries over the driver tables (per-query seconds);
2. the full-text engine: webtext index-build throughput (docs/sec, build
   timed from a pre-materialized source — generation excluded) and BM25
   top-k latency p50/p99 over the reference query set on a shared session;
3. training-data ops (dedup / similarity) at sf scale.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from aether_elasticsearch_consumer_spark import registry
from aether_elasticsearch_consumer_spark.fixtures.webtext import (
    queries_set,
    webtext_df,
)
from aether_elasticsearch_consumer_spark.operators.topk import IndexReader
from aether_elasticsearch_consumer_spark.plans.index_build import IndexBuilder
from aether_elasticsearch_consumer_spark.session import get_spark

HEADLINE = [
    "fulltext_bm25_topk",
    "fulltext_term_match",
    "agg_terms_topn",
    "agg_histogram",
    "agg_date_histogram",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality",
    "text_lang_id",
    "fulltext_phrase_scored",
    "fulltext_fuzzy_count",
    "fulltext_query_string",
    "fulltext_highlight",
    "similarity_bruteforce_topk",
    "similarity_lsh_topk",
    "similarity_ivf_topk",
    "ingest_filter_isin",
]

# webtext corpus size per sf (docs) — ~400k docs/sf unit
WEBTEXT_DOCS_PER_SF = 400_000
N_LATENCY_QUERIES = 20


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1])
    n_docs = max(2000, int(WEBTEXT_DOCS_PER_SF * sf))

    spark = get_spark("bench", cores=cores)
    # session warmup (JIT/codegen/python workers) — not part of any metric
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    # ANN index builds are one-time (cached per sf_dir in /tmp) — the
    # headline entries time the partition-pruned QUERY path, so build
    # before the clock starts, same as the webtext materialization
    registry._lsh_index_for(spark, sf_dir)
    registry._ivf_index_for(spark, sf_dir)
    # same for the documents inverted index backing the flagship/term/AND
    # entries — build throughput is measured separately (index_build below);
    # one throwaway search warms the scorer's plan shape (codegen + python
    # workers), so the flagship entry measures query cost, not first-plan
    # compilation (same warmup discipline as the latency section below)
    registry._index_for(spark, sf_dir)
    registry._index_for_pos(spark, sf_dir)
    # the fuzzy deletion-neighborhood sidecar is likewise a one-time
    # per-index build (idempotent run_stage) — warm it so the fuzzy
    # entry times the banded QUERY path, not sidecar construction
    registry._reader_for(spark, sf_dir).ensure_fuzzy_sidecar(max_edits=2)
    registry.queries()["fulltext_index_single_term"](spark, sf_dir).collect()
    t_total = time.time()
    per_query: dict[str, float] = {}

    # 1. registry headline queries
    qs = registry.queries()
    for name in HEADLINE:
        t0 = time.time()
        qs[name](spark, sf_dir).collect()
        per_query[name] = round(time.time() - t0, 3)

    # 2. full-text engine over webtext
    work = Path(tempfile.mkdtemp(prefix="bench_webtext_"))
    src_path = work / "webtext"
    webtext_df(spark, n_docs).write.mode("overwrite").parquet(str(src_path))
    src = spark.read.parquet(str(src_path))

    t0 = time.time()
    builder = IndexBuilder(
        spark,
        str(work / "index"),
        docs_per_segment=8192,
        term_buckets=16,
    )
    builder.build(src, fingerprint_extra={"bench": n_docs})
    build_sec = time.time() - t0
    per_query["index_build"] = round(build_sec, 3)

    reader = IndexReader(spark, str(work / "index"))
    # warmup must hit a REAL term — an absent term short-circuits before
    # the scorer, leaving python-worker/codegen init on the first query
    reader.search("the", k=10).collect()
    lat = []
    for q in queries_set()[:N_LATENCY_QUERIES]:
        t0 = time.time()
        reader.search(q["query"], k=q["k"]).collect()
        lat.append(time.time() - t0)
    lat.sort()
    p50 = statistics.median(lat)
    p99 = lat[min(len(lat) - 1, int(len(lat) * 0.99))]
    per_query["bm25_query_p50"] = round(p50, 3)
    per_query["bm25_query_p99"] = round(p99, 3)

    total = round(time.time() - t_total, 3)
    out = {
        "metric": "bench_total",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "queries": per_query,
        "index_docs": n_docs,
        "index_docs_per_sec": round(n_docs / build_sec, 1),
        "cores": cores,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
