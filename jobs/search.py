#!/usr/bin/env python
"""spark-submit entry point: BM25 top-k search against a built index.

Usage:
  spark-submit --py-files engine.zip jobs/search.py \
      --index-dir /path/to/index --query "terms here" [--k 10] [--urls]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from aether_elasticsearch_consumer_spark.operators.topk import IndexReader
from aether_elasticsearch_consumer_spark.session import get_spark


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", required=True,
                    help="index dir, live-pointer file, or legacy symlink")
    ap.add_argument("--query", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--urls", action="store_true", help="join doc urls")
    ap.add_argument(
        "--query-string", action="store_true",
        help="treat --query as the Lucene query-string language "
             '(phrases, ~slop, ^boosts, +/-, AND/OR/NOT, wildcards) and '
             "rank with query_string_search",
    )
    ap.add_argument(
        "--multi-match", metavar="FIELDS",
        help='comma-separated field list with optional ^boosts, ES style '
             '(e.g. "title^2,text") — requires per-field sub-indexes '
             "(build_index.py --field); ranks with multi_match",
    )
    ap.add_argument(
        "--mm-type", default="best_fields",
        choices=["best_fields", "most_fields"],
    )
    ap.add_argument("--tie-breaker", type=float, default=0.0)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)

    spark = get_spark("search", cores=args.cores)
    reader = IndexReader(spark, args.index_dir)
    t0 = time.time()
    if args.multi_match:
        from aether_elasticsearch_consumer_spark.operators.multimatch import (
            MultiFieldIndex,
        )

        mf = MultiFieldIndex(spark, str(reader.dir))
        hits = mf.multi_match(
            args.query,
            args.multi_match.split(","),
            mode=args.mm_type,
            tie_breaker=args.tie_breaker,
            k=args.k,
        )
    elif args.query_string:
        hits = reader.query_string_search(args.query, k=args.k)
    else:
        hits = reader.search(args.query, k=args.k)
    if args.urls:
        # reader.dir is the RESOLVED index dir (works when --index-dir is
        # a live-pointer file)
        docs = spark.read.parquet(f"{reader.dir}/docs/data").select(
            "doc_id", "url"
        )
        # preserve the engine's (score desc, doc_id asc) determinism
        # contract across the url join
        hits = hits.join(docs, "doc_id").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
    rows = hits.collect()
    elapsed = time.time() - t0
    out = {
        "query": args.query,
        "k": args.k,
        "latency_sec": round(elapsed, 3),
        "hits": [r.asDict() for r in rows],
        "max_score": rows[0]["score"] if rows else None,
    }
    print(json.dumps(out, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
