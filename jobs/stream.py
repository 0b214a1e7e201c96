#!/usr/bin/env python
"""spark-submit entry point: continuous indexing of an arriving webtext
stream into the live inverted index (the reference's consume→index loop,
artifacts.py:338-401, as Structured Streaming micro-batches).

  # drain everything currently pending, then exit (incremental batch):
  python jobs/stream.py --incoming /data/arriving --live /idx/live \
      --work /idx/work --checkpoint /idx/ckpt

  # upsert mode (re-delivered urls tombstone their stale versions):
  python jobs/stream.py ... --upsert --with-positions

The stream is a parquet file source here (swap for format('kafka') on a
real bus — same foreachBatch body). Prints one JSON line: batches seen,
live doc count, tombstones, elapsed. Safe to re-run: the checkpoint
makes replays no-ops and a crash mid-batch resumes losslessly
(per-batch offset records + the live-pointer replay guard).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from aether_elasticsearch_consumer_spark.operators.topk import IndexReader
from aether_elasticsearch_consumer_spark.plans.compaction import (
    CompactionPolicy,
)
from aether_elasticsearch_consumer_spark.plans.live_pointer import resolve_live
from aether_elasticsearch_consumer_spark.plans.tombstones import (
    delete_stats,
    has_deletes,
)
from aether_elasticsearch_consumer_spark.session import get_spark
from aether_elasticsearch_consumer_spark.streaming.ingest_stream import (
    stream_index,
)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--incoming", required=True,
                    help="parquet glob of arriving webtext files")
    ap.add_argument("--live", required=True,
                    help="live index pointer (created on first batch)")
    ap.add_argument("--work", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--schema-from", help="parquet path to take the schema "
                    "from (default: the incoming glob itself)")
    ap.add_argument("--upsert", action="store_true",
                    help="re-delivered urls tombstone their stale versions")
    ap.add_argument("--with-positions", action="store_true")
    ap.add_argument("--docs-per-segment", type=int, default=8192)
    ap.add_argument("--term-buckets", type=int, default=16)
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    ap.add_argument(
        "--auto-compact", action="store_true",
        help="evaluate the compaction policy after each committed batch "
             "and rebuild+repoint when due (plans/compaction.py)",
    )
    ap.add_argument("--max-delete-ratio", type=float, default=0.2)
    ap.add_argument("--min-segment-fill", type=float, default=0.5)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)

    spark = get_spark("stream_index", cores=args.cores)
    schema = spark.read.parquet(args.schema_from or args.incoming).schema
    t0 = time.time()
    stream_index(
        spark,
        args.incoming,
        schema,
        args.live,
        args.work,
        args.checkpoint,
        available_now=True,
        max_files_per_trigger=args.max_files_per_trigger,
        upsert=args.upsert,
        compaction_policy=(
            CompactionPolicy(
                max_delete_ratio=args.max_delete_ratio,
                min_segment_fill=args.min_segment_fill,
            )
            if args.auto_compact
            else None
        ),
        docs_per_segment=args.docs_per_segment,
        term_buckets=args.term_buckets,
        with_positions=args.with_positions,
    )
    out: dict = {"live": args.live, "elapsed_sec": round(time.time() - t0, 2)}
    resolved = resolve_live(args.live)
    if resolved:
        rd = IndexReader(spark, resolved)
        n_del = (
            delete_stats(resolved)["n_deleted"] if has_deletes(resolved) else 0
        )
        out.update(
            {"index": resolved, "live_docs": rd.N, "tombstoned": n_del}
        )
    else:
        out["index"] = None  # nothing arrived yet
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
