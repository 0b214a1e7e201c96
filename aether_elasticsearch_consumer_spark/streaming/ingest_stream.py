"""Incremental ingest — the Kafka poll loop (S1, artifacts.py:338-401)
re-expressed as Structured Streaming + idempotent merge.

The reference consumes at-least-once (auto-commit kafka.json) and gets
effective exactly-once from doc-id upsert idempotency (S4). Same model
here: a file-source stream (stand-in for Kafka in this sandbox; swap
``readStream.parquet`` for ``readStream.format('kafka')`` on a real bus)
feeds ``foreachBatch`` → compiled ingest pipeline → ``merge_upsert`` into a
snapshot table. Replayed batches re-merge the same keys — idempotent, no
stateful operators, no watermarks (the reference has none either:
SURVEY.md §2.5).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from ..operators.ingest import IngestPipeline
from ..sources.catalog import SnapshotTable


def stream_ingest(
    spark: SparkSession,
    input_dir: str,
    schema: T.StructType,
    pipeline: IngestPipeline,
    table: SnapshotTable,
    key: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Run the ingest stream; with available_now=True processes all pending
    input then stops (incremental batch — the engine's default mode)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)

    def handle_batch(batch_df, batch_id: int):
        processed = pipeline.apply(batch_df)
        if processed.isEmpty():
            return
        table.merge_upsert(processed, key)

    writer = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
