"""Event-time windowed aggregation with watermarked late-data handling,
plus a stateful streaming dedup — the Structured Streaming operator
surface beyond the reference's own loop.

Reference parity note: the reference's consumer is stateless
at-least-once (no windows, no watermarks —
/root/reference/consumer/app/artifacts.py:338-401 polls and upserts);
these operators are the task-surface streaming pieces a training-data
pipeline adds on top (SURVEY.md §2 extras): per-window event counts
that tolerate out-of-order arrival, and exact first-seen dedup across
micro-batches with bounded keyed state.

Scale shape: the windowed agg is a standard watermarked streaming
aggregation (state bounded by watermark horizon × key cardinality,
partial aggregation map-side); the stateful dedup keys state by the
dedup column (hash-partitioned, one state row per key — at web scale
pair it with a TTL or switch the key to a coarse content hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def stream_windowed_counts(
    spark: SparkSession,
    input_dir: str,
    schema: T.StructType,
    out_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "10 minutes",
    watermark: str = "20 minutes",
    available_now: bool = True,
):
    """Tumbling event-time counts per (window, key) with a watermark:
    events later than ``watermark`` behind the stream's max event time
    are DROPPED (finalized windows never retract), and append-mode
    output emits a window only once it can no longer change — exactly
    Structured Streaming's late-data contract. Sink is parquet
    (window_start, window_end, key, cnt)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            F.col(key_col).alias("key"),
        )
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "key",
            "cnt",
        )
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


DEDUP_STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType())])


def stream_dedup_first_seen(
    spark: SparkSession,
    input_dir: str,
    schema: T.StructType,
    out_dir: str,
    checkpoint_dir: str,
    key_col: str = "url",
    order_col: str = "ts",
    available_now: bool = True,
):
    """EXACT streaming dedup: one row per ``key_col`` across ALL
    micro-batches — the ``order_col``-minimal row of the first batch
    where the key appears wins (deterministic within a batch); every
    later duplicate, same batch or any later one, is dropped.
    ``applyInPandasWithState`` keeps one boolean state row per key, so
    the guarantee survives restarts via the checkpointed state store.
    This is the custom-stateful-operator form of the reference's
    idempotent upsert (first write wins instead of last)."""
    import pandas as pd

    out_schema = schema

    def dedup_fn(key, pdfs, state):
        if state.exists:
            for _ in pdfs:
                pass
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        state.update((True,))
        yield batch.loc[[batch[order_col].idxmin()]]

    stream = spark.readStream.schema(schema).parquet(input_dir)
    deduped = stream.groupBy(F.col(key_col)).applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
    writer = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
