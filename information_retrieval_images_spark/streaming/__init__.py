"""Streaming / incremental maintenance.

The reference has NO streaming operators (SURVEY.md §2.10) — its incremental
behavior is ingest-by-anti-join (db.py:324-339). The batch engine covers that
with checkpointed bucket builds. This module adds the Structured-Streaming
shape for the two places a production deployment streams:

- :func:`incremental_index_update` — micro-batch ingest of new pages into the
  index via foreachBatch: each batch is deduped against the docs table
  (left-anti on url, the reference's md5-presence pattern) and appended as a
  new bucket; exactly-once comes from the checkpoint manifest + streaming
  checkpointLocation.
- :func:`windowed_event_counts` — watermarked tumbling-window aggregation over
  an event stream (the generic late-data-tolerant rollup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts with a watermark for late data. Works on both
    streaming and batch DataFrames (same plan, Catalyst decides)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def incremental_index_update(pages_stream: DataFrame, catalog, build_fn, checkpoint_dir: str, next_bucket_start: int = 1_000_000):
    """Maintain the inverted index under a stream of new pages.

    foreachBatch: anti-join the micro-batch against indexed urls (J2, the
    reference's cross-system anti-join done as one Spark op), then run the
    batch build for the novel rows into a fresh bucket id. Streaming
    checkpointing + the engine's per-bucket manifest give exactly-once.
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if catalog.exists("docs"):
            seen = catalog.read("docs").select("url")
            batch_df = batch_df.join(seen, "url", "left_anti")
        if batch_df.isEmpty():
            return
        build_fn(batch_df, bucket=next_bucket_start + batch_id)

    return (
        pages_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
