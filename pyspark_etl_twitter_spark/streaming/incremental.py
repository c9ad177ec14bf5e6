"""Incremental batch ingestion: Structured Streaming's checkpoint
contract driven by ``Trigger.AvailableNow``.

The reference keeps a resident consumer process alive to tail its source
(consumer.py's forever-running query). At 100 TB the equivalent pattern
is usually the opposite: a scheduled job that wakes, processes exactly
the files that arrived since the last run, commits, and exits —
exactly-once across runs and crash-safe mid-run, with no resident
cluster. ``availableNow`` gives that while keeping every streaming
semantic (source offsets, sink commit log, watermarks) intact; the same
pipeline code runs resident (``processingTime`` trigger) or scheduled
(``availableNow``) unchanged.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def incremental_ingest(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    checkpoint_dir: str,
    *,
    schema: T.StructType,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    source_format: str = "json",
    timeout_s: int = 120,
) -> None:
    """One incremental run: read every source file not yet recorded in the
    checkpoint's offset log, apply ``transform``, append to ``dst_dir``
    parquet, commit, stop.

    Exactly-once across invocations comes from the pair of logs the sink
    maintains: the offset log (which files a batch covered) and the commit
    log (which batches the sink fully wrote). A crash between the two
    replays the batch to the same batch id, which the parquet sink's
    ``_spark_metadata`` dedups — the same epoch-idempotence contract the
    foreachBatch sinks in this package test explicitly."""
    reader = spark.readStream.schema(schema)
    stream = getattr(reader, source_format)(src_dir)
    if transform is not None:
        stream = transform(stream)
    q = (
        stream.writeStream.format("parquet")
        .option("path", dst_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
