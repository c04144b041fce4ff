"""Structured-Streaming WAL tail: ``readStream`` file source →
``foreachBatch`` → the same exactly-once merge.

Graft of the reference's micro-batch-over-discovered-files loop
(ir:544-575) onto Spark's streaming runtime: the file source discovers new
``batch-*.parquet`` files (``maxFilesPerTrigger=1`` keeps micro-batches
aligned with producer batches), and ``foreachBatch`` routes each one
through :meth:`CdcEngine.apply_batch` — which is idempotent and
checkpoint-marked, so engine-level exactly-once holds even though
``foreachBatch`` itself is at-least-once. Spark's own streaming checkpoint
tracks which files were consumed; the engine's dedup window absorbs any
overlap after a crash.

The batch ordinal is derived from the file name (monotone producer
contract) rather than Spark's epoch id, so a resumed stream maps files to
the same engine batch ids.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from image_report_spark.engine import CdcEngine
from image_report_spark.sources.changelog import normalize_header

_BATCH_RE = re.compile(r"batch-(\d+)\.parquet$")


def stream_apply(
    engine: CdcEngine,
    log_dir: str,
    stream_checkpoint: str,
    schema=None,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
):
    """Start a stream that merges every log file through the engine.

    Returns the ``StreamingQuery``; with ``available_now=True`` (default)
    the stream drains the backlog and stops — call
    ``query.awaitTermination()``.
    """
    spark = engine.spark
    if schema is None:
        # header + current payload schema (evolution inside a running stream
        # requires a restart — file sources need a fixed read schema; the
        # engine itself reconciles per batch on the batch path)
        sample = sorted(
            f for f in os.listdir(log_dir) if _BATCH_RE.search(f)
        )
        schema = spark.read.parquet(os.path.join(log_dir, sample[0])).schema

    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(log_dir)
    )
    src = reader.withColumn("_file", F.input_file_name())

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        # pin the micro-batch once: the per-file filter below would otherwise
        # re-read the source per discovered file (O(files²) scans when
        # maxFilesPerTrigger > 1)
        batch_df = batch_df.persist()
        try:
            files = [r[0] for r in batch_df.select("_file").distinct().collect()]
            for f in sorted(files):
                m = _BATCH_RE.search(f)
                batch_id = int(m.group(1)) if m else int(epoch_id)
                if engine.checkpoint.is_applied(batch_id):
                    continue  # at-least-once foreachBatch → idempotent skip
                one = normalize_header(
                    batch_df.filter(F.col("_file") == f).drop("_file")
                )
                engine.apply_batch(one, batch_id)
        finally:
            batch_df.unpersist()

    writer = src.writeStream.foreachBatch(handle).option(
        "checkpointLocation", stream_checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
