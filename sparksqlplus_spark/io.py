"""Sinks: batch table writers and streaming file/foreachBatch sinks.

The reference's only sink is stdout/collect of the final result
(FormatResult, AbstractSparkSQLPlusCodeGenerator.scala:381-393); a
usable engine needs durable ones. Batch writes go through the
DataFrameWriter (parquet/csv, optional partitioning); streams use the
file sink with checkpointing (exactly-once into a directory) or
foreachBatch for arbitrary per-micro-batch logic.

Scale notes: `partition_by` drives partition pruning for downstream
readers — pick low-cardinality columns (date, category), never keys;
for repeated co-located joins use `api.save_bucketed` instead. File
streams commit via the checkpoint WAL, so a restarted job resumes
without duplicating output files.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Write a batch result to files (parquet or headerless CSV — the
    reference's input format, so results round-trip as inputs)."""
    writer = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "false")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_back(
    spark: SparkSession, path: str, fmt: str = "parquet", schema=None
) -> DataFrame:
    """Read a written table back (schema required for CSV)."""
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def stream_to_files(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "parquet",
    output_mode: str = "append",
) -> None:
    """Drain a bounded stream into files exactly-once (availableNow
    trigger + checkpoint WAL); blocks until drained. For unbounded
    production streams drop the trigger and manage the query handle."""
    q = (
        stream_df.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_foreach_batch(
    stream_df: DataFrame,
    fn: Callable[[DataFrame, int], None],
    checkpoint: str | None = None,
) -> None:
    """Custom sink: run ``fn(batch_df, batch_id)`` per micro-batch
    (merge-into-a-store, dedup-against-history, multi-table writes).
    Bounded drain via availableNow; blocks until done."""
    writer = stream_df.writeStream.foreachBatch(fn)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
