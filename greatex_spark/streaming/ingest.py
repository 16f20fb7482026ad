"""Streaming ingest of page files with validation gates.

``gated_ingest`` recasts the reference's gate-at-every-hop design
(``/root/reference/dags/retail_data_pipeline.py:110-122``) for
continuous arrival: each micro-batch is validated against the source
suite *before* it is appended to bronze, failed batches are quarantined
instead of halting the stream, and every batch appends typed lineage
rows to the metrics table.  ``Trigger.AvailableNow`` drains whatever
has landed and stops — the streaming equivalent of the reference's
daily batch run, but resumable at file granularity via the streaming
checkpoint (kill and re-run: already-committed files are skipped).
``foreachBatch`` delivery is at-least-once; the per-batch write
dynamic-overwrites its own ``__batch_id`` partition, so a replayed
batch lands on top of itself — effective exactly-once output.

Scale notes: the file source lists the landing dir incrementally
(``maxFilesPerTrigger`` caps batch width); the gate is the same ONE
fused agg per suite as the batch path, so per-batch overhead is a
single extra pass over the micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from greatex_spark.expectations.compiler import run_suite
from greatex_spark.expectations.spec import Suite
from greatex_spark.sources.files import PAGE_SCHEMA
from greatex_spark.tables import Catalog


def gated_ingest(
    spark: SparkSession,
    landing_dir: str,
    bronze_dir: str,
    quarantine_dir: str,
    checkpoint_dir: str,
    suite: Suite,
    metrics_rows: list | None = None,
    max_files_per_trigger: int | None = None,
    catalog: Catalog | None = None,
) -> None:
    """Drain the landing directory into bronze, one validated
    micro-batch at a time (blocking until drained).

    ``catalog``, when given, appends each micro-batch's typed gate
    metrics to the SAME ``metrics`` table the batch checkpoints use
    (``pipeline.checkpoint.store_metrics``, batch_id as the epoch) —
    batch and streaming runs share one lineage store.  ``metrics_rows``
    additionally collects the flattened dicts in-process (tests)."""
    reader = spark.readStream.schema(PAGE_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(landing_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        vr = run_suite(
            batch_df,
            suite,
            batch_identifier=f"stream-batch-{batch_id}",
            collect_partial_unexpected=False,
        )
        if metrics_rows is not None:
            metrics_rows.extend(vr.to_metrics_rows())
        if catalog is not None:
            # same typed store as the batch gates — one metrics table
            # for the whole lake, streaming epochs keyed by batch_id
            from greatex_spark.pipeline.checkpoint import store_metrics

            store_metrics(spark, catalog, vr, epoch=batch_id)
        target = bronze_dir if vr.success else quarantine_dir
        # idempotent write: foreachBatch is at-least-once — a crash
        # between the write and the checkpoint commit replays the batch.
        # Dynamic-overwriting the __batch_id=<id> partition makes the
        # replay a no-op instead of duplicating rows (effective
        # exactly-once for the committed output).
        (
            batch_df.withColumn("__batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(target)
        )

    (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def windowed_page_counts(
    pages: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Event-time windowed arrival counts with late-data watermark —
    works on a stream (state bounded by the watermark) or a batch frame
    (same code, no state)."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
        )
    )
