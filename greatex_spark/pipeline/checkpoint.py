"""Checkpoint = (batch reference × suite × actions) — the validation
gate between pipeline stages.

Recasts the reference's checkpoint YAML + CLI-subprocess executor
(``/root/reference/dags/validation.py:12-53``,
``great_expectations/checkpoints/retail_source_checkpoint.yml``) as one
library call: resolve the batch, run the fused-agg suite, persist
typed metrics/lineage rows (replacing the Postgres JSON store + the
shredding trigger at ``/root/reference/database-setup/storedb.sql:33-75``),
and raise :class:`GateFailed` to halt downstream stages on failure —
the AirflowException equivalent.
"""

from __future__ import annotations

import logging
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from greatex_spark.expectations.compiler import GateFailed, ValidationResult, run_suite
from greatex_spark.expectations.spec import Suite
from greatex_spark.tables import Catalog

METRICS_TABLE = "metrics"
LINEAGE_TABLE = "partition_lineage"

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("expectation_suite_name", T.StringType()),
        T.StructField("expectation_name", T.StringType()),
        T.StructField("expectation_column", T.StringType()),
        T.StructField("run_name", T.StringType()),
        T.StructField("batch_identifier", T.StringType()),
        T.StructField("element_count", T.LongType()),
        T.StructField("unexpected_count", T.LongType()),
        T.StructField("unexpected_percent", T.DoubleType()),
        T.StructField("success", T.BooleanType()),
        T.StructField("successful_outcome", T.BooleanType()),
        T.StructField("success_percent", T.DoubleType()),
        T.StructField("evaluated_expectations", T.IntegerType()),
        T.StructField("run_time", T.TimestampType()),
        T.StructField("end_time", T.TimestampType()),
        T.StructField("duration", T.DoubleType()),
        T.StructField("checkpoint_epoch", T.LongType()),
    ]
)

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("table_name", T.StringType()),
        T.StructField("checkpoint_epoch", T.LongType()),
        T.StructField("run_name", T.StringType()),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("row_count", T.LongType()),
    ]
)


@dataclass
class Checkpoint:
    name: str
    suite: Suite
    store_metrics: bool = True
    raise_on_failure: bool = True
    collect_partial_unexpected: bool = True
    # failure-notification hook — the library-call recast of the
    # reference's EmailAction on failed checkpoints
    # (/root/reference/dags/scripts/python/utils.py:36-52,
    # great_expectations/checkpoints/retail_source_checkpoint.yml:20-34).
    # Called with the ValidationResult BEFORE GateFailed is raised; use
    # log_failure_action for the built-in logging notifier, or plug in
    # pager/email senders.
    on_failure: Callable[["ValidationResult"], None] | None = None
    # StoreEvaluationParametersAction recast (SURVEY §2 D4): publish the
    # run's observed metrics to the catalog parameter store so later
    # gates can bound themselves with {"$PARAMETER": ...} kwargs — see
    # greatex_spark.expectations.params.
    store_evaluation_parameters: bool = True
    extra: dict = field(default_factory=dict)


def log_failure_action(validation: ValidationResult) -> None:
    """Built-in on_failure notifier: logs the failed suite and each
    failed expectation (the sandbox stand-in for the reference's SMTP
    EmailAction — same trigger point, same payload)."""
    log = logging.getLogger("greatex_spark.checkpoint")
    stats = validation.statistics
    log.error(
        "checkpoint FAILED: suite=%s batch=%s %d/%d expectations failed",
        validation.suite_name,
        validation.batch_identifier,
        stats["unsuccessful_expectations"],
        stats["evaluated_expectations"],
    )
    for r in validation.results:
        if not r.success:
            log.error(
                "  failed expectation %s(%s): unexpected_count=%s",
                r.expectation_config["expectation_type"],
                r.expectation_config.get("kwargs", {}).get("column", ""),
                r.result.get("unexpected_count"),
            )


def store_metrics(
    spark: SparkSession,
    catalog: Catalog,
    validation: ValidationResult,
    epoch: int,
) -> None:
    rows = [
        {
            k: v
            for k, v in r.items()
            if k in {f.name for f in METRICS_SCHEMA.fields}
        }
        | {"checkpoint_epoch": epoch}
        for r in validation.to_metrics_rows()
    ]
    catalog.append(spark.createDataFrame(rows, METRICS_SCHEMA), METRICS_TABLE)


def store_partition_lineage(
    spark: SparkSession,
    catalog: Catalog,
    df: DataFrame,
    table_name: str,
    epoch: int,
    run_name: str,
) -> None:
    """Per-partition row counts for the committed snapshot — the
    per-partition lineage artifact required by BASELINE.json.  One
    narrow aggregation; partition id comes from the physical layout."""
    lineage = (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("row_count"))
        .select(
            F.lit(table_name).alias("table_name"),
            F.lit(epoch).cast("long").alias("checkpoint_epoch"),
            F.lit(run_name).alias("run_name"),
            F.col("partition_id").cast("int").alias("partition_id"),
            F.col("row_count").cast("long").alias("row_count"),
        )
    )
    # written directly — no driver round-trip: at 100 TB this is one row
    # per partition (~100k rows/stage) and bouncing them through
    # collect()+createDataFrame serializes the whole artifact on the
    # driver for no reason
    catalog.append(lineage, LINEAGE_TABLE)


def run_checkpoint(
    spark: SparkSession,
    df: DataFrame,
    checkpoint: Checkpoint,
    catalog: Catalog | None = None,
    epoch: int = 0,
    run_name: str | None = None,
    batch_identifier: str = "",
    evaluation_parameters: dict | None = None,
) -> ValidationResult:
    from greatex_spark.expectations.params import (
        load_parameters,
        resolve_suite,
        store_parameters,
        validation_parameters,
    )

    # D4: bind {"$PARAMETER": ...} kwargs — explicit mapping wins, else
    # the latest committed values from the catalog parameter store
    # (loaded only when the suite actually uses markers)
    from greatex_spark.expectations.params import suite_has_markers

    params = evaluation_parameters
    if params is None and catalog is not None and suite_has_markers(checkpoint.suite):
        params = load_parameters(spark, catalog)
    suite = resolve_suite(checkpoint.suite, params)
    validation = run_suite(
        df,
        suite,
        run_name=run_name,
        batch_identifier=batch_identifier or checkpoint.name,
        collect_partial_unexpected=checkpoint.collect_partial_unexpected,
    )
    if checkpoint.store_metrics and catalog is not None:
        store_metrics(spark, catalog, validation, epoch)
    if checkpoint.store_evaluation_parameters and catalog is not None:
        store_parameters(
            spark,
            catalog,
            validation_parameters(validation),
            suite_name=validation.suite_name,
            run_name=run_name,
            epoch=epoch,
        )
    if not validation.success and checkpoint.on_failure is not None:
        checkpoint.on_failure(validation)
    if checkpoint.raise_on_failure and not validation.success:
        raise GateFailed(validation)
    return validation
