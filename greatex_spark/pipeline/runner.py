"""The staged, gated, resumable pipeline — EP1 recast.

Reference flow (``/root/reference/dags/retail_data_pipeline.py:110-122``):
validate source → extract → validate raw → transform → validate stage
→ load → validate warehouse → final transform → validate dest.

Here: four snapshot tables, a gate after each write, all inside one
SparkSession:

    bronze (pages)          ← gate: source_suite (schema, url unique,
                                     extraction byte-identity)
    silver (featurized)     ← gate: silver_suite
    kept   (filter + dedup) ← gate: kept_suite (keep-rate corridor)
    gold   (public columns) ← gate: gold_suite (no residual PII)

Resumability (BASELINE.json "resumable from the last committed
snapshot"): each stage's output is committed to the catalog under the
run's ``epoch``; on re-run with ``resume=True`` any stage whose epoch
is already committed is *skipped* — the run picks up exactly after
the last committed snapshot.  Re-running a completed epoch is
idempotent: snapshots are replaced, not appended (the reference's
DROP-and-recreate idempotency, without losing history).

Gates validate the *committed* parquet (read back), not the in-memory
plan — what was validated is exactly what the next stage reads.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from greatex_spark.expectations.compiler import ValidationResult
from greatex_spark.pipeline.checkpoint import (
    Checkpoint,
    run_checkpoint,
    store_partition_lineage,
)
from greatex_spark.pipeline.stages import (
    PipelineConfig,
    dedup,
    featurize,
    filter_kept,
    gold_projection,
    trim_substrings,
)
from greatex_spark.pipeline import suites as S
from greatex_spark.tables import Catalog

BRONZE, SILVER, KEPT, GOLD = "pages_bronze", "pages_silver", "pages_kept", "pages_gold"


@dataclass
class PipelineResult:
    run_name: str
    epoch: int
    validations: dict[str, ValidationResult] = field(default_factory=dict)
    counts: dict[str, int] = field(default_factory=dict)
    skipped: list[str] = field(default_factory=list)
    maintenance: dict[str, dict[str, list[int]]] = field(default_factory=dict)

    def summary(self) -> dict[str, Any]:
        return {
            "run_name": self.run_name,
            "epoch": self.epoch,
            "counts": dict(self.counts),
            "skipped": list(self.skipped),
            "gates": {
                k: v.statistics["success_percent"] for k, v in self.validations.items()
            },
        }


def _stage(
    spark: SparkSession,
    catalog: Catalog,
    result: PipelineResult,
    table: str,
    epoch: int,
    resume: bool,
    compute,
    run_name: str,
) -> DataFrame:
    """Write-or-skip one stage, then return the committed snapshot."""
    if resume and catalog.has_epoch(table, epoch):
        result.skipped.append(table)
    else:
        df = compute()
        catalog.write_snapshot(df, table, epoch)
        committed = catalog.read_snapshot(spark, table, epoch)
        store_partition_lineage(spark, catalog, committed, table, epoch, run_name)
    return catalog.read_snapshot(spark, table, epoch)


def run_pipeline(
    spark: SparkSession,
    catalog: Catalog,
    epoch: int,
    source_df: DataFrame | None = None,
    config: PipelineConfig | None = None,
    run_name: str | None = None,
    resume: bool = True,
) -> PipelineResult:
    """Run (or resume) one epoch of the quality-filter pipeline.

    ``source_df`` is required the first time an epoch runs; afterwards
    the committed bronze snapshot is the source of truth and
    ``source_df`` may be omitted.
    """
    config = config or PipelineConfig()
    run_name = run_name or f"run-{uuid.uuid4().hex[:12]}"
    result = PipelineResult(run_name=run_name, epoch=epoch)

    # -- bronze ----------------------------------------------------------
    if resume and catalog.has_epoch(BRONZE, epoch):
        result.skipped.append(BRONZE)
        bronze = catalog.read_snapshot(spark, BRONZE, epoch)
    else:
        if source_df is None:
            raise ValueError(f"epoch {epoch} has no committed bronze; source_df required")
        if config.extract_from_html:
            # crawl feeds with raw html only: derive text at ingest via
            # the codegen'd regexp extraction (functions/html.py); rows
            # that already carry text keep it
            from pyspark.sql import functions as F

            from greatex_spark.functions.html import html_to_text

            source_df = source_df.withColumn(
                "text",
                F.coalesce(
                    F.nullif(F.col("text"), F.lit("")),
                    html_to_text(F.decode(F.col("html"), "UTF-8")),
                ),
            )
        if config.salted_bronze_layout:
            # crawl feeds arrive clustered by domain (hot domains →
            # straggler partitions); salt-spread on hash(url) before the
            # first commit so every downstream stage starts balanced
            from greatex_spark.operators.skew import salted_repartition

            source_df = salted_repartition(source_df, "url")
        catalog.write_snapshot(source_df, BRONZE, epoch)
        bronze = catalog.read_snapshot(spark, BRONZE, epoch)
        store_partition_lineage(spark, catalog, bronze, BRONZE, epoch, run_name)
    result.validations["source"] = run_checkpoint(
        spark, bronze,
        Checkpoint(
            "source",
            S.source_suite(html_extracted=config.extract_from_html),
        ),
        catalog, epoch,
        run_name, f"{BRONZE}@{epoch}",
    )
    n_bronze = result.counts[BRONZE] = result.validations["source"].results[1].result[
        "observed_value"
    ]

    # -- silver ----------------------------------------------------------
    silver = _stage(
        spark, catalog, result, SILVER, epoch, resume,
        lambda: featurize(bronze, config), run_name,
    )
    result.validations["silver"] = run_checkpoint(
        spark, silver, Checkpoint("silver", S.silver_suite()), catalog, epoch,
        run_name, f"{SILVER}@{epoch}",
    )

    # -- kept (filter + dedup) --------------------------------------------
    lo = int(n_bronze * config.keep_fraction_band[0])
    hi = int(n_bronze * config.keep_fraction_band[1])
    kept = _stage(
        spark, catalog, result, KEPT, epoch, resume,
        lambda: trim_substrings(dedup(filter_kept(silver), config), config),
        run_name,
    )
    result.validations["kept"] = run_checkpoint(
        spark, kept, Checkpoint("kept", S.kept_suite(lo, hi)), catalog, epoch,
        run_name, f"{KEPT}@{epoch}",
    )
    result.counts[KEPT] = result.validations["kept"].results[0].result["observed_value"]

    # -- gold --------------------------------------------------------------
    gold = _stage(
        spark, catalog, result, GOLD, epoch, resume,
        lambda: gold_projection(kept), run_name,
    )
    result.validations["gold"] = run_checkpoint(
        spark, gold, Checkpoint("gold", S.gold_suite(config.target_lang)), catalog,
        epoch, run_name, f"{GOLD}@{epoch}",
    )
    result.counts[GOLD] = result.validations["gold"].results[1].result.get(
        "element_count", result.counts[KEPT]
    )
    # D5 recast: one markdown report per run next to the catalog, plus
    # the HTML data-docs page + index (the reference's static site)
    from greatex_spark.pipeline.report import write_data_docs, write_run_report

    write_run_report(catalog.root, run_name, epoch, result.validations, result.counts)
    write_data_docs(catalog.root, run_name, epoch, result.validations, result.counts)

    # -- retention (opt-in) ------------------------------------------------
    # only after every gate of THIS run passed and its epoch is fully
    # committed: expire staged-table epochs beyond the resume window and
    # GC torn-write orphan directories.  The append-only metrics/lineage
    # tables are never expired — they are the audit trail.
    if config.retain_epochs is not None:
        for table in (BRONZE, SILVER, KEPT, GOLD):
            result.maintenance[table] = {
                "expired_epochs": catalog.expire_snapshots(
                    table, keep_last=config.retain_epochs
                ),
                "orphans_removed": catalog.remove_orphans(
                    table, min_age_sec=config.orphan_min_age_sec
                ),
            }
    return result
