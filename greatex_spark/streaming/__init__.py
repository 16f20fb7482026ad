"""Structured Streaming extension: incremental, gated, resumable ingest.

The reference is batch-only (daily cron, SURVEY.md §2 "Streaming:
none"); this layer is the Spark-first extension for continuous arrival
of page files: ``readStream`` over a landing directory with the
enforced page schema, ``Trigger.AvailableNow`` micro-batches,
per-micro-batch validation gates + lineage via ``foreachBatch``, and
exactly-once resume from the streaming checkpoint (files already
committed to the checkpoint are never reprocessed).
"""

from greatex_spark.streaming.ingest import (  # noqa: F401
    gated_ingest,
    windowed_page_counts,
)
from greatex_spark.streaming.stateful import (  # noqa: F401
    running_lang_stats,
    streaming_exact_dedup,
)
