"""Source/sink layer: schema-enforced file hops + batch identity.

SURVEY.md §2.C — the reference selects validation targets through
data connectors: whole-table SQL assets (C1), LIMIT-sampled runtime
batches (C2), filename-regex file batches for CSV/parquet (C3/C4,
``/root/reference/great_expectations/great_expectations.yml:42-76``)
and latest-batch selection ``index: -1`` (C5,
``checkpoints/retail_source_checkpoint.yml:42-43``).

Recast for Spark: every reader enforces the explicit page-table
StructType (never schema inference on the data plane), CSV/JSONL hops
base64-wrap the binary ``html`` column (the lossless equivalent of the
reference's CSV↔parquet↔DB format conversions, B5/B6), and batch
identity is a filename-regex parse with capture groups + an
``index``-style selector.
"""

from greatex_spark.sources.files import (  # noqa: F401
    PAGE_SCHEMA,
    PageBatch,
    latest_batch,
    list_batches,
    read_pages,
    sample_batch,
    write_pages,
)
