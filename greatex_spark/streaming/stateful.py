"""Custom stateful streaming operator via ``applyInPandasWithState``.

:func:`running_lang_stats` keeps per-language cumulative corpus
statistics (pages, characters) in managed state across micro-batches —
the streaming counterpart of a whole-history aggregate, and the
pattern-template for any custom stateful quality monitor (per-domain
drift counters, rolling keep-rates, …): state is an explicit typed
tuple, updates arrive as Arrow batches, and the operator emits the
refreshed state row for every group touched in the batch.

Scale: state lives in the state store partitioned by the group key
(lang → tiny cardinality here; per-domain keys shard across executors).
Each micro-batch shuffles only that batch's rows by key; the state
store is incremental (RocksDB-backed on a real cluster via
``spark.sql.streaming.stateStore.providerClass``).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "lang string, n_pages long, n_chars long"
STATE_SCHEMA = "n_pages long, n_chars long"


def _update_lang_stats(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n_pages, n_chars = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n_pages += len(pdf)
        n_chars += int(pdf["text"].str.len().fillna(0).sum())
    state.update((n_pages, n_chars))
    yield pd.DataFrame(
        {"lang": [key[0]], "n_pages": [n_pages], "n_chars": [n_chars]}
    )


def running_lang_stats(pages: DataFrame) -> DataFrame:
    """Cumulative (pages, chars) per language over the life of the
    stream; emits the refreshed totals for every language seen in each
    micro-batch (``update`` semantics)."""
    return pages.select("lang", "text").groupBy("lang").applyInPandasWithState(
        _update_lang_stats,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


DEDUP_OUTPUT_SCHEMA = "url string, text string, lang string"
DEDUP_STATE_SCHEMA = "seen boolean"


def _emit_first_seen(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    if state.exists:
        yield pd.DataFrame(columns=["url", "text", "lang"])
        return
    state.update((True,))
    first = None
    for pdf in pdfs:
        cand = pdf.sort_values("url").iloc[:1]
        if first is None or cand["url"].iloc[0] < first["url"].iloc[0]:
            first = cand
    yield first[["url", "text", "lang"]]


def streaming_exact_dedup(pages: DataFrame) -> DataFrame:
    """Exact dedup ACROSS micro-batches: the streaming counterpart of
    ``operators.dedup.exact_dedup`` — the first page (lowest url) per
    normalized-content fingerprint is emitted once, every later
    duplicate in any later batch is dropped via a ``seen`` flag in
    managed state.

    Scale: state is one boolean per distinct fingerprint, sharded by
    the state store across executors (RocksDB-backed on a cluster);
    each micro-batch shuffles only its own rows by fingerprint.  This
    is how continuous ingest stays deduped without ever re-reading the
    committed corpus — the streaming twin of
    ``exact_dedup_incremental``, with the state store playing the
    fingerprint index."""
    from pyspark.sql import functions as F

    from greatex_spark.functions.textstats import normalize_for_fingerprint

    keyed = pages.select(
        F.xxhash64(normalize_for_fingerprint("text")).alias("fp"),
        "url", "text", "lang",
    )
    return keyed.groupBy("fp").applyInPandasWithState(
        _emit_first_seen,
        DEDUP_OUTPUT_SCHEMA,
        DEDUP_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
