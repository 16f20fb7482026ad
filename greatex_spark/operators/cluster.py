"""Duplicate clustering: transitive closure over near-duplicate pair
edges (connected components), DataFrame-only.

The dedup operators in :mod:`greatex_spark.operators.dedup` drop a row
when it verifies against a lower-id bucket representative — a local
rule.  Web-scale pipelines (CCNet / RefinedWeb style) often instead
want one survivor per *transitive* duplicate cluster: if A~B and B~C
then A,B,C form one cluster even when A and C never share a bucket.
This module closes the verified pair edges into components.

Scale design (100 TB):

- The edge set is orders of magnitude smaller than the corpus (only
  verified near-dup pairs), so every per-iteration join/aggregate runs
  over edges + current labels, never document text.
- Label propagation is min-label with PATH DOUBLING: each round
  propagates through the union of graph edges and the current
  node→label links, so an established representative link acts as a
  shortcut and convergence is O(log diameter) rounds rather than
  O(diameter).  Duplicate clusters are additionally dense (near-dup
  similarity is close to transitive), so in practice 2–3 rounds
  suffice.
- Each round truncates the iterative lineage: executor-local
  ``localCheckpoint(eager=True)`` by default (fastest; lost on
  executor failure), or reliable ``checkpoint()`` into a caller-given
  ``checkpoint_dir`` (HDFS/object store) for real clusters — the
  ``_checkpointer`` seam.  The convergence probe is one tiny
  label-sum aggregate per round, no data collected.

There is no counterpart in the reference (GreatEx validates tables; it
never deduplicates — this is part of the beyond-reference training-data
brief).  Oracle: DuckDB replays components with a recursive CTE over
the same md5-family verified pairs (see
``duplicate_clusters_duckdb_sql``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from greatex_spark.operators.dedup import (
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_duckdb_ctes,
)


def _checkpointer(checkpoint_dir: str | None):
    """Pick the per-round lineage-truncation strategy.

    ``localCheckpoint`` (default) materializes on executor local disk —
    fastest, but an executor loss discards blocks whose lineage was
    already truncated, failing the job.  Passing ``checkpoint_dir``
    switches to reliable ``DataFrame.checkpoint()`` into that
    (HDFS/object-store) directory — the right mode on a real cluster
    where executors come and go; the dir is set once per SparkContext
    (Spark keeps a single global checkpoint dir)."""
    if checkpoint_dir is None:
        return lambda df: df.localCheckpoint(eager=True)

    def reliable(df: DataFrame) -> DataFrame:
        sc = df.sparkSession.sparkContext
        # getCheckpointDir() returns the RESOLVED URI (file:/... or
        # hdfs://...) with a generated subdir, so compare by substring
        # of the scheme-less path, not a raw startswith on the user dir
        current = sc.getCheckpointDir()
        wanted = checkpoint_dir.rstrip("/").split("://")[-1].lstrip("/")
        if current is None or wanted not in str(current):
            sc.setCheckpointDir(checkpoint_dir)
        return df.checkpoint(eager=True)

    return reliable


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 25,
    checkpoint_dir: str | None = None,
    on_round=None,
) -> DataFrame:
    """Components of the undirected graph given by ``edges`` — returns
    ``(node, component)`` where ``component`` is the minimum node id
    reachable from ``node``; only nodes appearing in an edge are
    emitted (isolated nodes are their own component — callers coalesce).

    ``max_iters`` bounds the path-doubling loop: 25 doublings cover any
    graph whose diameter fits in a long, so hitting the cap means the
    convergence probe itself is broken, not the graph too large.

    ``checkpoint_dir`` switches per-round lineage truncation from
    executor-local ``localCheckpoint`` to reliable ``checkpoint()``
    into that directory (survives executor loss — see
    :func:`_checkpointer`).

    ``on_round`` (optional ``Callable[[int], None]``) fires after each
    round's labels are materialized (checkpoint + convergence probe
    both complete), with the 1-based round index — a measurement seam
    for per-round wall/shuffle instrumentation (``bench.py`` cc_1m);
    the final converged round (the no-change probe round) fires too."""
    ckpt = _checkpointer(checkpoint_dir)
    e = (
        edges.select(F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b"))
        .where(F.col("a") != F.col("b"))
    )
    # checkpoint the (usually expensive) edge derivation ONCE — every
    # iteration reuses the materialized symmetric edge set instead of
    # re-running the upstream candidate/verify pipeline
    e = ckpt(e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct())
    labels = ckpt(
        e.select(F.col("a").alias("node")).distinct()
        .withColumn("label", F.col("node"))
    )
    # convergence probe: per-node labels only ever decrease, so the
    # label sum strictly decreases until fixpoint — one tiny agg per
    # round instead of a join.  DECIMAL(38,0) accumulator: int64 would
    # overflow under ANSI mode with billions of 60-bit hash ids
    def label_sum(df: DataFrame):
        return df.agg(F.sum(F.col("label").cast("decimal(38,0)"))).first()[0]

    prev_sum = label_sum(labels)
    if prev_sum is None:  # no edges at all
        return labels.select("node", F.col("label").alias("component"))
    for _round in range(1, max_iters + 1):
        # propagate min labels through graph edges AND current label
        # links (both directions) — the label links are the doubling
        links = e.unionByName(
            labels.select(F.col("node").alias("a"), F.col("label").alias("b"))
        )
        links = links.unionByName(
            links.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        cand = links.join(
            labels.select(F.col("node").alias("b"), "label"), on="b"
        ).select(F.col("a").alias("node"), "label")
        labels = ckpt(
            cand.unionByName(labels.select("node", "label"))
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        new_sum = label_sum(labels)
        if on_round is not None:
            on_round(_round)
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels.select("node", F.col("label").alias("component"))


def duplicate_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    num_perm: int = 16,
    num_bands: int = 8,
    family: str = "md5",
    candidate_cap: int | None = 64,
    max_iters: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Per-document duplicate-cluster assignment: verified near-dup
    pairs (:func:`dedup.ngram_jaccard_pairs`) closed transitively.
    Returns every input row's ``(id_col, cluster_id, cluster_size,
    is_survivor)`` — ``cluster_id`` is the minimum doc id of the
    cluster (singletons are their own cluster), ``is_survivor`` marks
    the one row per cluster a CC-based dedup would keep.

    ``checkpoint_dir`` → reliable iteration checkpoints (cluster mode);
    default is executor-local (see :func:`connected_components`)."""
    pairs = ngram_jaccard_pairs(
        df, text_col, id_col, n, threshold, num_perm, num_bands, family, candidate_cap
    )
    cc = connected_components(pairs, "__ida", "__idb", max_iters, checkpoint_dir)
    assigned = (
        df.select(F.col(id_col))
        .join(cc, on=F.col(id_col) == F.col("node"), how="left")
        .select(
            id_col,
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
        )
    )
    sizes = assigned.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return (
        assigned.join(sizes, on="cluster_id")
        .select(
            id_col,
            "cluster_id",
            "cluster_size",
            (F.col(id_col) == F.col("cluster_id")).alias("is_survivor"),
        )
    )


def connected_components_duckdb_sql(
    edges_cte: str, src: str = "src", dst: str = "dst"
) -> str:
    """Recursive-CTE twin of :func:`connected_components`: min reachable
    node per node over the symmetric closure of ``edges_cte``.  State
    space is (node, reachable-node) pairs deduped by UNION — fine for
    oracle-scale components, exponential nowhere."""
    return f"""
__sym AS (SELECT {src} AS a, {dst} AS b FROM {edges_cte} WHERE {src} != {dst}
          UNION SELECT {dst}, {src} FROM {edges_cte} WHERE {src} != {dst}),
__reach(node, label) AS (
  SELECT a, a FROM __sym
  UNION
  SELECT s.a, r.label FROM __sym s JOIN __reach r ON r.node = s.b),
__cc AS (SELECT node, min(label) AS component FROM __reach GROUP BY node)"""


def duplicate_clusters_duckdb_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    num_perm: int = 16,
    num_bands: int = 8,
    candidate_cap: int | None = 64,
) -> str:
    """Oracle for :func:`duplicate_clusters` (md5 family)."""
    pair_ctes = ngram_jaccard_pairs_duckdb_ctes(
        table, id_col, text_col, n, threshold, num_perm, num_bands, candidate_cap
    )
    cc_ctes = connected_components_duckdb_sql("__vpairs", "ida", "idb")
    return f"""
WITH RECURSIVE {pair_ctes},{cc_ctes},
__assigned AS (
  SELECT t.{id_col}, COALESCE(c.component, t.{id_col}) AS cluster_id
  FROM {table} t LEFT JOIN __cc c ON c.node = t.{id_col})
SELECT a.{id_col}, a.cluster_id,
       CAST(s.cluster_size AS BIGINT) AS cluster_size,
       a.{id_col} = a.cluster_id AS is_survivor
FROM __assigned a
JOIN (SELECT cluster_id, count(*) AS cluster_size
      FROM __assigned GROUP BY cluster_id) s USING (cluster_id)
"""
