"""Clustered-embedding generator + probe-scan ANN hot paths (the
crossover operators: IVF / LSH restricted scans vs brute force)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from greatex_spark.embeddings import (
    cluster_centroids,
    generate_clustered_embeddings,
)
from greatex_spark.operators.ann import (
    _query_probe_map,
    _vec_matrix,
    assign_cells_arrow,
    brute_force_topk,
    ivf_topk_arrow,
    lsh_topk_probe_arrow,
    train_centroids,
)

N, DIM, NC = 4000, 32, 16


@pytest.fixture(scope="module")
def emb(spark):
    df = (
        generate_clustered_embeddings(spark, N, dim=DIM, n_clusters=NC, seed=13)
        .repartition(8)
        .cache()
    )
    df.count()
    return df


@pytest.fixture(scope="module")
def exact_pairs(spark, emb):
    q = emb.where(F.col("vec_id") < 64)
    return {(r.query_id, r.neighbor_id) for r in brute_force_topk(q, emb, k=5).collect()}


def test_generator_deterministic_across_partitionings(spark):
    """Noise is counter-based (SplitMix64 of (seed, id, component)), so
    any partitioning of the id range yields identical bytes."""
    a = generate_clustered_embeddings(spark, 500, dim=16, n_clusters=8, partitions=1)
    b = generate_clustered_embeddings(spark, 500, dim=16, n_clusters=8, partitions=7)

    def chk(df):
        return df.agg(
            F.bit_xor(F.xxhash64("vec_id", "cluster", F.col("embedding").cast("array<double>"))).alias("h"),
            F.count("*").alias("n"),
        ).collect()[0]

    assert chk(a) == chk(b)


def test_generator_cluster_structure(spark, emb):
    """Every vector is nearer its own centroid than any other — the
    clustered regime the approximate indexes exploit."""
    cents = cluster_centroids(NC, DIM, seed=13)
    rows = emb.limit(500).collect()
    vm = _vec_matrix([r.embedding for r in rows])
    d2 = ((vm[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assert (np.argmin(d2, axis=1) == np.array([r.cluster for r in rows])).all()


def test_ivf_arrow_full_probe_equals_exact(spark, emb, exact_pairs):
    """nprobe == nlist probes every cell → the probe scan must return
    exactly the brute-force result (same rounding, same tie-break)."""
    q = emb.where(F.col("vec_id") < 64)
    got = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk_arrow(q, emb, k=5, nlist=8, nprobe=8).collect()
    }
    assert got == exact_pairs


def test_ivf_arrow_partial_probe_recall(spark, emb, exact_pairs):
    q = emb.where(F.col("vec_id") < 64)
    got = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk_arrow(q, emb, k=5, nlist=NC, nprobe=2).collect()
    }
    recall = len(exact_pairs & got) / len(exact_pairs)
    assert recall >= 0.9, recall


def test_lsh_probe_arrow_recall(spark, emb, exact_pairs):
    q = emb.where(F.col("vec_id") < 64)
    got = {
        (r.query_id, r.neighbor_id)
        for r in lsh_topk_probe_arrow(
            q, emb, dim=DIM, k=5, num_bits=10, multiprobe=2
        ).collect()
    }
    recall = len(exact_pairs & got) / len(exact_pairs)
    assert recall >= 0.9, recall


def test_lsh_probe_arrow_multitable_full_coverage_equals_exact(spark, emb, exact_pairs):
    """num_bits=2 with multiprobe=2 probes all 4 buckets of every table,
    so with ANY number of tables the candidate set is the whole corpus
    and the result must equal brute force exactly — which also proves
    the multi-table (query, neighbor) dedup: a duplicate surviving the
    batch merge would displace a true neighbor from some top-k."""
    q = emb.where(F.col("vec_id") < 64)
    got = {
        (r.query_id, r.neighbor_id)
        for r in lsh_topk_probe_arrow(
            q, emb, dim=DIM, k=5, num_bits=2, multiprobe=2, num_tables=3
        ).collect()
    }
    assert got == exact_pairs


def test_lsh_probe_arrow_multitable_ranks_distinct(spark, emb):
    """Multi-table output has exactly one row per (query, rank), ranks
    are 1..k, and neighbors within a query are distinct."""
    q = emb.where(F.col("vec_id") < 8)
    rows = lsh_topk_probe_arrow(
        q, emb, dim=DIM, k=5, num_bits=4, multiprobe=1, num_tables=4
    ).collect()
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    for qid, rs in per_q.items():
        assert sorted(r.rank for r in rs) == list(range(1, len(rs) + 1)), qid
        assert len({r.neighbor_id for r in rs}) == len(rs), qid


def test_lsh_probe_arrow_multitable_beats_single_table_recall(spark, emb, exact_pairs):
    """The recall lever the parameter exists for: at equal bits, 4
    tables strictly dominate 1 table's candidate set (table 0 shares
    the seed), so recall is monotonically ≥ — and on this corpus
    strictly better."""
    q = emb.where(F.col("vec_id") < 64)

    def recall(T):
        got = {
            (r.query_id, r.neighbor_id)
            for r in lsh_topk_probe_arrow(
                q, emb, dim=DIM, k=5, num_bits=8, multiprobe=1, num_tables=T
            ).collect()
        }
        return len(exact_pairs & got) / len(exact_pairs)

    r1, r4 = recall(1), recall(4)
    assert r4 >= r1
    assert r4 >= 0.9, (r1, r4)


def test_candidate_fraction_instrumentation(spark, emb):
    """assign_cells_arrow + the probe map reproduce the exact fraction
    of (query, corpus) pairs the IVF scan scores — and with a partial
    probe it is genuinely < 1."""
    from greatex_spark.operators.ann import _hash_sample

    rows = _hash_sample(emb, "vec_id", "embedding", 1024).collect()
    cents = train_centroids(_vec_matrix([r[1] for r in rows]), NC, 5)
    q = emb.where(F.col("vec_id") < 64)
    qm = _vec_matrix([r.embedding for r in q.collect()])
    _, cq = _query_probe_map(qm, np.array(cents), 2)
    counts = {
        r.cell: r.n
        for r in assign_cells_arrow(emb, cents)
        .groupBy("cell")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert sum(counts.values()) == N
    frac = sum(counts.get(c, 0) * len(ql) for c, ql in cq.items()) / (N * 64)
    assert 0 < frac < 0.5, frac


class TestEmbeddingDecontaminate:
    def test_contaminated_rows_dropped(self, spark):
        from greatex_spark.operators.ann import embedding_decontaminate

        rows = [
            (0, [1.0, 0.0, 0.0], "bench"),   # benchmark member
            (1, [0.99, 0.1, 0.0], "near"),   # cosine ~0.995 -> contaminated
            (2, [0.0, 1.0, 0.0], "clean"),   # orthogonal -> survives
            (3, [-1.0, 0.0, 0.0], "anti"),   # cosine -1 -> survives
        ]
        df = spark.createDataFrame(
            rows, "vec_id int, embedding array<float>, label string"
        )
        bench = df.where(F.col("vec_id") == 0)
        out = embedding_decontaminate(df, bench, dim=3, threshold=0.9)
        assert {r.vec_id for r in out.collect()} == {2, 3}

    def test_duckdb_twin_parity(self, spark, emb):
        import duckdb

        from greatex_spark.operators.ann import (
            embedding_decontaminate,
            embedding_decontaminate_duckdb_sql,
        )

        corpus = emb.where(F.col("vec_id") < 500)
        bench = corpus.where(F.col("vec_id") % 17 == 0)
        got = {
            r.vec_id
            for r in embedding_decontaminate(
                corpus, bench, dim=DIM, threshold=0.6
            ).collect()
        }
        pdf = corpus.select("vec_id", "embedding").toPandas()
        con = duckdb.connect()
        con.register("embeddings", pdf)
        sql = embedding_decontaminate_duckdb_sql(
            "t.vec_id",
            benchmark_sql="SELECT * FROM embeddings WHERE vec_id % 17 = 0",
            dim=DIM,
            threshold=0.6,
        )
        want = {r[0] for r in con.execute(sql).fetchall()}
        assert got == want

    def test_corpus_never_shuffles_for_decision(self, spark, emb):
        from greatex_spark.operators.ann import embedding_decontaminate

        bench = emb.where(F.col("vec_id") % 97 == 0)
        plan = (
            embedding_decontaminate(emb, bench, dim=DIM, threshold=0.9)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" in plan and "LeftSemi" in plan
        # both joins broadcast: no hash-partitioned exchange anywhere
        assert "Exchange hashpartitioning" not in plan
