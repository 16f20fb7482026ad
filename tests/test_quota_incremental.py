"""Domain quota (hash-threshold cap, no window) and incremental exact
dedup against a committed fingerprint index."""

from __future__ import annotations

from pyspark.sql import functions as F

from greatex_spark.operators.dedup import (
    content_fingerprint_index,
    exact_dedup_incremental,
)
from greatex_spark.operators.sampling import domain_quota


def test_domain_quota_small_domains_untouched(spark):
    rows = [(i, "a" if i < 5 else "b") for i in range(15)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = domain_quota(df, "source", cap=10)
    # domain a (5 rows) is under the cap: every row survives exactly
    assert out.where("source = 'a'").count() == 5
    # domain b (10 rows) is AT the cap: hash*n < cap*DENOM always holds
    assert out.where("source = 'b'").count() == 10


def test_domain_quota_caps_hot_domain(spark):
    rows = [(i, "hot") for i in range(2000)] + [(10_000 + i, "cold") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = domain_quota(df, "source", cap=100)
    hot = out.where("source = 'hot'").count()
    # Binomial(2000, 0.05): mean 100, sd ~9.7 — accept ±5 sd
    assert 50 <= hot <= 150
    assert out.where("source = 'cold'").count() == 20
    # determinism: identical survivors on re-run
    again = domain_quota(df, "source", cap=100)
    assert out.select("doc_id").subtract(again.select("doc_id")).count() == 0


def test_incremental_dedup_drops_known_and_batch_dups(spark):
    existing = spark.createDataFrame(
        [(1, "seen before"), (2, "also seen")], "doc_id long, text string"
    )
    idx = content_fingerprint_index(existing)
    batch = spark.createDataFrame(
        [
            (10, "seen  BEFORE "),   # normalizes to a known fingerprint
            (11, "brand new"),
            (12, "brand new"),       # within-batch dup: lowest id wins
            (13, "another fresh one"),
        ],
        "doc_id long, text string",
    )
    kept = exact_dedup_incremental(batch, idx)
    assert sorted(r["doc_id"] for r in kept.collect()) == [11, 13]
    assert kept.columns == ["doc_id", "text"]


def test_incremental_matches_full_dedup_on_union(spark):
    """Incremental over (existing, batch) keeps exactly the batch rows a
    full-corpus exact dedup (md5 fingerprints) would keep."""
    rows = [(i, f"text {i % 7}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    existing = df.where("doc_id < 10")
    batch = df.where("doc_id >= 10")
    inc = {r["doc_id"] for r in
           exact_dedup_incremental(batch, content_fingerprint_index(existing)).collect()}
    # every fingerprint 0..6 already exists in doc_ids 0..9 → nothing new
    assert inc == set()
    fresh = spark.createDataFrame([(50, "genuinely unseen")], "doc_id long, text string")
    inc2 = exact_dedup_incremental(
        batch.union(fresh), content_fingerprint_index(existing)
    )
    assert [r["doc_id"] for r in inc2.collect()] == [50]


def test_top_n_per_group_matches_plain_window(spark):
    """The skew-safe salted two-phase top-n equals one PARTITION BY
    group window exactly, on a skewed input (one group holds 90% of
    rows) and across salt_buckets settings — including buckets=1
    (degenerates to the plain window) and buckets > group size."""
    from pyspark.sql.window import Window

    from greatex_spark.operators.sampling import sample_hash, top_n_per_group

    rows = [(f"id-{i:04d}", "hot" if i % 10 else "rare") for i in range(300)]
    df = (
        spark.createDataFrame(rows, "doc_id string, grp string")
        .withColumn("h", sample_hash(F.col("doc_id"), 3))
        .repartition(7)
    )
    w = Window.partitionBy("grp").orderBy("h", "doc_id")
    expected = (
        df.withColumn("rank", F.row_number().over(w).cast("long"))
        .where("rank <= 4")
    )
    exp = sorted(map(tuple, expected.select("grp", "rank", "doc_id").collect()))
    for buckets in (1, 16, 1000):
        got = top_n_per_group(
            df, "grp", [F.col("h"), F.col("doc_id")], n=4, salt_buckets=buckets
        )
        assert sorted(
            map(tuple, got.select("grp", "rank", "doc_id").collect())
        ) == exp


def test_token_budget_select_matches_global_window(spark):
    """The bucketed token-budget plan equals the single global
    cumulative-window spec exactly — across bucket counts (1 bucket =
    the degenerate global window; more buckets than distinct scores),
    at budget 0 (empty), and at budget >= total (everything kept)."""
    from pyspark.sql.window import Window

    from greatex_spark.operators.sampling import token_budget_select

    rows = [
        (f"d{i:03d}", round(((i * 37) % 100) / 100.0, 2), 5 + (i * 13) % 40)
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, quality_score double, n_tokens long"
    )
    total = sum(r[2] for r in rows)
    w = Window.orderBy(F.col("quality_score").desc(), F.col("doc_id"))

    def spec(budget):
        return sorted(
            r["doc_id"]
            for r in df.withColumn("c", F.sum("n_tokens").over(w))
            .where(F.col("c") <= budget)
            .collect()
        )

    for budget in (0, 700, total, total + 1):
        expected = spec(budget)
        for buckets in (1, 64, 4096):
            got = token_budget_select(df, budget, n_buckets=buckets)
            assert sorted(r["doc_id"] for r in got.collect()) == expected, (
                budget,
                buckets,
            )
            assert got.columns == df.columns
