"""CCNet-style corpus-wide line dedup (operators/linededup.py)."""

from __future__ import annotations

import duckdb
import pytest

from greatex_spark.operators.linededup import (
    dedup_lines,
    dedup_lines_duckdb_sql,
    remove_boilerplate_lines,
    remove_boilerplate_lines_duckdb_sql,
)

LONG_A = "This boilerplate navigation line is long enough to participate"
LONG_B = "Another long unique content line that only one document contains"
LONG_C = "A third long line shared by the last two documents in the corpus"

ROWS = [
    ("a", f"{LONG_A}\nshort\n{LONG_B}"),
    ("b", f"{LONG_A}\n{LONG_C}"),
    ("c", f"{LONG_A}\n{LONG_C}"),
    ("d", LONG_A),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(ROWS, ["url", "text"])


def test_owner_keeps_short_lines_survive(spark, corpus):
    got = {r.url: r.text for r in dedup_lines(corpus).collect()}
    # 'a' (min id) owns LONG_A and keeps everything incl. the short line
    assert got["a"] == f"{LONG_A}\nshort\n{LONG_B}"
    # 'b' owns LONG_C, loses LONG_A
    assert got["b"] == LONG_C
    # 'c' loses both long lines and vanishes; 'd' loses its only line
    assert "c" not in got and "d" not in got


def test_in_doc_repeats_kept_by_owner(spark):
    df = spark.createDataFrame(
        [("a", f"{LONG_A}\n{LONG_A}"), ("b", LONG_A)], ["url", "text"]
    )
    got = {r.url: r.text for r in dedup_lines(df).collect()}
    assert got == {"a": f"{LONG_A}\n{LONG_A}"}


def test_duckdb_twin_parity(spark, corpus):
    spark_out = {(r.url, r.text) for r in dedup_lines(corpus).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(url VARCHAR, text VARCHAR)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?)", ROWS)
    duck_out = set(con.execute(dedup_lines_duckdb_sql("t")).fetchall())
    assert spark_out == duck_out


def test_two_shuffles_only(spark, corpus):
    plan = dedup_lines(corpus)._jdf.queryExecution().executedPlan().toString()
    # owner agg exchange + reassembly exchange (+ their partial sides
    # reuse them); no window, no extra repartition
    assert plan.count("Exchange hashpartitioning") <= 3
    assert "Window" not in plan


# --- document-frequency boilerplate removal ---------------------------------

BP_ROWS = [
    ("a", f"{LONG_A}\nshort\n{LONG_B}"),
    ("b", f"{LONG_A}\n{LONG_C}"),
    ("c", f"{LONG_C}\n{LONG_A}"),
    ("d", f"unique tail for d that is long enough to dedup-participate\n{LONG_A}"),
    ("e", LONG_A),
]


def test_boilerplate_removed_everywhere(spark):
    df = spark.createDataFrame(BP_ROWS, ["url", "text"])
    got = {
        r.url: (r.text, r.n_boilerplate_removed)
        for r in remove_boilerplate_lines(df, df_threshold=4).collect()
    }
    # LONG_A reaches df=5 >= 4 -> every copy cut; LONG_C df=2 survives
    assert got["a"] == (f"short\n{LONG_B}", 1)
    assert got["b"] == (LONG_C, 1)
    assert got["c"] == (LONG_C, 1)
    assert got["d"][0].startswith("unique tail") and got["d"][1] == 1
    # 'e' was only boilerplate -> vanishes entirely
    assert "e" not in got


def test_boilerplate_below_threshold_untouched(spark):
    df = spark.createDataFrame(BP_ROWS[:3], ["url", "text"])
    got = {r.url: r.text for r in remove_boilerplate_lines(df, df_threshold=4).collect()}
    assert got == {u: t for u, t in BP_ROWS[:3]}


def test_boilerplate_duckdb_twin_parity(spark):
    df = spark.createDataFrame(BP_ROWS, ["url", "text"])
    spark_out = {
        (r.url, r.text, r.n_boilerplate_removed)
        for r in remove_boilerplate_lines(df, df_threshold=4).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(url VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", BP_ROWS)
    duck_out = set(
        con.execute(
            remove_boilerplate_lines_duckdb_sql("t", df_threshold=4)
        ).fetchall()
    )
    assert spark_out == duck_out


def test_boilerplate_hot_set_broadcast(spark):
    df = spark.createDataFrame(BP_ROWS, ["url", "text"])
    plan = (
        remove_boilerplate_lines(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the decision join must be a broadcast anti-join: corpus text never
    # shuffles to learn which lines are hot
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
