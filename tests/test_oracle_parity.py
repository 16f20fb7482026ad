"""Driver-contract parity: every ``oracle_sql()`` entry must match its
Spark query on the sf0.001 corpus (row count, sorted column names,
values) — the same comparison the driver harness performs at sf0.01.

Uses sf0.001 to keep the suite fast; ``tools/check_oracle.py`` runs the
identical check at sf0.01.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"
# corpus-dependent oracles (IVF centroid literals) must retrain on the
# SAME corpus this suite runs against — set before oracle_sql() is called
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR

import __spark_entry__ as entrymod  # noqa: E402
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _eq(a, b):
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        return (math.isnan(fa) and math.isnan(fb)) or fa == fb
    return a == b


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql()))
def test_oracle_parity(spark, duck, name):
    sdf = entrymod.queries()[name](spark, SF_DIR).toPandas()
    ddf = duck.execute(entrymod.oracle_sql()[name]).fetchdf()
    assert len(sdf) == len(ddf), f"row count {len(sdf)} != {len(ddf)}"
    assert sorted(sdf.columns) == sorted(ddf.columns)
    s, d = _norm(sdf), _norm(ddf)
    for c in s.columns:
        mism = [
            (i, x, y) for i, (x, y) in enumerate(zip(s[c], d[c])) if not _eq(x, y)
        ]
        assert not mism, f"col {c}: first mismatches {mism[:3]}"


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["doc_id", "text", "lang", "n_tokens"]


def test_rows_only_queries_run(spark):
    oracles = entrymod.oracle_sql()
    for name, fn in entrymod.queries().items():
        if name in oracles:
            continue
        assert fn(spark, SF_DIR).count() >= 0, name
