"""URL canonicalization / domain / dedup operators (operators/urls.py),
including Spark↔DuckDB parity on the rewrite chain."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from greatex_spark.operators.urls import (
    canonicalize_url,
    canonicalize_url_sql,
    dedup_by_url,
    filter_domains,
    host_of,
    host_of_sql,
    registered_domain,
    registered_domain_sql,
)

CASES = [
    # (raw, canonical, host, registered domain)
    ("http://WWW.Site.com:80/a/b/?utm_source=x&id=5#frag",
     "http://site.com/a/b/?id=5", "site.com", "site.com"),
    ("https://shop.example.net:443/page/2/",
     "https://shop.example.net/page/2", "shop.example.net", "example.net"),
    ("https://site.com/a?utm_a=1&utm_b=2", "https://site.com/a",
     "site.com", "site.com"),
    ("https://site.com/a?keep=1&utm_x=2&k2=3", "https://site.com/a?keep=1&k2=3",
     "site.com", "site.com"),
    ("http://deep.sub.example.co.uk/x", "http://deep.sub.example.co.uk/x",
     "deep.sub.example.co.uk", "example.co.uk"),
    ("https://site.com/", "https://site.com/", "site.com", "site.com"),
    ("https://site.com/a?ref=abc", "https://site.com/a", "site.com", "site.com"),
    ("https://localhost/x", "https://localhost/x", "localhost", "localhost"),
]


@pytest.fixture(scope="module")
def url_df(spark):
    return spark.createDataFrame([(c[0],) for c in CASES], ["u"]).cache()


def test_canonicalize_host_domain(spark, url_df):
    out = url_df.select(
        "u",
        canonicalize_url("u").alias("c"),
    ).withColumn("h", host_of("c")).withColumn("d", registered_domain("h"))
    got = {r.u: (r.c, r.h, r.d) for r in out.collect()}
    for raw, canon, host, dom in CASES:
        assert got[raw] == (canon, host, dom), raw


def test_duckdb_twin_parity(url_df):
    con = duckdb.connect()
    csql = canonicalize_url_sql("u")
    hsql = host_of_sql(csql)
    dsql = registered_domain_sql(hsql)
    for raw, canon, host, dom in CASES:
        row = con.execute(
            f"SELECT {csql}, {hsql}, {dsql} FROM (SELECT ? AS u)", [raw]
        ).fetchone()
        assert row == (canon, host, dom), raw


def test_dedup_by_url_keeps_min_variant(spark):
    df = spark.createDataFrame(
        [
            ("https://site.com/a?utm_source=x",),
            ("https://site.com/a#frag",),
            ("https://site.com/b",),
        ],
        ["url"],
    )
    got = sorted(r.url for r in dedup_by_url(df, "url").collect())
    # min() of the two /a variants by raw string
    assert got == ["https://site.com/a#frag", "https://site.com/b"]


def test_filter_domains_list_and_df(spark):
    df = spark.createDataFrame(
        [("https://www.blocked.com/x",), ("https://ok.org/y",)], ["url"]
    )
    got = [r.url for r in filter_domains(df, ["blocked.com"], "url").collect()]
    assert got == ["https://ok.org/y"]
    bl = spark.createDataFrame([("blocked.com",)], ["d"])
    got2 = [r.url for r in filter_domains(df, bl, "url").collect()]
    assert got2 == ["https://ok.org/y"]


def test_canonicalize_is_projection_no_shuffle(spark, url_df):
    plan = url_df.select(canonicalize_url("u"))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
