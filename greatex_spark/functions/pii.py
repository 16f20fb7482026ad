"""PII scrubbing as an ordered chain of JVM-side regexp_replace calls.

Byte-identical determinism is the contract (BASELINE.json: "byte-
identical scrubbed text per url").  To make Spark (java.util.regex),
DuckDB (RE2) and CPython (re) agree byte-for-byte, every pattern is
restricted to the common dialect: ASCII character classes, bounded
quantifiers, non-capturing groups, ``\\b`` word boundaries — no
lookaround, no backrefs, no Unicode classes (SURVEY.md §7 "hard
parts").  The pytest oracle applies the *same* pattern list with
Python ``re`` (:func:`scrub_pii_py`) and asserts byte equality; the
DuckDB oracle SQL is generated from the same list
(:func:`scrub_pii_duckdb_sql`).

Order matters and is fixed: EMAIL → SSN → IPV4 → PHONE (e.g. a phone
regex must never see the digits of an already-scrubbed SSN).

This generalizes the reference's conditional-value-replacement
transform (``/root/reference/dags/transformations.py:15`` —
per-row Python) into vectorized, codegen'd column expressions.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — ordered.  Patterns are valid and
# equivalent in java.util.regex, RE2, and Python re.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ssn",
        r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
        "<SSN>",
    ),
    (
        "ipv4",
        r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
        "<IP>",
    ),
    (
        "phone",
        r"(?:\+?1[-. ])?(?:\([0-9]{3}\)[-. ]?|[0-9]{3}[-. ])[0-9]{3}[-. ][0-9]{4}\b",
        "<PHONE>",
    ),
)


def scrub_pii(col: Column | str) -> Column:
    """Chained regexp_replace over the fixed pattern list (JVM-side)."""
    out = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def with_scrubbed_text(
    df: DataFrame, text_col: str = "text", out_col: str = "text_scrubbed"
) -> DataFrame:
    return df.withColumn(out_col, scrub_pii(text_col))


_COMPILED = [(re.compile(pat), repl) for _, pat, repl in PII_PATTERNS]


def scrub_pii_py(text: str) -> str:
    """Reference implementation (CPython re, same patterns, same order)
    used by pytest to assert byte-identical output vs the Spark path."""
    for cre, repl in _COMPILED:
        text = cre.sub(repl, text)
    return text


def scrub_pii_duckdb_sql(col_expr: str) -> str:
    """DuckDB SQL expression applying the identical scrub chain (RE2),
    for the driver's oracle harness."""
    out = col_expr
    for _, pat, repl in PII_PATTERNS:
        pat_sql = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{pat_sql}', '{repl}', 'g')"
    return out


def pii_count(col: Column | str) -> Column:
    """Total count of PII matches in a text column (for metrics rows)."""
    c = F.col(col) if isinstance(col, str) else col
    total = F.lit(0)
    for _, pat, _ in PII_PATTERNS:
        total = total + F.regexp_count(c, F.lit(pat))
    return total.cast("long")
