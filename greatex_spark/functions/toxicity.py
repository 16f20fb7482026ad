"""Toxicity blocklist signals + scrub — the "toxicity" half of the
north rule's "PII/toxicity-scrub" (BASELINE.json north_star: compiled-
regex PII/toxicity scrubbing).

C4 drops any page containing a word from a blocklist (the public
"LDNOOBW" list); RefinedWeb-style pipelines instead score and mask.
Both are one compiled alternation regex here:

- :func:`toxicity_count` — total blocklist matches per document (the
  metrics/gate signal; C4's drop rule is ``count > 0``);
- :func:`scrub_toxicity` — mask matches with ``<TOX>``, same
  byte-identical three-dialect contract as :mod:`pii` (java.util.regex
  / RE2 / CPython ``re`` common subset: the pattern is a
  case-insensitive word-bounded alternation of plain word characters).

The built-in :data:`DEFAULT_BLOCKLIST` is a small demonstration set of
common profanities — production runs load the full public list through
the ``blocklist`` parameter (the same external-artifact seam as the
fastText/KenLM model paths: :func:`load_blocklist` reads one term per
line).  Slur-class terms are deliberately not hardcoded here.

Scale: like the PII chain, this is a single JVM-side regexp pass
inside whole-stage codegen — no UDF, no shuffle; the alternation
compiles once per task.  Matching is case-insensitive via ``(?i)``,
which all three engines support identically for ASCII.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_BLOCKLIST: tuple[str, ...] = (
    "fuck", "shit", "bitch", "asshole", "bastard", "dick", "pussy",
    "whore", "slut",
)

TOX_TOKEN = "<TOX>"


def load_blocklist(path: str) -> tuple[str, ...]:
    """One term per line (the LDNOOBW file format); blank lines and
    ``#`` comments skipped.  Terms must be plain word characters — the
    three-dialect pattern contract rejects anything else."""
    terms = []
    with open(path) as f:
        for line in f:
            t = line.strip().lower()
            if not t or t.startswith("#"):
                continue
            if not re.fullmatch(r"[a-z0-9_]+", t):
                raise ValueError(f"blocklist term not plain-word: {t!r}")
            terms.append(t)
    return tuple(terms)


def toxicity_pattern(blocklist: tuple[str, ...] = DEFAULT_BLOCKLIST) -> str:
    """``(?i)\\b(?:a|b|...)\\b`` — identical semantics in
    java.util.regex, RE2 and CPython ``re`` for plain-word terms."""
    for t in blocklist:
        if not re.fullmatch(r"[A-Za-z0-9_]+", t):
            raise ValueError(f"blocklist term not plain-word: {t!r}")
    return r"(?i)\b(?:" + "|".join(blocklist) + r")\b"


def toxicity_count(
    col: Column | str, blocklist: tuple[str, ...] = DEFAULT_BLOCKLIST
) -> Column:
    """Blocklist matches per document; C4's drop rule is ``> 0``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(toxicity_pattern(blocklist))).cast("long")


def scrub_toxicity(
    col: Column | str, blocklist: tuple[str, ...] = DEFAULT_BLOCKLIST
) -> Column:
    """Mask every blocklist match with ``<TOX>`` (JVM-side, one pass)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, toxicity_pattern(blocklist), TOX_TOKEN)


def scrub_toxicity_py(
    text: str, blocklist: tuple[str, ...] = DEFAULT_BLOCKLIST
) -> str:
    """CPython twin for byte-equality pytest assertions."""
    return re.sub(toxicity_pattern(blocklist), TOX_TOKEN, text)


def scrub_toxicity_duckdb_sql(
    col_expr: str, blocklist: tuple[str, ...] = DEFAULT_BLOCKLIST
) -> str:
    """DuckDB (RE2) twin of :func:`scrub_toxicity`."""
    pat = toxicity_pattern(blocklist).replace("'", "''")
    return f"regexp_replace({col_expr}, '{pat}', '{TOX_TOKEN}', 'g')"


def toxicity_count_duckdb_sql(
    col_expr: str, blocklist: tuple[str, ...] = DEFAULT_BLOCKLIST
) -> str:
    """DuckDB twin of :func:`toxicity_count`."""
    pat = toxicity_pattern(blocklist).replace("'", "''")
    return f"CAST(len(regexp_extract_all({col_expr}, '{pat}')) AS BIGINT)"
