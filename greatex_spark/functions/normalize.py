"""Unicode/text normalization — the ingest-side cleanup every web
corpus runs before hashing or featurizing anything (an "ftfy-lite").

Un-normalized text silently breaks the downstream spec operators:
"café" in NFC and NFD are different byte strings, so exact dedup,
MinHash shingles, and the byte-stable scrub contract all see two
distinct documents for the same page.  The deterministic chain here:

1. newline canonicalization — ``\\r\\n`` and bare ``\\r`` become ``\\n``,
2. strip C0/C1-ish control characters (keep ``\\t``/``\\n``),
3. collapse runs of 3+ newlines to a paragraph break (2),
4. Unicode NFC composition.

Steps 1-3 are native ``regexp_replace`` column expressions (JVM-side,
whole-stage codegen; patterns restricted to the Java-regex/RE2/Python
common dialect like functions/pii.py).  Step 4 needs the Unicode
character database, which Spark SQL does not expose — it is the one
Arrow-vectorized pandas UDF in this module (``Series.str.normalize``,
C-implemented per batch; same vectorized-only contract as the
langid/perplexity model stages).  The DuckDB twin replays 1-3 with the
same regexes and 4 with ``nfc_normalize`` (utf8proc); parity across
CPython unicodedata / utf8proc is pinned by test on composition,
compatibility-preserving, and multi-combining-mark cases.

Scale notes: pure projection — zero shuffles; the UDF cost is one
Arrow round-trip over the text column, and running it FIRST means
every downstream stage shares the normalized bytes instead of
re-normalizing per operator.

Reference scope: generalizes the reference's cleaning repair step
(/root/reference/source-data/clean_trial_dataset.py:8-20 — per-row
string repairs in pandas) to corpus-scale text hygiene.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# keep \t (0x09) and \n (0x0A); \r is already rewritten to \n by the
# time this runs
CONTROL_CLASS = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


# StringType() (not the DDL string "string"): parsing a DDL return
# type needs an active SparkContext, which would make importing this
# module -- and thus building oracle SQL before a session exists --
# blow up on the driver.
@pandas_udf(StringType())
def _nfc_udf(s: pd.Series) -> pd.Series:
    return s.str.normalize("NFC")


def normalize_text(col: Column | str) -> Column:
    """The full chain as one Column expression (NULL stays NULL)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"\r\n", "\n")
    c = F.regexp_replace(c, r"\r", "\n")
    c = F.regexp_replace(c, CONTROL_CLASS, "")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    return _nfc_udf(c)


def normalize_text_py(text: str | None) -> str | None:
    """CPython reference (same regex dialect, unicodedata NFC) for the
    byte-equality pytest."""
    import unicodedata

    if text is None:
        return None
    text = re.sub(r"\r\n", "\n", text)
    text = re.sub(r"\r", "\n", text)
    text = re.sub(CONTROL_CLASS, "", text)
    text = re.sub(r"\n{3,}", "\n\n", text)
    return unicodedata.normalize("NFC", text)


def normalize_text_duckdb_sql(expr: str) -> str:
    """DuckDB twin — RE2 replays the same patterns (replacements use
    chr(10): RE2 rewrite strings do not interpret backslash escapes),
    utf8proc's nfc_normalize replays the composition step."""
    out = expr
    out = f"regexp_replace({out}, '\\r\\n', chr(10), 'g')"
    out = f"regexp_replace({out}, '\\r', chr(10), 'g')"
    out = f"regexp_replace({out}, '{CONTROL_CLASS}', '', 'g')"
    out = f"regexp_replace({out}, '\\n{{3,}}', chr(10) || chr(10), 'g')"
    return f"nfc_normalize({out})"


# ---------------------------------------------------------------------------
# Mojibake repair (ftfy's core case): UTF-8 bytes decoded as
# Windows-1252 — "\u00e2\u20ac\u2122" for \u2019, "\u00c3\u00a9" for \u00e9 — the single
# most common encoding corruption in crawled web text.  The fix is a
# DETERMINISTIC literal replace chain: for every target character we
# derive its mojibake form as utf8(char) decoded as cp1252, apply
# longest-first (3-byte sequences before 2-byte, so shared prefixes
# like "\u00e2\u20ac" never fire early), and replace with the real
# character.  Plain substring replaces (no regex) — JVM-codegen'd in
# Spark, byte-identical in DuckDB's replace() and CPython str.replace,
# so the repair stays byte-stable across all three engines.
# ---------------------------------------------------------------------------

# curated target set: the general-punctuation/currency/trademark block
# cp1252 smart-quote corruption produces, plus the full decodable
# Latin-1 supplement (accented letters, nbsp, section marks).
_MOJIBAKE_TARGETS = (
    "\u2018\u2019\u201a\u201c\u201d\u201e\u2013\u2014\u2026\u20ac\u2122\u2022"
    "\u2020\u2021\u2030\u2039\u203a\u02c6\u02dc"
) + "".join(chr(x) for x in range(0xA0, 0x100))


def _mojibake_pairs() -> list[tuple[str, str]]:
    pairs = []
    for ch in _MOJIBAKE_TARGETS:
        try:
            moji = ch.encode("utf-8").decode("cp1252")
        except UnicodeDecodeError:
            # cp1252 leaves 0x81/0x8D/0x8F/0x90/0x9D undefined; targets
            # whose utf-8 bytes hit them cannot appear as cp1252 text
            continue
        if len(moji) < 2 or moji == ch:
            continue
        pairs.append((moji, ch))
    # longest first so 3-char corruptions win over their 2-char
    # prefixes; lexicographic within a length for determinism
    pairs.sort(key=lambda p: (-len(p[0]), p[0]))
    return pairs


MOJIBAKE_PAIRS: list[tuple[str, str]] = _mojibake_pairs()


def fix_mojibake(col: Column | str) -> Column:
    """Repair CP1252-decoded UTF-8 (NULL stays NULL) — one projection,
    a fixed chain of literal substring replaces, zero regex, zero
    Python on the hot path."""
    c = F.col(col) if isinstance(col, str) else col
    for moji, ch in MOJIBAKE_PAIRS:
        c = F.replace(c, F.lit(moji), F.lit(ch))
    return c


def fix_mojibake_py(text: str | None) -> str | None:
    """CPython reference for the byte-equality pytest."""
    if text is None:
        return None
    for moji, ch in MOJIBAKE_PAIRS:
        text = text.replace(moji, ch)
    return text


def fix_mojibake_duckdb_sql(expr: str) -> str:
    """DuckDB twin — the same chain through ``replace()`` (plain
    substring semantics in all three engines)."""
    out = expr
    for moji, ch in MOJIBAKE_PAIRS:
        out = f"replace({out}, '{moji}', '{ch}')"
    return out
