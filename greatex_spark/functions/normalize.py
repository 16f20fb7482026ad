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
