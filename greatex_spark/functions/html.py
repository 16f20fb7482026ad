"""HTML → text extraction as a chain of JVM-side regexp passes — the
realistic counterpart of ``pages.extract_text`` (which byte-inverts the
synthetic fixture wrapper).

The reference schema carries raw ``html`` next to ``text``
(BASELINE.json input_hint); real crawl pipelines derive ``text`` from
``html``.  Full DOM parsing (trafilatura/boilerpipe) is out of scope in
this sandbox, so this is the classic regex extraction: drop
script/style/comment subtrees, strip tags, decode the common entities,
collapse whitespace.  Every pattern stays in the shared
java.util.regex / RE2 / CPython dialect (inline ``(?is)`` flags,
non-greedy ``.*?``, no lookaround) so the DuckDB oracle and the pytest
``re`` twin replay byte-for-byte — the same contract as
:mod:`greatex_spark.functions.pii`.

Scale: one codegen'd regexp chain per row, no UDF, no shuffle; applied
at bronze ingest it is the page-normalization step everything
downstream (langid, heuristics, dedup) consumes.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) — ordered; subtree removals BEFORE tag strip,
# entity decodes AFTER (decoded "&lt;b&gt;" is text, not markup).
HTML_STEPS: tuple[tuple[str, str], ...] = (
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"<[^>]*>", " "),
    (r"&nbsp;", " "),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&amp;", "&"),
    (r"\s+", " "),
)


def html_to_text(col: Column | str) -> Column:
    """Extracted text of an HTML string column (trimmed; for a binary
    column pass ``F.decode(col, 'UTF-8')``)."""
    out = F.col(col) if isinstance(col, str) else col
    for pat, repl in HTML_STEPS:
        out = F.regexp_replace(out, pat, repl)
    return F.trim(out)


def html_to_text_py(html: str) -> str:
    """CPython twin (same patterns, same order) for byte-equality
    assertions."""
    for pat, repl in HTML_STEPS:
        html = re.sub(pat, repl, html)
    return html.strip()


def html_to_text_duckdb_sql(col_expr: str) -> str:
    """DuckDB (RE2) twin of :func:`html_to_text`."""
    out = col_expr
    for pat, repl in HTML_STEPS:
        pat_sql = pat.replace("'", "''")
        repl_sql = repl.replace("'", "''")
        out = f"regexp_replace({out}, '{pat_sql}', '{repl_sql}', 'g')"
    return f"trim({out})"


def html_to_text_sparksql(col_expr: str) -> str:
    """Spark-SQL expression string twin of :func:`html_to_text` (for
    suite expressions; backslashes doubled for the SQL string parser)."""
    out = col_expr
    for pat, repl in HTML_STEPS:
        p = pat.replace("\\", "\\\\").replace("'", "\\'")
        r = repl.replace("\\", "\\\\").replace("'", "\\'")
        out = f"regexp_replace({out}, '{p}', '{r}')"
    return f"trim({out})"
