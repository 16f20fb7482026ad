"""URL canonicalization, domain extraction, and URL-keyed dedup.

Every production Common-Crawl pipeline normalizes URLs before keying
anything on them (dedup, domain filters, per-domain budgets): the same
page is fetched as ``http://WWW.Site.com/a/?utm_source=x#frag`` and
``https://site.com/a``.  The canonical form here is a deterministic
spec — a fixed chain of regex rewrites, all executed JVM-side as
``regexp_replace``/``regexp_extract`` Column expressions (and replayed
verbatim by the DuckDB twins; every regex used is valid in both Java
regex and RE2):

1. strip the ``#fragment``,
2. lowercase scheme + authority (path/query case is significant),
3. drop default ports (``:80`` for http, ``:443`` for https),
4. drop a leading ``www.`` host label,
5. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``,
   ``ref``), fixing ``?``/``&`` separators afterwards,
6. strip trailing ``/`` runs from the path.

``registered_domain`` reduces a host to its registrable suffix-plus-one
label using a small embedded multi-part-suffix table (the full public
suffix list is a data file in real deployments; the lookup shape is
identical).

Scale notes: canonicalization is a pure projection (no shuffle, fully
codegen'd); domain blocklist filtering is either a literal ``isin``
filter (pushes down to the scan) or a broadcast anti-join for dynamic
lists; ``dedup_by_url`` is one hash-shuffle on the canonical URL —
min-id survivor via partial-aggregating groupBy, no window.

Reference scope: the reference validates a retail table and has no URL
handling; this extends the quality_filter tier for the BASELINE.json
input_hint schema (url:string is the document key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# multi-part registrable suffixes the synthetic corpora can produce; a
# real deployment swaps in the public suffix list (same lookup shape)
MULTIPART_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "com.au", "net.au", "co.jp", "com.br", "co.in",
)

_AUTHORITY_RE = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"
# keeps the captured separator so `?a=1&utm=2&b=3` → `?a=1&&b=3` (the
# doubled separator is collapsed by the fix-up steps)
_TRACKING_RE = r"([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)=[^&#]*"


def canonicalize_url(col: Column | str) -> Column:
    """Canonical URL per the module spec — a fixed rewrite chain, each
    step one ``regexp_replace``.

    Spark's ``regexp_replace`` rewrites EVERY match; the DuckDB twin
    passes the ``'g'`` option on each step to match."""
    u = F.col(col) if isinstance(col, str) else col
    u = F.regexp_replace(u, r"#.*$", "")  # 1. fragment
    auth = F.regexp_extract(u, _AUTHORITY_RE, 1)
    rest = F.substring(u, F.length(auth) + F.lit(1), F.lit(1 << 30))
    auth = F.lower(auth)  # 2. lowercase scheme+authority
    auth = F.regexp_replace(auth, r"^(http://[^/?#]*):80$", r"$1")  # 3.
    auth = F.regexp_replace(auth, r"^(https://[^/?#]*):443$", r"$1")
    auth = F.regexp_replace(auth, r"^([a-z][a-z0-9+.-]*://)www\.", r"$1")  # 4.
    u = F.concat(auth, rest)
    u = F.regexp_replace(u, _TRACKING_RE, r"$1")  # 5. drop tracking params
    u = F.regexp_replace(u, r"\?[?&]+", "?")  # ?& / ?? after a dropped first param
    u = F.regexp_replace(u, r"&&+", "&")  # && after a dropped middle param
    u = F.regexp_replace(u, r"[?&]+$", "")  # dangling separator
    return F.regexp_replace(u, r"(://[^/]+/.*?)/+$", r"$1")  # 6. trailing /


def canonicalize_url_sql(expr: str) -> str:
    """DuckDB twin of :func:`canonicalize_url` — the same regex chain
    with the ``'g'`` option (Spark replaces all matches; DuckDB only
    the first without it)."""
    u = f"regexp_replace({expr}, '#.*$', '', 'g')"
    auth = f"regexp_extract({u}, '{_AUTHORITY_RE}', 1)"
    rest = f"substr({u}, length({auth}) + 1)"
    a = f"lower({auth})"
    a = f"regexp_replace({a}, '^(http://[^/?#]*):80$', '\\1', 'g')"
    a = f"regexp_replace({a}, '^(https://[^/?#]*):443$', '\\1', 'g')"
    a = f"regexp_replace({a}, '^([a-z][a-z0-9+.-]*://)www\\.', '\\1', 'g')"
    u = f"({a} || {rest})"
    u = f"regexp_replace({u}, '{_TRACKING_RE}', '\\1', 'g')"
    u = f"regexp_replace({u}, '\\?[?&]+', '?', 'g')"
    u = f"regexp_replace({u}, '&&+', '&', 'g')"
    u = f"regexp_replace({u}, '[?&]+$', '', 'g')"
    return f"regexp_replace({u}, '(://[^/]+/.*?)/+$', '\\1', 'g')"


def host_of(col: Column | str) -> Column:
    """Host of a canonical URL (authority minus port)."""
    u = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://([^/:?#]*)", 1)


def host_of_sql(expr: str) -> str:
    return f"regexp_extract({expr}, '^[a-z][a-z0-9+.-]*://([^/:?#]*)', 1)"


def registered_domain(col: Column | str) -> Column:
    """Registrable domain of a host column: last two labels, or last
    three when the last two are a known multi-part suffix."""
    h = F.col(col) if isinstance(col, str) else col
    parts = F.split(h, r"\.")
    n = F.size(parts)
    # try_element_at: CASE branches guard the arity, but ANSI mode makes
    # out-of-bounds element_at a hard error — stay total regardless
    last2 = F.concat_ws(
        ".", F.try_element_at(parts, F.lit(-2)), F.try_element_at(parts, F.lit(-1))
    )
    last3 = F.concat_ws(
        ".",
        F.try_element_at(parts, F.lit(-3)),
        F.try_element_at(parts, F.lit(-2)),
        F.try_element_at(parts, F.lit(-1)),
    )
    is_multi = last2.isin(*MULTIPART_SUFFIXES)
    return (
        F.when(n <= F.lit(2), h)
        .when(is_multi & (n >= F.lit(3)), last3)
        .otherwise(last2)
    )


def registered_domain_sql(expr: str) -> str:
    suffixes = ", ".join(f"'{s}'" for s in MULTIPART_SUFFIXES)
    parts = f"string_split({expr}, '.')"
    last2 = f"({parts}[-2] || '.' || {parts}[-1])"
    last3 = f"({parts}[-3] || '.' || {parts}[-2] || '.' || {parts}[-1])"
    return (
        f"CASE WHEN len({parts}) <= 2 THEN {expr} "
        f"WHEN {last2} IN ({suffixes}) AND len({parts}) >= 3 THEN {last3} "
        f"ELSE {last2} END"
    )


def filter_domains(
    df: DataFrame,
    blocklist,
    url_col: str = "url",
) -> DataFrame:
    """Drop rows whose registered domain is blocklisted.

    ``blocklist`` may be a Python sequence (compiles to a literal
    ``isin`` filter — predicate-pushdown-friendly, zero shuffle) or a
    one-column DataFrame (broadcast ``left_anti`` — the list side is
    small by construction)."""
    dom = registered_domain(host_of(canonicalize_url(F.col(url_col))))
    if isinstance(blocklist, DataFrame):
        bl = blocklist.toDF("__dom")
        return df.join(
            F.broadcast(bl), on=dom == F.col("__dom"), how="left_anti"
        )
    return df.where(~dom.isin(*[str(d) for d in blocklist]))


def dedup_by_url(df: DataFrame, url_col: str = "url") -> DataFrame:
    """One document per canonical URL — survivor is the minimum original
    ``url_col`` string within the canonical group (deterministic; no
    window, partial agg combines map-side)."""
    canon = canonicalize_url(F.col(url_col)).alias("__canon")
    winners = (
        df.select(canon, F.col(url_col))
        .groupBy("__canon")
        .agg(F.min(url_col).alias(url_col))
        .drop("__canon")
    )
    return df.join(winners, url_col, "left_semi")


# ---------------------------------------------------------------------------
# URL-level quality scoring (RefinedWeb Appendix G.1 shape).
#
# Production crawls drop documents by URL alone before fetching or
# featurizing the body: an exact domain blocklist (UT1-style) plus a
# SOFT score — a weighted count of flagged substrings in the URL, so
# one incidental hit ("sexton.example.org") stays below the drop
# threshold while repeated/strong hits ("/porn/xxx-videos") exceed it.
# The spec counts raw substring occurrences (no word boundaries —
# RefinedWeb documents the same false-positive tradeoff); weights are
# a literal table, swap in the real curated list at deployment.
#
# Occurrence counting is the replace-trick on the lowercased URL —
# (len(u) - len(replace(u, kw, ''))) / len(kw) — identical integer
# semantics in java.util.regex-free Spark exprs, DuckDB, and Python,
# and whole-stage codegen keeps it a pure projection: zero shuffles,
# pushdown-friendly.

URL_KEYWORD_WEIGHTS: tuple[tuple[str, float], ...] = (
    ("porn", 2.0),
    ("xxx", 2.0),
    ("sex", 1.0),
    ("casino", 1.0),
    ("poker", 1.0),
    ("escort", 1.0),
    ("viagra", 1.0),
    ("webcam", 0.5),
    ("bet", 0.5),
)


def url_quality_score(col: Column | str) -> Column:
    """Weighted flagged-substring occurrence count over the lowercased
    URL (double; 0.0 for a clean URL, NULL for NULL)."""
    u = F.lower(F.col(col) if isinstance(col, str) else col)
    score = F.lit(0.0)
    for kw, w in URL_KEYWORD_WEIGHTS:
        occurrences = (
            F.length(u) - F.length(F.replace(u, F.lit(kw), F.lit("")))
        ) / len(kw)
        score = score + F.lit(float(w)) * occurrences
    return score


def url_quality_score_sql(expr: str) -> str:
    """DuckDB twin of :func:`url_quality_score`."""
    u = f"lower({expr})"
    terms = [
        f"{float(w)} * (length({u}) - length(replace({u}, '{kw}', ''))) / {len(kw)}"
        for kw, w in URL_KEYWORD_WEIGHTS
    ]
    return "(" + " + ".join(terms) + ")"


def filter_urls_by_quality(
    df: DataFrame,
    url_col: str = "url",
    threshold: float = 1.0,
    blocklist=(),
) -> DataFrame:
    """Keep rows whose URL is not domain-blocklisted and scores strictly
    below ``threshold``.  Pure projection + filter — evaluated before
    any fetch/featurize stage, this is the cheapest drop in the whole
    pipeline and the filter pushes to the scan."""
    canon = canonicalize_url(F.col(url_col))
    dom = registered_domain(host_of(canon))
    keep = url_quality_score(canon) < F.lit(float(threshold))
    if blocklist:
        keep = keep & ~dom.isin(*[str(d) for d in blocklist])
    return df.where(keep)
