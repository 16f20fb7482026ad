"""Deterministic synthetic Common-Crawl-style page table (FIXTURES.md F3).

Schema is exactly the input hint from BASELINE.json:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

Generation is 100% native Column expressions over ``spark.range(n)`` —
every cell is a pure function of ``(id, seed)`` via ``xxhash64``, so
the table is bit-identical under any partitioning or cluster size, and
generating it at 10^12 rows would itself distribute with zero shuffle.

Planted classes (``PageClass``) drive ground-truth keep/drop labels for
the F1 test: the *pair id* (``id - id % 2``) picks the class so
near-duplicate pairs land in the same class.  ``include_labels=True``
adds ``page_class`` / ``expected_keep`` columns for tests only — the
engine path never sees them.

The ``html`` column wraps the text in fixed byte markers; the
extraction stage (:func:`extract_text`) must recover ``text``
byte-identically per url — that is the per-row invariant vs the
reference demanded by BASELINE.json's input_hint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from greatex_spark.functions.langid import SEED_TEXT

# class ids (decided by pmod(xxhash64(pair_id, seed, 99), 20))
CLEAN_EN = tuple(range(8))  # 0-7: clean English        (40%)
CLEAN_OTHER = (8, 9)  #        clean non-English         (10%)
TOO_SHORT = 10
HIGH_SYMBOL = 11
NO_STOPWORDS = 12
BULLET_HEAVY = 13
ELLIPSIS_HEAVY = 14
REPEATED_NGRAMS = 15
NEAR_DUP_PAIR = 16
GIBBERISH = 17
HAS_PII = 18
TOO_LONG = 19

CLASS_NAMES = {
    **{c: "clean_en" for c in CLEAN_EN},
    **{c: "clean_other" for c in CLEAN_OTHER},
    TOO_SHORT: "too_short",
    HIGH_SYMBOL: "high_symbol",
    NO_STOPWORDS: "no_stopwords",
    BULLET_HEAVY: "bullet_heavy",
    ELLIPSIS_HEAVY: "ellipsis_heavy",
    REPEATED_NGRAMS: "repeated_ngrams",
    NEAR_DUP_PAIR: "near_dup_pair",
    GIBBERISH: "gibberish",
    HAS_PII: "has_pii",
    TOO_LONG: "too_long",
}

OTHER_LANGS = ("de", "fr", "es", "it", "pt", "zh")

# hot-domain skew: ~30% of pages on one domain (exercises salting/AQE)
DOMAINS = (
    ("news.example.com", 30),
    ("blog.example.org", 15),
    ("shop.example.net", 10),
    ("wiki.example.io", 8),
    ("forum.example.dev", 7),
)  # remainder: long tail site-<n>.example.com

GIBBERISH_SYLLABLES = (
    "zx", "qv", "kj", "wq", "vz", "xq", "jq", "zq", "qk", "xj", "qz", "kx",
)

HTML_PRE = "<html><body>"
HTML_POST = "</body></html>"

WARC_EPOCH = 1640995200  # 2022-01-01T00:00:00Z
WARC_SPAN = 30 * 86400


def _h(seed: int, *cols: Column, salt: int) -> Column:
    return F.xxhash64(F.lit(seed), F.lit(salt), *cols)


def _u(seed: int, col: Column, salt: int, modulus: int) -> Column:
    """Deterministic uniform int in [0, modulus)."""
    return F.pmod(_h(seed, col, salt=salt), F.lit(modulus))


def _vocab(lang: str) -> list[str]:
    words = SEED_TEXT[lang].split() if lang != "zh" else list(SEED_TEXT["zh"])
    # dedupe preserving order
    seen: dict[str, None] = {}
    for w in words:
        seen.setdefault(w, None)
    return list(seen)


def _salad(seed: int, basis: Column, lang: str, n_words: Column, salt: int) -> Column:
    """n words drawn from the language vocabulary by per-position hash."""
    vocab = _vocab(lang)
    arr = F.lit(list(vocab))
    sep = "" if lang == "zh" else " "
    return F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda j: F.element_at(arr, (F.pmod(_h(seed, basis, j, salt=salt), F.lit(len(vocab))) + 1).cast("int")),
        ),
        sep,
    )


def _sentenceize(words_text: Column) -> Column:
    """Capitalize start, add a terminal period — keeps C4's terminal-
    punctuation rule satisfiable for clean docs."""
    return F.concat(F.upper(F.substring(words_text, 1, 1)), F.substring(words_text, 2, 1 << 20), F.lit("."))


def generate_pages(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    include_labels: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    df = spark.range(0, n, 1, num_partitions or spark.sparkContext.defaultParallelism)
    rid = F.col("id")
    pair_id = rid - F.pmod(rid, F.lit(2))
    cls = _u(seed, pair_id, salt=99, modulus=20)

    # language: clean_other picks from OTHER_LANGS, everything else is en
    other_lang = F.lit(list(OTHER_LANGS))
    lang = F.when(
        cls.isin(*CLEAN_OTHER),
        F.element_at(other_lang, (_u(seed, rid, salt=7, modulus=len(OTHER_LANGS)) + 1).cast("int")),
    ).otherwise(F.lit("en"))

    # base word counts — keyed by the text basis so near-dup pairs get
    # the same length (and thus truly near-identical text)
    text_basis = F.when(cls == NEAR_DUP_PAIR, pair_id).otherwise(rid)
    n_clean = (_u(seed, text_basis, salt=11, modulus=240) + 60).cast("int")  # 60..299

    clean_en_text = _sentenceize(_salad(seed, text_basis, "en", n_clean, salt=13))

    def other_text() -> Column:
        out = clean_en_text
        for lg in OTHER_LANGS:
            body = _salad(seed, rid, lg, n_clean, salt=13)
            out = F.when(lang == lg, body if lg == "zh" else _sentenceize(body)).otherwise(out)
        return out

    short_text = _sentenceize(_salad(seed, rid, "en", F.lit(6), salt=13))
    long_text = _sentenceize(_salad(seed, rid, "en", F.lit(2500), salt=13))
    symbol_text = F.concat(
        _salad(seed, rid, "en", F.lit(80), salt=13),
        F.lit(" " + "# " * 40),
    )
    # rare-word salad with no stopwords: content words from the vocab only
    rare_vocab = [w for w in _vocab("en") if w not in
                  ("the", "be", "to", "of", "and", "that", "have", "with",
                   "a", "it", "was", "is", "in", "for", "we", "you")]
    rare_arr = F.lit(list(rare_vocab))
    no_stop_text = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(90)),
            lambda j: F.element_at(rare_arr, (F.pmod(_h(seed, rid, j, salt=17), F.lit(len(rare_vocab))) + 1).cast("int")),
        ),
        " ",
    )
    bullet_line = F.concat(F.lit("- "), _salad(seed, rid, "en", F.lit(8), salt=19))
    bullet_text = F.array_join(
        F.transform(F.sequence(F.lit(1), F.lit(15)), lambda j: bullet_line), "\n"
    )
    ellipsis_line = F.concat(_salad(seed, rid, "en", F.lit(10), salt=23), F.lit("..."))
    ellipsis_text = F.array_join(
        F.transform(F.sequence(F.lit(1), F.lit(12)), lambda j: ellipsis_line), "\n"
    )
    phrase = _salad(seed, rid, "en", F.lit(5), salt=29)
    repeated_text = _sentenceize(
        F.array_join(F.transform(F.sequence(F.lit(1), F.lit(40)), lambda j: phrase), " ")
    )
    near_dup_text = F.when(
        F.pmod(rid, F.lit(2)) == 1,
        F.concat(clean_en_text, F.lit(" Updated edition.")),
    ).otherwise(clean_en_text)
    syl = F.lit(list(GIBBERISH_SYLLABLES))
    gib_word = lambda j: F.concat(  # noqa: E731
        F.element_at(syl, (F.pmod(_h(seed, rid, j, salt=31), F.lit(len(GIBBERISH_SYLLABLES))) + 1).cast("int")),
        F.element_at(syl, (F.pmod(_h(seed, rid, j, salt=37), F.lit(len(GIBBERISH_SYLLABLES))) + 1).cast("int")),
        F.element_at(syl, (F.pmod(_h(seed, rid, j, salt=41), F.lit(len(GIBBERISH_SYLLABLES))) + 1).cast("int")),
    )
    gibberish_text = F.concat(
        F.lit("the of and to "),  # pass the stopword gate; perplexity must catch it
        F.array_join(F.transform(F.sequence(F.lit(1), F.lit(120)), gib_word), " "),
        F.lit("."),
    )
    d3 = _u(seed, rid, salt=43, modulus=900) + 100
    d4 = _u(seed, rid, salt=47, modulus=9000) + 1000
    o1 = _u(seed, rid, salt=53, modulus=254) + 1
    o2 = _u(seed, rid, salt=59, modulus=254) + 1
    pii_text = F.concat(
        clean_en_text,
        F.lit(" Contact user"), rid.cast("string"), F.lit("@example.com or call 555-"),
        d3.cast("string"), F.lit("-"), d4.cast("string"),
        F.lit(". Server 10.0."), o1.cast("string"), F.lit("."), o2.cast("string"),
        F.lit(" holds SSN "), (_u(seed, rid, salt=61, modulus=900) + 100).cast("string"),
        F.lit("-"), (_u(seed, rid, salt=67, modulus=90) + 10).cast("string"),
        F.lit("-"), d4.cast("string"), F.lit("."),
    )

    text = (
        F.when(cls.isin(*CLEAN_EN), clean_en_text)
        .when(cls.isin(*CLEAN_OTHER), other_text())
        .when(cls == TOO_SHORT, short_text)
        .when(cls == TOO_LONG, long_text)
        .when(cls == HIGH_SYMBOL, symbol_text)
        .when(cls == NO_STOPWORDS, no_stop_text)
        .when(cls == BULLET_HEAVY, bullet_text)
        .when(cls == ELLIPSIS_HEAVY, ellipsis_text)
        .when(cls == REPEATED_NGRAMS, repeated_text)
        .when(cls == NEAR_DUP_PAIR, near_dup_text)
        .when(cls == GIBBERISH, gibberish_text)
        .when(cls == HAS_PII, pii_text)
    )

    # domain with explicit skew; keyed by pair_id so near-dup pairs share
    # a domain and the even member is the lexicographic-min url (the
    # deterministic survivor under MinHash dedup)
    dom_u = _u(seed, pair_id, salt=71, modulus=100)
    domain = F.lit(f"site-0.example.com")
    acc = 0
    for name, pct in DOMAINS:
        domain = F.when((dom_u >= acc) & (dom_u < acc + pct), F.lit(name)).otherwise(domain)
        acc += pct
    tail = F.concat(F.lit("site-"), _u(seed, pair_id, salt=73, modulus=2000).cast("string"), F.lit(".example.com"))
    domain = F.when(dom_u >= acc, tail).otherwise(domain)

    url = F.concat(F.lit("https://"), domain, F.lit("/page/"), rid.cast("string"))
    warc_ts = F.timestamp_seconds(F.lit(WARC_EPOCH) + _u(seed, rid, salt=79, modulus=WARC_SPAN))
    html = F.to_binary(F.concat(F.lit(HTML_PRE), text, F.lit(HTML_POST)), F.lit("utf-8"))

    cols = [
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    ]
    if include_labels:
        name_expr = F.lit("clean_en")
        for cid, cname in CLASS_NAMES.items():
            name_expr = F.when(cls == cid, F.lit(cname)).otherwise(name_expr)
        expected_keep = (
            cls.isin(*CLEAN_EN)
            | (cls == HAS_PII)
            | ((cls == NEAR_DUP_PAIR) & (F.pmod(rid, F.lit(2)) == 0))
        )
        cols += [name_expr.alias("page_class"), expected_keep.alias("expected_keep")]
    return df.select(*cols)


def extract_text(html_col: Column | str) -> Column:
    """Byte-exact inverse of the html wrapper — the 'extraction' stage.
    Real Common-Crawl extraction (trafilatura/jusText) would slot in
    here as a pandas-UDF; the invariant under test is byte-identity of
    extracted text per url."""
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    s = c.cast("string")
    return F.regexp_replace(
        F.regexp_replace(s, "^" + HTML_PRE, ""), HTML_POST + "$", ""
    )
