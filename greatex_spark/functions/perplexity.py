"""KenLM-style perplexity scoring as an Arrow-batched pandas UDF.

KenLM (Heafield 2011) binaries/models are not available in this
environment, so the scorer is a deterministic stand-in with the same
interface and filtering semantics (CCNet, Wenzek et al. 2020: drop
documents whose LM perplexity is an outlier): an interpolated
character-trigram language model trained at import time on the fixed
seed corpus embedded in :mod:`greatex_spark.functions.langid` — no
external data, no randomness.

Per-row scoring is independent of batching/partitioning, and all math
is float64, so scores are bit-stable across runs and cluster layouts
(SURVEY.md §7 "float nondeterminism" risk).

Perplexity = exp(mean negative log P(c_i | c_{i-2} c_{i-1})) with
interpolation  P = l3*P3 + l2*P2 + l1*P1 + l0/V.
Gibberish / wrong-language text scores high; fluent seed-like text
scores low.
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from greatex_spark.functions.langid import SEED_TEXT

LAMBDAS = (0.6, 0.25, 0.1, 0.05)
# CCNet-style scoring prefix: the first 512 chars decide the score —
# gibberish/boilerplate shows up immediately, and truncation caps the
# per-doc Python cost at a constant independent of doc length
MAX_SCORED_CHARS = 512
VOCAB_SIZE = 8192  # uniform-backoff denominator (fixed spec constant)


def _train(corpus: str):
    uni: Counter = Counter()
    bi: Counter = Counter()
    tri: Counter = Counter()
    s = f"  {corpus}"
    for i in range(2, len(s)):
        uni[s[i]] += 1
        bi[s[i - 1 : i + 1]] += 1
        tri[s[i - 2 : i + 1]] += 1
    total = sum(uni.values())
    return uni, bi, tri, total


_UNI, _BI, _TRI, _TOTAL = _train(" ".join(SEED_TEXT[lang] for lang in ("en",)))


def log_perplexity_py(text: str | None, max_chars: int = MAX_SCORED_CHARS) -> float | None:
    """Standalone reference scorer (identical to the UDF's inner loop)."""
    if text is None:
        return None
    t = str(text).lower()[:max_chars]
    if len(t) < 3:
        return None
    s = f"  {t}"
    logp = 0.0
    n = 0
    for i in range(2, len(s)):
        c, b, tr = s[i], s[i - 1 : i + 1], s[i - 2 : i + 1]
        p3 = _TRI[tr] / _BI[s[i - 2 : i]] if _BI[s[i - 2 : i]] else 0.0
        p2 = _BI[b] / _UNI[s[i - 1]] if _UNI[s[i - 1]] else 0.0
        p1 = _UNI[c] / _TOTAL if _TOTAL else 0.0
        p = (
            LAMBDAS[0] * p3
            + LAMBDAS[1] * p2
            + LAMBDAS[2] * p1
            + LAMBDAS[3] / VOCAB_SIZE
        )
        logp += math.log(p)
        n += 1
    return round(-logp / n, 6) if n else None


@pandas_udf(T.DoubleType())
def log_perplexity_udf(texts: pd.Series) -> pd.Series:
    return texts.map(log_perplexity_py)


def with_perplexity(
    df: DataFrame, text_col: str = "text", out_col: str = "log_ppl"
) -> DataFrame:
    return df.withColumn(out_col, log_perplexity_udf(F.col(text_col)))
