from greatex_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    minhash_lsh_dedup,
    minhash_signature,
    ngram_jaccard,
    simhash64,
    simhash_dedup,
)
from greatex_spark.operators.ann import brute_force_topk, lsh_topk  # noqa: F401
