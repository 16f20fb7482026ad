from greatex_spark.functions.heuristics import (  # noqa: F401
    quality_features,
    with_quality_features,
)
from greatex_spark.functions.pii import scrub_pii, scrub_pii_py  # noqa: F401
