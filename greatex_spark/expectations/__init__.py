from greatex_spark.expectations.spec import Expectation, Suite  # noqa: F401
from greatex_spark.expectations.compiler import (  # noqa: F401
    ExpectationResult,
    ValidationResult,
    run_suite,
)
