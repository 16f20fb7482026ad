"""Declarative expectation-suite specs.

Mirrors the shape of the reference's suite JSON
(``/root/reference/great_expectations/expectations/retail_source_suite.json``:
a list of ``{expectation_type, kwargs}`` entries plus a suite name) while
staying engine-neutral: a Suite is plain data, JSON-round-trippable, and
is compiled to Spark Column expressions by
:mod:`greatex_spark.expectations.compiler`.

Supported expectation types (reference parity — SURVEY.md §2.A):

- ``expect_table_columns_to_match_ordered_list(column_list)``     (A1)
- ``expect_table_row_count_to_be_between(min_value, max_value)``  (A2)
- ``expect_column_values_to_not_be_null(column, mostly)``         (A3)
- ``expect_column_values_to_be_in_type_list(column, type_list)``  (A4)
- ``expect_column_min_to_be_between(column, min_value, max_value)`` (A5)
- ``expect_column_max_to_be_between(column, min_value, max_value)`` (A6)
- ``expect_column_values_to_be_in_set(column, value_set, mostly)`` (A7)
- ``expect_column_values_to_match_strftime_format(column, strftime_format,
  mostly)``                                                       (A8)

Extension set (web-text quality rules, BASELINE.json north_rule):

- ``expect_column_values_to_be_between(column, min_value, max_value, mostly)``
- ``expect_column_value_lengths_to_be_between(column, min_value, max_value,
  mostly)``
- ``expect_column_values_to_match_regex(column, regex, mostly)``
- ``expect_column_values_to_not_match_regex(column, regex, mostly)``
- ``expect_column_mean_to_be_between(column, min_value, max_value)``
- ``expect_column_unique_value_count_to_be_between(column, min_value,
  max_value)``
- ``expect_column_values_to_be_unique(column, mostly)``
- ``expect_values_to_satisfy_expression(name, expression, mostly)`` —
  generic row-level rule; ``expression`` is a SQL boolean expression over
  the table's columns (rows where it is false/null are unexpected).  All
  Gopher/C4 heuristic gates and model-score gates (langid confidence,
  perplexity band) are instances of this.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

ROW_LEVEL_TYPES = frozenset(
    {
        "expect_column_values_to_not_be_null",
        "expect_column_values_to_be_in_set",
        "expect_column_values_to_match_strftime_format",
        "expect_column_values_to_be_between",
        "expect_column_value_lengths_to_be_between",
        "expect_column_values_to_match_regex",
        "expect_column_values_to_not_match_regex",
        "expect_column_values_to_be_unique",
        "expect_values_to_satisfy_expression",
    }
)

AGGREGATE_TYPES = frozenset(
    {
        "expect_table_row_count_to_be_between",
        "expect_column_min_to_be_between",
        "expect_column_max_to_be_between",
        "expect_column_mean_to_be_between",
        "expect_column_sum_to_be_between",
        "expect_column_stdev_to_be_between",
        "expect_column_quantile_to_be_between",
        "expect_column_unique_value_count_to_be_between",
    }
)

SCHEMA_TYPES = frozenset(
    {
        "expect_table_columns_to_match_ordered_list",
        "expect_column_values_to_be_in_type_list",
    }
)

KNOWN_TYPES = ROW_LEVEL_TYPES | AGGREGATE_TYPES | SCHEMA_TYPES


@dataclass(frozen=True)
class Expectation:
    """One declarative expectation: a type plus its kwargs.

    Matches the reference's compiled-JSON entries, e.g.
    ``{"expectation_type": "expect_column_values_to_not_be_null",
    "kwargs": {"column": "invoice_number"}}``
    (``/root/reference/great_expectations/expectations/retail_source_suite.json``).
    """

    expectation_type: str
    kwargs: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.expectation_type not in KNOWN_TYPES:
            raise ValueError(f"unknown expectation_type: {self.expectation_type}")

    @property
    def mostly(self) -> float:
        return float(self.kwargs.get("mostly", 1.0))

    @property
    def is_row_level(self) -> bool:
        return self.expectation_type in ROW_LEVEL_TYPES

    def to_dict(self) -> dict[str, Any]:
        return {"expectation_type": self.expectation_type, "kwargs": dict(self.kwargs)}

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Expectation":
        return cls(d["expectation_type"], dict(d.get("kwargs", {})))


@dataclass(frozen=True)
class Suite:
    """A named, ordered collection of expectations (one per gate)."""

    name: str
    expectations: tuple[Expectation, ...]

    @classmethod
    def of(cls, name: str, *expectations: Expectation | dict[str, Any]) -> "Suite":
        exps = tuple(
            e if isinstance(e, Expectation) else Expectation.from_dict(e)
            for e in expectations
        )
        return cls(name=name, expectations=exps)

    def to_json(self) -> str:
        return json.dumps(
            {
                "expectation_suite_name": self.name,
                "expectations": [e.to_dict() for e in self.expectations],
            },
            indent=2,
            sort_keys=True,
        )

    @classmethod
    def from_json(cls, s: str) -> "Suite":
        d = json.loads(s)
        return cls.of(d["expectation_suite_name"], *d["expectations"])


def E(expectation_type: str, **kwargs: Any) -> Expectation:
    """Terse constructor: ``E("expect_column_min_to_be_between", column="q",
    min_value=0, max_value=0)``."""
    return Expectation(expectation_type, kwargs)
