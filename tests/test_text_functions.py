"""Text expression parity: the Spark-native normalize_quarter expression
must reproduce the reference UDF's behavior (calculate_metrics.py:28-36)
on fixed quirk cases and on generated inputs (property test)."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nursinghome_data_pipeline_spark.functions.text import (
    normalize_quarter_col,
    token_count_col,
)


def reference_normalize_quarter(val):
    """The reference's documented behavior, re-stated as the spec.

    Digit classes are ASCII-explicit (``[0-9]``, not ``\\d``): Python's
    ``\\d`` alone among the three engines matches Unicode decimal
    digits (Nd — hypothesis counterexample ``"2000\U0001D7CE"``), while
    Java (the product expression) and RE2/DuckDB (the driver oracle)
    are ASCII-only. The product must hash-match the oracle, so the
    ASCII reading IS the canonical spec; the reference corpus never
    contains non-ASCII digits, so the behaviors are identical there.
    """
    if val is None:
        return None
    m = re.search(r"(20[0-9]{2}).*?([0-9])", str(val))
    if m:
        year, q = m.groups()
        return f"{year}-Q{q}"
    return None


FIXED_CASES = [
    "2024Q1",
    "2024 Q1",
    "2024-3",
    "Q1 2024",  # year-first required → no second digit after → NULL
    "garbage",
    "20231",
    "2024",
    "  2025 quarter 4  ",
    "1999Q1",  # 19xx never matches
    "2024Q12",  # lazy gap: first digit after year wins → Q1
    None,
    "",
]


def _spark_apply(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "raw string")
    return [
        r.norm
        for r in df.select(normalize_quarter_col("raw").alias("norm")).collect()
    ]


def test_fixed_cases(spark):
    got = _spark_apply(spark, FIXED_CASES)
    expected = [reference_normalize_quarter(v) for v in FIXED_CASES]
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.text(alphabet="0129Qq -/_", max_size=12),
            st.from_regex(r"20[0-9]{2}.{0,4}[0-9]?", fullmatch=True),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_property_parity(spark, values):
    got = _spark_apply(spark, values)
    expected = [reference_normalize_quarter(v) for v in values]
    assert got == expected


def test_token_count(spark):
    cases = [("a b  c", 3), ("  x ", 1), ("", 0), ("   ", 0), ("one", 1)]
    df = spark.createDataFrame([(t,) for t, _ in cases], "t string")
    got = [r.n for r in df.select(token_count_col("t").alias("n")).collect()]
    assert got == [n for _, n in cases]
