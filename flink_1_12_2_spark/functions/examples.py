"""Importable example UDFs for the CREATE FUNCTION DDL front door.

Flink's ``CREATE FUNCTION f AS 'com.acme.MyFunc' LANGUAGE JAVA`` references a
class on the classpath (SqlCreateFunction.java); the Python engine's analogue
is a dotted import path to a module attribute. These functions are the
engine-shipped examples that DDL tests and docs reference — users point the
DDL at their own modules the same way.
"""

from __future__ import annotations

import pandas as pd

from flink_1_12_2_spark.functions.udf import udf


@udf("bigint")
def word_count(s: pd.Series) -> pd.Series:
    """Whitespace token count (0 for empty/null) — Arrow-vectorized.

    DuckDB twin: ``len(list_filter(string_split_regex(trim(text), '\\s+'),
    x -> x <> ''))``.
    """
    return s.fillna("").str.split().str.len().astype("int64")


@udf("double")
def signum_scaled(v: pd.Series) -> pd.Series:
    """sign(v) * sqrt(|v|) — a second registrable example (ALTER FUNCTION
    target in tests)."""
    import numpy as np

    return np.sign(v) * np.sqrt(v.abs())


def geo_mean(v: pd.Series) -> float:
    """Geometric mean — a registrable AGGREGATE example: CREATE FUNCTION
    also covers UDAFs (Flink's AggregateFunction via SqlCreateFunction);
    wrapped as a GROUPED_AGG pandas UDF at registration time."""
    import numpy as np

    return float(np.exp(np.log(v[v > 0]).mean()))


from flink_1_12_2_spark.functions.udf import udaf  # noqa: E402

geo_mean = udaf("double")(geo_mean)
