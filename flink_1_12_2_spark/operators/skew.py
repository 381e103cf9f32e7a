"""Skew mitigation: salted joins for hot keys.

At 100 TB a handful of hot keys (a viral user, an empty-string bucket, a
default enum value) can pin an entire join on one reducer. AQE's skew-join
splitting handles sort-merge joins automatically; this operator is the
explicit, planner-independent form (Flink users hand-roll the same pattern —
the reference has no built-in salting either, SplitAggregateRule covers only
aggregates):

    big side:   salt = deterministic uniform value in [0, S) per row
    small side: replicated S× (one copy per salt value)
    join on (key, salt)  →  hot keys spread over S reducers

Result is row-identical to the unsalted join; cost = S× the small side
(which is small — that's why it's the small side).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    The salt is derived from the whole big-side row (xxhash64 of all columns)
    — deterministic, uniform, and requiring no unique id column.
    """
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(num_salts))
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(num_salts - 1))
    ).alias("__salt")
    replicated_small = small.select("*", salts)
    joined = salted_big.join(
        replicated_small,
        (salted_big[big_key] == replicated_small[small_key])
        & (salted_big["__salt"] == replicated_small["__salt"]),
        how,
    )
    return joined.drop("__salt")
