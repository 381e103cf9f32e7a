"""As-of (temporal/versioned) join — Flink's ``FOR SYSTEM_TIME AS OF``.

Flink parity: TemporalRowTimeJoinOperator.java:77 (event-time) and
TemporalProcessTimeJoinOperator.java (proc-time) — each left row joins the
*latest* right-side version whose time is <= the left row's time, per key.

Spark-first design: Spark has no as-of join primitive, and a naive
``left.join(right, key & (r.ts <= l.ts)).groupBy(left_pk).agg(max(r.ts))``
explodes to O(|L|·|versions|) intermediate rows. Instead we use the classic
union+window plan, which is a single shuffle + sort per key:

    1. UNION left rows (tagged 0) and right rows (tagged 1) into one relation
       with a common (key, time) spine.
    2. Window ``last(right_payload, ignoreNulls=True)`` ordered by
       (time, tag DESC) with ROWS UNBOUNDED PRECEDING — each left row sees the
       most recent right payload at-or-before its time (tag DESC makes a
       same-timestamp right row visible to the left row, i.e. ``<=``).
    3. Keep left rows only.

Cost at scale: one hash shuffle on key + one in-partition sort — the same
asymptotics as a sort-merge join, with no row explosion. Skewed keys are
handled by AQE only for joins, not windows, so extremely hot keys should be
pre-salted by the caller if needed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    strict: bool = False,
) -> DataFrame:
    """Left as-of join: latest right row with right_time <= left_time per key.

    Returns all left columns plus the right payload columns (right_key and
    right_time included; right_time is the matched version's timestamp).
    ``strict=True`` uses ``<`` instead of ``<=`` (excludes same-instant rows).
    """
    right_payload = [c for c in right.columns if c != right_key]

    l_tagged = left.select(
        F.col(left_key).alias("__key"),
        F.col(left_time).alias("__time"),
        F.lit(0).alias("__tag"),
        F.struct(*left.columns).alias("__left"),
        F.lit(None).cast(
            right.select(F.struct(*right_payload).alias("s")).schema["s"].dataType
        ).alias("__right"),
    )
    r_tagged = right.select(
        F.col(right_key).alias("__key"),
        F.col(right_time).alias("__time"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("__left"),
        F.struct(*right_payload).alias("__right"),
    )

    # tag DESC: at equal timestamps the right (version) row sorts before the
    # left (probe) row, giving <= semantics; strict mode flips the order.
    tag_order = F.col("__tag").asc() if strict else F.col("__tag").desc()
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__time").asc(), tag_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    matched = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__match", F.last("__right", ignorenulls=True).over(w))
        .filter(F.col("__tag") == 0)
    )
    out_cols = [F.col(f"__left.{c}").alias(c) for c in left.columns] + [
        F.col(f"__match.{c}").alias(c) for c in right_payload
    ]
    return matched.select(*out_cols)
