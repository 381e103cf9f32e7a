"""FOR SYSTEM_TIME AS OF front door — Flink's temporal (versioned) join SQL
surface on the engine's as-of operator.

Flink parity: StreamExecTemporalJoin.scala:56 →
TemporalRowTimeJoinOperator.java:77. The SQL form joins a fact row to the
dim version that was current at the fact's event time:

    SELECT <cols> FROM <fact> [AS] f
    JOIN <dim> FOR SYSTEM_TIME AS OF f.<ts> [AS] d
    ON f.<key> = d.<key>
    [ORDER BY ...]

The dim's version-time column comes from the engine registry's
``TableMeta.event_time_col`` (declared by the WATERMARK clause in its
CREATE TABLE — exactly Flink's "event-time attribute of the versioned
table"), falling back to the fact's AS OF column name. Lowering is
:func:`flink_1_12_2_spark.operators.asof.asof_join` — union + window,
one shuffle, no per-row lookups.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from flink_1_12_2_spark.operators.asof import asof_join

_TJ = re.compile(
    r"(?is)^\s*SELECT\s+(?P<cols>.*?)\s+"
    r"FROM\s+(?P<fact>\w+)(?:\s+(?:AS\s+)?(?P<fa>\w+))?\s+"
    r"JOIN\s+(?P<dim>\w+)\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+"
    r"(?P<ta>\w+)\.(?P<ts>\w+)(?:\s+(?:AS\s+)?(?P<da>\w+))?\s+"
    r"ON\s+(?P<a1>\w+)\.(?P<k1>\w+)\s*=\s*(?P<a2>\w+)\.(?P<k2>\w+)\s*"
    r"(?:ORDER\s+BY\s+(?P<ob>[\w.,\s]+?))?\s*;?\s*$"
)


def temporal_join_sql(engine, sql: str) -> DataFrame:
    """Execute a restricted FOR SYSTEM_TIME AS OF statement."""
    m = _TJ.match(sql)
    if not m:
        raise ValueError(
            "unsupported FOR SYSTEM_TIME AS OF syntax (see sql/temporal.py)"
        )
    fact_name, dim_name = m.group("fact"), m.group("dim")
    fa = m.group("fa") or fact_name
    da = m.group("da") or dim_name
    # resolve which ON side is the fact
    if m.group("a1") == fa:
        left_key, right_key = m.group("k1"), m.group("k2")
    else:
        left_key, right_key = m.group("k2"), m.group("k1")
    left_time = m.group("ts")
    meta = engine.meta(dim_name)
    fact = engine.spark.table(fact_name)
    if meta is not None and meta.connector == "jdbc":
        # A jdbc versioned side is Flink's LOOKUP join (the jdbc source
        # implements LookupTableSource, not a versioned event-time
        # table): AS OF f.proctime = join each fact row to the store's
        # CURRENT row for its key, honoring lookup.cache.* / retries
        # (JdbcRowDataLookupFunction.java:59). The AS OF column itself
        # is the processing-time marker and does not partition versions.
        from flink_1_12_2_spark.operators.lookup import lookup_join_jdbc
        from flink_1_12_2_spark.sources.jdbc import DERBY_DRIVER

        out = lookup_join_jdbc(
            fact,
            meta.path,
            meta.options["table-name"],
            fact_key=left_key,
            dim_key=right_key,
            driver=meta.options.get("driver", DERBY_DRIVER),
            options=meta.options,
            how="inner",
        )
    else:
        right_time = (
            meta.event_time_col if meta and meta.event_time_col else left_time
        )
        dim = engine.spark.table(dim_name)
        out = asof_join(
            fact,
            dim,
            left_key=left_key,
            right_key=right_key,
            left_time=left_time,
            right_time=right_time,
        )
    cols = m.group("cols").strip()
    if cols != "*":
        exprs = []
        for c in cols.split(","):
            c = c.strip()
            cm = re.match(r"(?is)^(\w+)\.(\w+)(?:\s+AS\s+(\w+))?$", c)
            if not cm:
                raise ValueError(f"unsupported select item: {c!r}")
            name = cm.group(2)
            exprs.append(
                out[name].alias(cm.group(3)) if cm.group(3) else out[name]
            )
        out = out.select(*exprs)
    if m.group("ob"):
        order_cols = [
            c.strip().split(".")[-1] for c in m.group("ob").split(",")
        ]
        out = out.orderBy(*order_cols)
    return out
