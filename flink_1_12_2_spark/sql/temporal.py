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


# ---------------------------------------------------------------------------
# Temporal TABLE FUNCTION (the pre-FOR-SYSTEM_TIME API, still first-class
# in 1.12): Table.createTemporalTableFunction(timeAttribute, primaryKey) —
# flink-table-api-java/.../api/Table.java:115 /
# functions/TemporalTableFunctionImpl.java — registered as a function and
# joined with the comma + LATERAL TABLE (Rates(o.rowtime)) form, the key
# equality carried in WHERE (TemporalTableFunctionJoinRule lowers it to
# the same temporal join as FOR SYSTEM_TIME). The engine mirrors that:
# the registered spec lowers onto operators/asof.asof_join — union +
# window, one shuffle.

_TTF = re.compile(
    r"(?is)^\s*SELECT\s+(?P<cols>.*?)\s+"
    r"FROM\s+(?P<fact>\w+)(?:\s+(?:AS\s+)?(?P<fa>\w+))?\s*,\s*"
    r"LATERAL\s+TABLE\s*\(\s*(?P<fn>\w+)\s*\(\s*"
    r"(?P<ta>\w+)\.(?P<ts>\w+)\s*\)\s*\)\s*(?:(?:AS\s+)?(?P<da>\w+))?\s+"
    r"WHERE\s+(?P<a1>\w+)\.(?P<k1>\w+)\s*=\s*(?P<a2>\w+)\.(?P<k2>\w+)\s*"
    r"(?:ORDER\s+BY\s+(?P<ob>[\w.,\s]+?))?\s*;?\s*$"
)


def is_temporal_fn_query(engine, sql: str) -> bool:
    m = re.search(r"(?is)LATERAL\s+TABLE\s*\(\s*(\w+)\s*\(", sql)
    return bool(m) and m.group(1) in getattr(engine, "_temporal_fns", {})


def temporal_fn_join_sql(engine, sql: str) -> DataFrame:
    """Execute a restricted comma-join LATERAL TABLE(fn(ts)) statement
    against a registered temporal table function."""
    m = _TTF.match(sql)
    if not m:
        raise ValueError(
            "unsupported temporal-table-function syntax — expected "
            "SELECT ... FROM <fact> [f], LATERAL TABLE (Fn(f.<ts>)) [r] "
            "WHERE f.<key> = r.<key> [ORDER BY ...]"
        )
    spec = engine._temporal_fns.get(m.group("fn"))
    if spec is None:
        raise ValueError(
            f"temporal table function {m.group('fn')!r} is not registered"
        )
    history, time_attr, pk = spec
    fa = m.group("fa") or m.group("fact")
    # which WHERE side is the fact's key
    if m.group("a1") == fa:
        left_key, right_key = m.group("k1"), m.group("k2")
    else:
        left_key, right_key = m.group("k2"), m.group("k1")
    if right_key != pk:
        raise ValueError(
            f"the WHERE equality must bind the function's primary key "
            f"{pk!r}, got {right_key!r}"
        )
    fact = engine.spark.table(m.group("fact"))
    dim = (
        history
        if isinstance(history, DataFrame)
        else engine.spark.table(history)
    )
    out = asof_join(
        fact,
        dim,
        left_key=left_key,
        right_key=pk,
        left_time=m.group("ts"),
        right_time=time_attr,
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
        out = out.orderBy(
            *[c.strip().split(".")[-1] for c in m.group("ob").split(",")]
        )
    return out
