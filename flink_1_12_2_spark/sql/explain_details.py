"""EXPLAIN details — CHANGELOG_MODE and ESTIMATED_COST plan annotations.

Flink parity: ``ExplainDetail`` (flink-table/flink-table-api-java/src/main/
java/org/apache/flink/table/api/ExplainDetail.java:30,36) lets
``Table.explain(ExplainDetail.CHANGELOG_MODE)`` annotate every operator of
the optimized plan with the change kinds it produces ("changelogMode=[I]",
"changelogMode=[I,UB,UA,D]") and ``ESTIMATED_COST`` with the optimizer's
per-operator statistics. The decisions themselves live in
FlinkChangelogModeInferenceProgram.scala — this engine's port of those
rules is :mod:`flink_1_12_2_spark.operators.changelog_plan`; here we apply
the SAME rules to the Catalyst plan tree so EXPLAIN shows what the runtime
composition (changelog_normalize / group_agg_retract / drop_update_before)
would actually do.

Spark-first shape: the tree is the ANALYZED Catalyst plan (views not yet
inlined, so a registered table is still one ``SubqueryAlias`` leaf — the
emulated connector subtrees stay hidden exactly like Flink's
TableSourceScan hides the connector); costs come from the OPTIMIZED plan's
``Statistics`` (sizeInBytes + rowCount — Catalyst's real cost model inputs,
the analogue of Flink's {rowcount, cpu, io} tuples). Driver-side work is a
plan-tree walk: O(operators), no data movement.
"""

from __future__ import annotations

# Flink's change-kind shorthand per mode (RowKind.java: I/UA/UB/D)
MODE_FLAGS = {
    "append": "I",
    "upsert": "I,UA,D",
    "retract": "I,UB,UA,D",
}
_CDC_FORMATS = (
    "debezium-json",
    "canal-json",
    "maxwell-json",
    "debezium-avro-confluent",
)
_RANK = {"append": 0, "upsert": 1, "retract": 2}

# Catalyst nodeName → the Flink physical-operator name the annotation uses
_FLINK_NAMES = {
    "Aggregate": "GroupAggregate",
    "Project": "Calc",
    "Filter": "Calc",
    "Join": "Join",
    "Window": "OverAggregate",
    "Union": "Union",
    "Sort": "Sort",
    "GlobalLimit": "Limit",
    "LocalLimit": "Limit",
    "Deduplicate": "Deduplicate",
    "Expand": "Expand",
}


def source_mode(meta) -> str:
    """The changelog mode a registered table PROVIDES as a source
    (ScanTableSource.getChangelogMode): upsert-kafka → upsert (+I/+U/-D,
    no -U); CDC value formats → full retract; everything else insert-only.
    """
    if meta is None:
        return "append"
    if meta.connector == "upsert-kafka":
        return "upsert"
    if (meta.fmt or "").lower() in _CDC_FORMATS:
        return "retract"
    return "append"


def _children(node):
    return [
        node.children().apply(i) for i in range(node.children().size())
    ]


class _Annot:
    """One rendered operator line: Flink-style name + inferred mode."""

    def __init__(self, name: str, mode: str, kids: list["_Annot"]):
        self.name, self.mode, self.kids = name, mode, kids

    def render(self, indent: int = 0) -> list[str]:
        pad = "" if indent == 0 else "   " * (indent - 1) + "+- "
        ann = f"changelogMode=[{MODE_FLAGS[self.mode]}]"
        if self.name.endswith(")"):
            # Flink prints the mode inside the operator's arg list:
            # TableSourceScan(table=[t], changelogMode=[I])
            head = f"{self.name[:-1]}, {ann})"
        else:
            head = f"{self.name}({ann})"
        lines = [pad + head]
        for k in self.kids:
            lines.extend(k.render(indent + 1))
        return lines


def _leaf_table(sess, spark, node) -> str | None:
    """A SubqueryAlias over a REGISTERED table/view is treated as the
    TableSourceScan leaf (don't descend into the emulation subtree). A
    plain subquery alias (``(SELECT …) s``) is not a table — descend."""
    if node.nodeName() != "SubqueryAlias":
        return None
    try:
        name = node.alias()
    except Exception:  # noqa: BLE001 — non-standard alias node
        return None
    if sess is not None and name in sess._tables:
        return name
    try:
        if spark is not None and spark.catalog.tableExists(name):
            return name
    except Exception:  # noqa: BLE001 — catalog lookup is best-effort
        pass
    return None


def _normalized(child: _Annot) -> _Annot:
    """Rule 1 (StreamExecChangelogNormalize): an update-consuming op over
    an upsert stream gets the missing UPDATE_BEFORE materialized."""
    if child.mode != "upsert":
        return child
    return _Annot("ChangelogNormalize", "retract", [child])


def annotate(sess, plan, spark=None) -> _Annot:
    """Bottom-up changelog-mode inference over the analyzed Catalyst tree
    — the same decisions plan_changelog makes on its op-chain form."""
    name = plan.nodeName()
    tbl = _leaf_table(sess, spark, plan)
    if tbl is not None:
        meta = sess._tables.get(tbl) if sess is not None else None
        mode = source_mode(meta)
        return _Annot(f"TableSourceScan(table=[{tbl}])", mode, [])
    if name in ("SubqueryAlias", "View") and plan.children().size() == 1:
        # a bare alias / expanded-view wrapper is not an operator —
        # transparent, like Flink's plan which never prints one
        return annotate(sess, plan.children().apply(0), spark)
    kids = [annotate(sess, c, spark) for c in _children(plan)]
    if name == "Aggregate":
        child = _normalized(kids[0])
        # rule 2/3: accumulate-only over append, signed (retract) agg
        # otherwise; output retracts either way on an unbounded stream
        op = (
            "GroupAggregate"
            if child.mode == "append"
            else "GroupAggregate(retract)"
        )
        return _Annot(op, "retract", [child])
    if name == "Join":
        left, right = (_normalized(k) for k in kids)
        # rule 4: any retracting input → IVM changelog join
        if "retract" in (left.mode, right.mode):
            return _Annot("Join(changelog)", "retract", [left, right])
        return _Annot("Join", "append", [left, right])
    if name == "Deduplicate":
        child = _normalized(kids[0])
        return _Annot("Deduplicate", "retract", [child])
    if not kids:
        return _Annot(name, "append", [])
    # pass-through (Calc/Sort/Limit/Union/...): mode = max of inputs
    mode = max((k.mode for k in kids), key=_RANK.__getitem__)
    return _Annot(_FLINK_NAMES.get(name, name), mode, kids)


def wrap_sink(tree: _Annot, sink_name: str, sink_kind: str) -> _Annot:
    """Terminal sink rules (5/6) for EXPLAIN over INSERT INTO."""
    mode = tree.mode
    if sink_kind == "append":
        if mode != "append":
            raise ValueError(
                "Table sink doesn't support consuming update changes "
                f"which is produced by node {tree.name} — declare a "
                "PRIMARY KEY on the sink for upsert semantics"
            )
        return _Annot(f"Sink(table=[{sink_name}])", "append", [tree])
    if sink_kind == "upsert":
        if mode == "retract":
            tree = _Annot("DropUpdateBefore", "upsert", [tree])
        return _Annot(f"Sink(table=[{sink_name}])", "upsert", [tree])
    return _Annot(f"Sink(table=[{sink_name}])", "retract", [tree])


def changelog_mode_section(sess, df, sink: tuple[str, str] | None = None) -> str:
    """Render the '== Changelog Mode ==' explain section for a frame."""
    tree = annotate(
        sess, df._jdf.queryExecution().analyzed(), df.sparkSession
    )
    if sink is not None:
        tree = wrap_sink(tree, *sink)
    return "\n".join(tree.render())


def estimated_cost_section(df) -> str:
    """Render '== Estimated Cost ==': each optimized-plan operator with
    Catalyst's Statistics (sizeInBytes always; rowCount when the
    estimator derives one) — the Spark stand-in for Flink's
    {rowcount, cpu, io, network, memory} cost tuples."""
    lines: list[str] = []

    def walk(node, indent: int) -> None:
        st = node.stats()
        rc = st.rowCount()
        rows = rc.get() if rc.isDefined() else "?"
        pad = "" if indent == 0 else "   " * (indent - 1) + "+- "
        lines.append(
            f"{pad}{node.nodeName()}: cost = "
            f"{{rows: {rows}, sizeInBytes: {st.sizeInBytes()}}}"
        )
        for c in _children(node):
            walk(c, indent + 1)

    walk(df._jdf.queryExecution().optimizedPlan(), 0)
    return "\n".join(lines)
