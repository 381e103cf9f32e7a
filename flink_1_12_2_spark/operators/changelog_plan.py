"""Changelog-mode inference — the planner half of Flink's retraction model.

Flink parity: FlinkChangelogModeInferenceProgram.scala:39 (759 LoC) walks the
physical plan twice (required-mode top-down, provided-mode bottom-up) and
decides, per operator, whether it must consume/produce UPDATE_BEFORE rows,
whether an upsert source needs ChangelogNormalize, and whether a sink can
drop -U. The engine has had all the RUNTIME pieces since r4
(operators/changelog.py: changelog_normalize / group_agg_retract /
changelog_join / drop_update_before / upsert_foreach_batch) but composing
them was manual. This module infers the chain.

Model (the subset the engine's operators span):

- source modes: ``append`` (insert-only), ``upsert`` (+I/+U/-D keyed by PK,
  no -U — kafka-upsert/CDC-without-before), ``retract`` (full +I/-U/+U/-D).
- ops: ``("agg",)`` group aggregate · ``("join", other_mode)`` two-changelog
  join · ``("topn",)`` rank/top-N · ``("dedup", "first"|"last")`` ·
  ``("window_agg",)`` group-window aggregate · terminal
  ``("sink", "append"|"upsert"|"retract")``.

Inference rules (each cites the Flink decision it mirrors):

1. upsert source + any update-consuming op → insert ``changelog_normalize``
   (StreamExecChangelogNormalize.scala:46 — materializes the missing
   UPDATE_BEFORE so downstream retraction arithmetic is complete).
2. agg over insert-only input → plain ``groupBy.agg`` (accumulate-only
   GroupAggFunction); its OUTPUT is a retract stream (mode becomes
   ``retract``).
3. agg over a retracting input → ``group_agg_retract`` (GroupAggFunction
   retract path, signed aggregation).
4. join where either input retracts → ``changelog_join`` (IVM product
   rule, StreamingJoinOperator); join of two append streams stays a plain
   ``join`` and remains append.
5. upsert sink → ``drop_update_before`` + ``upsert_foreach_batch``
   (DropUpdateBeforeFunction.java — a PK-keyed sink needs no -U) .
6. append sink over an updating stream → raise, exactly Flink's
   "Table sink doesn't support consuming update changes" planner error.
7. top-N over insert-only input → ``topn`` (AppendFastStrategy,
   StreamExecRank.scala:141 — the engine's ``streaming_topn`` bounded
   heap); over a retracting input → ``topn_retract``
   (RetractStrategy → RetractableTopNFunction.java:53 — the engine's
   ``streaming_topn_changelog``). EITHER WAY the output is updating
   (rows leave the top-N → retractions), so mode becomes ``retract``.
8. dedup requires insert-only input (StreamExecDeduplicate — Flink
   raises "Deduplicate doesn't support consuming update changes"; an
   upsert source is normalized first per rule 1). ``keep-first`` OUTPUT
   is insert-only (the first row per key never changes —
   DeduplicateKeepFirstRowFunction); ``keep-last`` emits +U/-U per key →
   ``retract``.
9. window_agg requires insert-only input (StreamExecGroupWindowAggregate
   — "GroupWindowAggregate doesn't support consuming update changes");
   watermark-closed windows emit each result ONCE → output stays
   ``append`` (early/late firing variants would flip this to retract —
   the engine's early-fire emulation lives in streaming/core.py).
"""

from __future__ import annotations

MODES = ("append", "upsert", "retract")


def plan_changelog(source_mode: str, ops: list[tuple]) -> list[str]:
    """Walk ``ops`` tracking the stream's changelog mode; return the full
    operator chain with normalize / retract-agg / drop-update-before
    inserted where Flink's inference program would.

    ``ops``: sequence of ``("agg",)``, ``("join", other_source_mode)``, and
    a final ``("sink", kind)``. Returns operator names in execution order.
    """
    if source_mode not in MODES:
        raise ValueError(f"unknown source mode {source_mode!r}")
    chain: list[str] = [f"source[{source_mode}]"]
    mode = source_mode

    def ensure_consumable(m: str) -> str:
        """An update-consuming op needs complete retractions: upsert
        streams (no -U) are normalized first (rule 1)."""
        if m == "upsert":
            chain.append("changelog_normalize")
            # normalize materializes current state per PK; its output here
            # is the normalized snapshot stream = insert-only semantics
            # per key version, consumed as append by the next operator
            return "append"
        return m

    for op in ops:
        kind = op[0]
        if kind == "agg":
            mode = ensure_consumable(mode)
            if mode == "append":
                chain.append("group_agg")  # accumulate-only
            else:  # retract input
                chain.append("group_agg_retract")
            mode = "retract"  # an updating agg emits retractions (rule 2/3)
        elif kind == "join":
            other = op[1]
            if other not in MODES:
                raise ValueError(f"unknown join input mode {other!r}")
            left = ensure_consumable(mode)
            right = "append" if other == "append" else other
            if other == "upsert":
                chain.append("changelog_normalize[right]")
                right = "append"
            if left == "retract" or right == "retract":
                chain.append("changelog_join")
                mode = "retract"
            else:
                chain.append("join")
                mode = "append"
        elif kind == "topn":
            mode = ensure_consumable(mode)
            if mode == "append":
                chain.append("topn")  # AppendFastStrategy / streaming_topn
            else:
                # RetractStrategy → RetractableTopNFunction parity
                # (engine: streaming_topn_changelog)
                chain.append("topn_retract")
            mode = "retract"  # evictions retract previously-emitted ranks
        elif kind == "dedup":
            keep = op[1] if len(op) > 1 else "last"
            if keep not in ("first", "last"):
                raise ValueError(f"unknown dedup keep mode {keep!r}")
            mode = ensure_consumable(mode)
            if mode != "append":
                raise ValueError(
                    "Deduplicate doesn't support consuming update changes "
                    f"(stream mode is {mode!r}) — StreamExecDeduplicate"
                )
            chain.append(f"dedup_keep_{keep}")
            # keep-first output is insert-only; keep-last updates per key
            mode = "append" if keep == "first" else "retract"
        elif kind == "window_agg":
            mode = ensure_consumable(mode)
            if mode != "append":
                raise ValueError(
                    "GroupWindowAggregate doesn't support consuming update "
                    f"changes (stream mode is {mode!r}) — "
                    "StreamExecGroupWindowAggregate"
                )
            chain.append("window_agg")
            mode = "append"  # watermark-closed windows emit once
        elif kind == "sink":
            target = op[1]
            if target not in MODES:
                raise ValueError(f"unknown sink kind {target!r}")
            if target == "append":
                if mode != "append":
                    raise ValueError(
                        "append sink cannot consume update changes "
                        f"(stream mode is {mode!r}) — Flink: 'Table sink "
                        "doesn't support consuming update changes'"
                    )
                chain.append("sink[append]")
            elif target == "upsert":
                if mode == "retract":
                    chain.append("drop_update_before")  # rule 5
                chain.append("sink[upsert]")
            else:  # retract sink consumes everything
                chain.append("sink[retract]")
            return chain
        else:
            raise ValueError(f"unknown op {op!r}")
    return chain
