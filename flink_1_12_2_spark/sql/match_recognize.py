"""MATCH_RECOGNIZE front door — Flink's SQL CEP surface on the engine's NFA.

Flink parity: StreamExecMatch.scala:68 (SQL MATCH_RECOGNIZE → CEP operator).
Supported subset (mirrors streaming/cep.py's NFA scope):

    SELECT * FROM <table> MATCH_RECOGNIZE (
      PARTITION BY <col>
      ORDER BY <col>
      MEASURES FIRST(col) AS a, LAST(col) AS b   -- match-level accessors
      PATTERN (A B [C ...])          -- linear, relaxed contiguity
      PATTERN (A (B | C) D)          -- alternation groups (Calcite
                                     -- SqlMatchRecognize PATTERN |)
      WITHIN INTERVAL '<n>' <unit>   -- optional
      DEFINE A AS <col> = '<lit>', B AS <col> = '<lit>' [, ...]
    )

Pattern quantifiers (SQL MATCH_RECOGNIZE regex syntax → the NFA's
quantifier steps): ``A+`` (one-or-more, reluctant ``A+?``), ``A*``
(zero-or-more), ``A?`` (optional), ``A{n}`` / ``A{n,m}`` (times). The last
pattern variable must be unquantified (the NFA's decidable-completion rule).

Semantics: AFTER MATCH SKIP PAST LAST ROW (Flink's default), relaxed
contiguity between steps (followedBy). Parsing is a regex grammar over the
restricted form — enough for Flink-dialect CEP SQL to run verbatim; richer
predicates belong in the Python Pattern API.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from flink_1_12_2_spark.streaming.cep import Pattern, cep_match_batch

_UNIT_US = {
    "SECOND": 1_000_000,
    "MINUTE": 60 * 1_000_000,
    "HOUR": 3600 * 1_000_000,
    "DAY": 86400 * 1_000_000,
}

_MR = re.compile(
    r"(?is)MATCH_RECOGNIZE\s*\(\s*"
    r"PARTITION\s+BY\s+(?P<part>\w+)\s+"
    r"ORDER\s+BY\s+(?P<order>\w+)\s+"
    r"(?:MEASURES\s+(?P<measures>.*?)\s+)?"
    r"(?:AFTER\s+MATCH\s+SKIP\s+(?P<skip>PAST\s+LAST\s+ROW|TO\s+NEXT\s+ROW|"
    r"TO\s+(?:FIRST|LAST)\s+\w+)\s+)?"
    r"PATTERN\s*\(\s*(?P<pattern>(?:[\w\s+*?{},]|PERMUTE\s*\([\w\s,]*\)"
    r"|\([\w\s|]*\))+?)\s*\)\s+"
    r"(?:WITHIN\s+INTERVAL\s+'(?P<n>\d+)'\s+(?P<unit>\w+)\s+)?"
    r"DEFINE\s+(?P<define>.*?)\s*\)"
)

_DEF = re.compile(
    r"(?is)(\w+)\s+AS\s+(\w+(?:\.\w+)?)\s*(>=|<=|<>|=|>|<)\s*"
    r"('[^']*'|-?\d+(?:\.\d+)?|\w+\.\w+)"
)

_OPS = {
    "=": lambda a, b: a == b,
    "<>": lambda a, b: a != b,
    ">": lambda a, b: a is not None and b is not None and a > b,
    "<": lambda a, b: a is not None and b is not None and a < b,
    ">=": lambda a, b: a is not None and b is not None and a >= b,
    "<=": lambda a, b: a is not None and b is not None and a <= b,
}


def _parse_defines(text: str) -> dict[str, object]:
    """DEFINE clauses → predicates. Supported right-hand sides:
    ``'literal'`` strings, numbers, and ``Var.col`` references to a
    PREVIOUSLY matched variable's last row — the iterative-condition form
    (Flink IterativeCondition / MATCH_RECOGNIZE's running semantics for
    ``B AS B.price > A.price``). A left side ``Var.col`` where Var is the
    defined variable reads the CURRENT row."""
    defs: dict[str, object] = {}
    for name, lhs, op, rhs in _DEF.findall(text):
        col = lhs.split(".")[-1]  # B.price and price both read the row
        cmp = _OPS[op]
        if rhs.startswith("'"):
            lit: object = rhs[1:-1]

            def pred(row, col=col, lit=lit, cmp=cmp):
                return cmp(row.get(col), lit)

        elif re.match(r"^-?\d", rhs):
            num = float(rhs) if "." in rhs else int(rhs)

            def pred(row, col=col, lit=num, cmp=cmp):
                return cmp(row.get(col), lit)

        else:
            ref_var, ref_col = rhs.split(".")

            def pred(
                row, ctx, col=col, rv=ref_var, rc=ref_col, cmp=cmp
            ):
                prev = ctx.last(rv)
                return prev is not None and cmp(row.get(col), prev.get(rc))

        defs[name.upper()] = pred
    return defs

_STEP = re.compile(
    r"(?s)^(?P<name>\w+)(?P<quant>\+\??|\*\??|\?|\{\d+(?:,\s*\d+)?\})?$"
)

# one pattern element: an alternation group `(A | B)` or a variable, either
# optionally quantified — used to tokenize the PATTERN body
_ELEMENT = re.compile(
    r"\(\s*\w+(?:\s*\|\s*\w+)+\s*\)(?:\+\??|\*\??|\?|\{\d+(?:,\s*\d+)?\})?"
    r"|\w+(?:\+\??|\*\??|\?|\{\d+(?:,\s*\d+)?\})?"
)

_ALT = re.compile(
    r"(?s)^\(\s*(?P<alts>\w+(?:\s*\|\s*\w+)+)\s*\)"
    r"(?P<quant>\+\??|\*\??|\?|\{\d+(?:,\s*\d+)?\})?$"
)


def _apply_quantifier(pat: Pattern, quant: str | None) -> Pattern:
    if not quant:
        return pat
    if quant.startswith("+"):
        pat = pat.one_or_more()
    elif quant.startswith("*"):
        pat = pat.one_or_more().optional()
    elif quant == "?":
        pat = pat.optional()
    else:  # {n} / {n,m}
        nums = [int(x) for x in re.findall(r"\d+", quant)]
        pat = pat.times(nums[0], nums[1] if len(nums) > 1 else None)
    # SQL regex quantifiers are greedy by default; +? / *? are reluctant —
    # the NFA default is reluctant, so greedy is the explicit flag
    if quant in ("+", "*") or quant.startswith("{"):
        pat = pat.greedy()
    return pat


_PERMUTE = re.compile(
    r"(?is)^PERMUTE\s*\(\s*(?P<vars>\w+(?:\s*,\s*\w+)+)\s*\)\s*(?P<rest>\w+)?\s*$"
)


def parse_match_recognize(sql: str) -> tuple[str, str, Pattern]:
    """Parse the restricted MATCH_RECOGNIZE block →
    (partition_col, order_col, Pattern)."""
    m = _MR.search(sql)
    if not m:
        raise ValueError("unsupported MATCH_RECOGNIZE syntax (see module doc)")
    defines = _parse_defines(m.group("define"))

    def mk_pred(name: str):
        return defines[name.upper()]

    pm = _PERMUTE.match(m.group("pattern").strip())
    pat: Pattern | None = None
    if pm:  # PATTERN (PERMUTE (A, B [, ...]) [C]) — any-order matching
        names = [v.strip() for v in pm.group("vars").split(",")]
        last = pm.group("rest")
        pat = Pattern.permute(
            [(n, mk_pred(n)) for n in names],
            (last, mk_pred(last)) if last else None,
        )
        elements = []
    else:
        elements = _ELEMENT.findall(m.group("pattern"))
        if "".join(elements).replace(" ", "") != re.sub(
            r"\s", "", m.group("pattern")
        ):
            raise ValueError(
                f"unsupported PATTERN body: {m.group('pattern')!r}"
            )
    for step in elements:
        am = _ALT.match(step)
        if am:  # alternation group (A | B [| C ...]) — Calcite
            # SqlMatchRecognize PATTERN alternation; each matching
            # alternative forks its own NFA branch (streaming/cep.py)
            names = [a.strip() for a in am.group("alts").split("|")]
            alts = [(n, mk_pred(n)) for n in names]
            gname = "_or_".join(names)
            pat = (
                Pattern.begin_one_of(gname, alts)
                if pat is None
                else pat.followed_by_one_of(gname, alts)
            )
            pat = _apply_quantifier(pat, am.group("quant"))
            continue
        sm = _STEP.match(step)
        if not sm:
            raise ValueError(f"unsupported pattern element: {step!r}")
        name = sm.group("name")
        pred = mk_pred(name)
        pat = (
            Pattern.begin(name, pred)
            if pat is None
            else pat.followed_by(name, pred)
        )
        pat = _apply_quantifier(pat, sm.group("quant"))
    if m.group("n"):
        pat = pat.within(int(m.group("n")) * _UNIT_US[m.group("unit").upper()])
    skip_raw = (m.group("skip") or "").split()
    skip = [w.upper() for w in skip_raw]
    if skip[:2] == ["TO", "NEXT"]:
        pat = pat.skip_to_next_row()
    elif skip[:2] == ["TO", "FIRST"]:
        pat = pat.skip_to_first(skip_raw[2])  # var name keeps its case
    elif skip[:2] == ["TO", "LAST"]:
        pat = pat.skip_to_last(skip_raw[2])
    return m.group("part"), m.group("order"), pat.validate()


_MEASURE = re.compile(r"(?is)(FIRST|LAST)\s*\(\s*(\w+)\s*\)\s+AS\s+(\w+)")


def match_recognize_stream(
    sdf: DataFrame, sql: str, buffer_to_watermark: bool = False
) -> DataFrame:
    """STREAMING MATCH_RECOGNIZE: the same restricted SQL surface executed
    through the keyed streaming NFA (StreamExecMatch.scala:68 — Flink's
    MATCH_RECOGNIZE is a streaming operator first). ``sdf`` is a streaming
    DataFrame with a watermark; returns the streaming matches frame
    (append mode). MEASURES projections are not available on the stream
    (they join back to the input — do that on the materialized output);
    ``buffer_to_watermark`` forwards Flink's out-of-order buffering."""
    from flink_1_12_2_spark.streaming.cep import cep_pattern_matches

    part, order, pat = parse_match_recognize(sql)
    return cep_pattern_matches(
        sdf, pat, key_col=part, time_col=order,
        buffer_to_watermark=buffer_to_watermark,
    )


def match_recognize(df: DataFrame, sql: str) -> DataFrame:
    """Execute a restricted MATCH_RECOGNIZE statement against ``df`` (batch).
    Returns (user_id, first_event_id, last_event_id, first_ts_us, last_ts_us)
    per match — one row per completed match; AFTER MATCH SKIP PAST LAST ROW
    (default) or SKIP TO NEXT ROW.

    MEASURES subset: ``FIRST(col) AS alias`` / ``LAST(col) AS alias``
    project a column of the match's first/last row (match-level, not
    per-pattern-variable). Implemented as joins from the match summary back
    to the input on (partition, event_id) — the NFA stays measure-agnostic
    and the join is key-partitioned on both sides."""
    import pyspark.sql.functions as F

    m = _MR.search(sql)
    part, order, pat = parse_match_recognize(sql)
    out = cep_match_batch(df, pat, key_col=part, time_col=order)
    measures = _MEASURE.findall(m.group("measures") or "") if m else []
    for which, col, alias in measures:
        anchor = f"{which.lower()}_event_id"
        side = df.select(
            F.col(part).alias("__mk"),
            F.col("event_id").alias("__mid"),
            F.col(col).alias(alias),
        )
        out = out.join(
            side,
            (out[part] == side["__mk"]) & (out[anchor] == side["__mid"]),
            "left",
        ).drop("__mk", "__mid")
    return out
