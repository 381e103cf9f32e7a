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
pattern variable may be unquantified, exactly quantified (``{n}``), or a
RELUCTANT loop (``B+?`` — emits eagerly per take, Flink's oneOrMore
PROCEED edge); a greedy trailing quantifier is rejected exactly like
Flink's MalformedPatternException.

MEASURES: FIRST/LAST(col) match-boundary accessors, SUM/COUNT/AVG/MIN/MAX
(Var.col) per-variable aggregates, FIRST/LAST(Var.col[, n]) with the
SQL:2016 logical-offset argument (MatchRecognizeITCase.scala:142 —
``LAST(A.name, 2)``), CLASSIFIER(), MATCH_NUMBER(), and optional
RUNNING|FINAL prefixes (ONE ROW PER MATCH: both equal FINAL; ALL ROWS
PER MATCH: RUNNING is the default, FINAL pins the whole-match value on
every row). DEFINE: comparisons and ``<operand> IS [NOT] NULL`` atoms
(MatchRecognizeITCase.scala:165) joined with AND/OR; operands are
literals, current-row columns, other variables' last rows (``A.price``),
FIRST/LAST(Var.col[, n]), running aggregates ``SUM/COUNT/AVG/MIN/MAX
(Var.col)`` (the candidate row counts toward its own variable — Flink's
RUNNING semantics), and ``PREV/NEXT(col[, n])`` PHYSICAL navigation over
the partition order (the canonical V-pattern ticker's ``price <
PREV(price)``). PREV/NEXT are evaluated JVM-side: the front door
precomputes them as lag/lead window columns over the same (partition,
order) key the NFA groups on — one shared exchange, zero per-row Python
for navigation.

Parity boundary vs the reference (flink 1.12 MATCH_RECOGNIZE "known
limitations", docs/dev/table/streaming/match_recognize):
greedy trailing quantifiers are unsupported THERE too (we reject the
same inputs); pattern ALTERNATION ``(A | B)``, ``PERMUTE``, ``ALL ROWS
PER MATCH`` (SQL:2016 R010 — row-grain emission with RUNNING measures,
per-row CLASSIFIER, MATCH_NUMBER), and ``SUBSET`` union variables in
MEASURES (order-insensitive aggregates; FIRST/LAST on a subset is
rejected) are all rejected by the reference but SUPPORTED here — a
strict superset of the reference surface.

Semantics: AFTER MATCH SKIP PAST LAST ROW (Flink's default), relaxed
contiguity between steps (followedBy). Parsing is a regex grammar over the
restricted form — enough for Flink-dialect CEP SQL to run verbatim; richer
predicates belong in the Python Pattern API.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from flink_1_12_2_spark.streaming.cep import Pattern, cep_match_batch
from flink_1_12_2_spark.cache_registry import track as _track_cache

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
    r"(?:(?P<rows>ONE\s+ROW|ALL\s+ROWS)\s+PER\s+MATCH\s+)?"
    r"(?:AFTER\s+MATCH\s+SKIP\s+(?P<skip>PAST\s+LAST\s+ROW|TO\s+NEXT\s+ROW|"
    r"TO\s+(?:FIRST|LAST)\s+\w+)\s+)?"
    r"PATTERN\s*\(\s*(?P<pattern>(?:[\w\s+*?{},]|PERMUTE\s*\([\w\s,]*\)"
    r"|\([\w\s|]*\))+?)\s*\)\s+"
    # SUBSET U = (A, B)[, V = (...)] — union variables for MEASURES
    r"(?:SUBSET\s+(?P<subset>\w+\s*=\s*\([\w\s,]*\)"
    r"(?:\s*,\s*\w+\s*=\s*\([\w\s,]*\))*)\s+)?"
    # DEFINE runs to the MATCH_RECOGNIZE closing paren: lazy match over
    # non-paren chars, quoted strings, and SINGLE-LEVEL (...) groups (the
    # AGG(Var.col) calls) — unlike a greedy `.*)`, SQL FOLLOWING the block
    # (outer subquery parens, WHERE clauses) is never swallowed into the
    # last DEFINE expression
    r"(?:WITHIN\s+INTERVAL\s+'(?P<n>\d+)'\s+(?P<unit>\w+)\s+)?"
    r"DEFINE\s+(?P<define>(?:[^()']|'[^']*'|\([^()]*\))*?)\s*\)"
)

_OPS = {
    # SQL three-valued logic: ANY comparison with NULL is not-true — an
    # unmatched variable reference or NULL column must never satisfy a
    # DEFINE predicate (including = and <>)
    "=": lambda a, b: a is not None and b is not None and a == b,
    "<>": lambda a, b: a is not None and b is not None and a != b,
    ">": lambda a, b: a is not None and b is not None and a > b,
    "<": lambda a, b: a is not None and b is not None and a < b,
    ">=": lambda a, b: a is not None and b is not None and a >= b,
    "<=": lambda a, b: a is not None and b is not None and a <= b,
}

# one DEFINE item: `name AS <expr>` where <expr> runs to the next item
_DEF_ITEM = re.compile(r"(?is)\b(\w+)\s+AS\s+(.*?)(?=,\s*\w+\s+AS\b|\Z)")
_CMP = re.compile(r"(?s)\s*(>=|<=|<>|=|>|<)\s*")
_AGG_OPERAND = re.compile(
    r"(?is)^(SUM|COUNT|AVG|MIN|MAX|FIRST|LAST)\s*\(\s*(\w+)\.(\w+)\s*"
    r"(?:,\s*(\d+)\s*)?\)$"
)
# PREV/NEXT physical navigation: PREV(col[, n]) / PREV(Var.col[, n]) —
# offset over the PARTITION ORDER (SQL:2016 physical navigation), not the
# variable's matched rows; Var, if given, must be the defined variable
# (Flink's restriction too — MatchRecognizeITCase.scala:122)
_NAV_OPERAND = re.compile(
    r"(?is)^(PREV|NEXT)\s*\(\s*(?:(\w+)\.)?(\w+)\s*(?:,\s*(\d+)\s*)?\)$"
)
_VARCOL = re.compile(r"^(\w+)\.(\w+)$")


def _nav_col(fn: str, col: str, n: int) -> str:
    """Internal column name for a precomputed PREV/NEXT value."""
    return f"__nav_{fn.lower()}{n}_{col}"


def _operand(tok: str, defined: str) -> tuple:
    """One comparison operand →
    (getter(row, ctx) -> value, needs_events, navs).

    Forms: ``'literal'`` · number · ``col`` / ``Var.col`` (the defined
    variable or a bare column reads the CURRENT row; another variable reads
    its LAST matched row) · ``FIRST/LAST(Var.col[, n])`` (boundary rows
    with optional LOGICAL offset into the variable's matched rows, running
    semantics: for the defined variable the current candidate row is the
    fallback/last) · ``SUM/COUNT/AVG/MIN/MAX(Var.col)`` (aggregates over
    the variable's matched rows — running semantics include the candidate
    row for its own variable; needs ``Pattern.with_events()`` state) ·
    ``PREV/NEXT(col[, n])`` (PHYSICAL offset over the partition order —
    SQL:2016 navigation; evaluated JVM-side as a lag/lead window column
    BEFORE rows enter the NFA, so the Python predicate is a plain column
    read; ``navs`` reports the (fn, col, n) columns to precompute)."""
    tok = tok.strip()
    if tok.startswith("'"):
        lit = tok[1:-1]
        return (lambda row, ctx, _l=lit: _l), False, set()
    if re.match(r"^-?\d", tok):
        num = float(tok) if "." in tok else int(tok)
        return (lambda row, ctx, _l=num: _l), False, set()
    nv = _NAV_OPERAND.match(tok)
    if nv:
        fn, var, col, off = nv.groups()
        if var is not None and var.upper() != defined.upper():
            raise ValueError(
                f"PREV/NEXT on another pattern variable is unsupported "
                f"(physical navigation reads the defined variable's current "
                f"row): {tok!r}"
            )
        n = int(off) if off else 1
        name = _nav_col(fn.upper(), col, n)
        return (
            (lambda row, ctx, _c=name: row.get(_c)),
            False,
            {(fn.upper(), col, n)},
        )
    am = _AGG_OPERAND.match(tok)
    if am:
        fn, var, col = am.group(1).upper(), am.group(2), am.group(3)
        off = int(am.group(4)) if am.group(4) else 0
        own = var.upper() == defined.upper()
        if off and fn not in ("FIRST", "LAST"):
            raise ValueError(f"offset argument only valid on FIRST/LAST: {tok!r}")
        if fn == "FIRST" and off == 0:

            def get(row, ctx, _v=var, _c=col, _own=own):
                prev = ctx.first(_v)
                if prev is None:
                    return row.get(_c) if _own else None
                return prev.get(_c)

            return get, False, set()
        if fn == "LAST" and off == 0:

            def get(row, ctx, _v=var, _c=col, _own=own):
                if _own:  # the candidate row IS the running last of its var
                    return row.get(_c)
                prev = ctx.last(_v)
                return None if prev is None else prev.get(_c)

            return get, False, set()
        if fn in ("FIRST", "LAST"):
            # logical offset into the variable's matched-row list
            # (MatchRecognizeITCase.scala:142 — LAST(A.name, 2)); running
            # semantics append the candidate row for its own variable;
            # out-of-range offsets are NULL (SQL navigation default)

            def get(row, ctx, _v=var, _c=col, _own=own, _fn=fn, _k=off):
                seq = list(ctx.events(_v))
                if _own:
                    seq.append(row)
                idx = _k if _fn == "FIRST" else len(seq) - 1 - _k
                if idx < 0 or idx >= len(seq):
                    return None
                return seq[idx].get(_c)

            return get, True, set()

        def get(row, ctx, _v=var, _c=col, _own=own, _fn=fn):
            vals = [
                e.get(_c) for e in ctx.events(_v) if e.get(_c) is not None
            ]
            if _own and row.get(_c) is not None:
                vals = vals + [row.get(_c)]  # running semantics
            if _fn == "COUNT":
                return len(vals)
            if not vals:
                return None
            if _fn == "SUM":
                return sum(vals)
            if _fn == "AVG":
                return sum(vals) / len(vals)
            return min(vals) if _fn == "MIN" else max(vals)

        return get, True, set()
    vm = _VARCOL.match(tok)
    if vm and vm.group(1).upper() != defined.upper():
        var, col = vm.group(1), vm.group(2)

        def get(row, ctx, _v=var, _c=col):
            prev = ctx.last(_v)
            return None if prev is None else prev.get(_c)

        return get, False, set()
    if not re.match(r"^\w+(?:\.\w+)?$", tok):
        # anything function-call-shaped that the AGG regex didn't accept
        # (MEDIAN(...), FIRST(price) without Var prefix, typos) must fail
        # loudly — falling through to a bare-column read would silently
        # evaluate every comparison to False
        raise ValueError(f"unsupported DEFINE operand: {tok!r}")
    col = tok.split(".")[-1]  # defined var's or bare column → current row
    return (lambda row, ctx, _c=col: row.get(_c)), False, set()


_IS_NULL = re.compile(r"(?is)^(.*?)\s+IS\s+(NOT\s+)?NULL$")


def _operand_col(tok: str, defined: str):
    """Catalyst twin of :func:`_operand` for ROW-LOCAL operands: a pyspark
    Column reading the same value the Python getter would, or None when the
    operand needs match state (other-variable refs, FIRST/LAST, aggregates)
    and therefore can't be evaluated before the NFA. Used by the
    candidate pre-gate (:func:`_pregate`) to build per-variable UPPER-BOUND
    predicates that Catalyst evaluates in the scan stage."""
    import pyspark.sql.functions as F

    tok = tok.strip()
    if tok.startswith("'"):
        return F.lit(tok[1:-1])
    if re.match(r"^-?\d", tok):
        return F.lit(float(tok) if "." in tok else int(tok))
    nv = _NAV_OPERAND.match(tok)
    if nv:
        fn, _var, col, off = nv.groups()
        return F.col(_nav_col(fn.upper(), col, int(off) if off else 1))
    if _AGG_OPERAND.match(tok):
        return None
    vm = _VARCOL.match(tok)
    if vm and vm.group(1).upper() != defined.upper():
        return None
    if re.match(r"^\w+(?:\.\w+)?$", tok):
        return F.col(tok.split(".")[-1])
    return None


_COL_OPS = {
    # Column twins of _OPS: a NULL operand makes the comparison NULL,
    # which filter() treats as not-true — same three-valued semantics
    "=": lambda a, b: a == b,
    "<>": lambda a, b: a != b,
    ">": lambda a, b: a > b,
    "<": lambda a, b: a < b,
    ">=": lambda a, b: a >= b,
    "<=": lambda a, b: a <= b,
}


def _parse_expr(expr: str, defined: str) -> tuple:
    """Boolean DEFINE expression →
    (pred(row, ctx), needs_events, navs, bound).

    Grammar: comparisons and ``<operand> IS [NOT] NULL`` atoms
    (MatchRecognizeITCase.scala:165 — ``LAST(A.nullField) IS NULL``)
    joined by AND / OR (OR binds looser, no parens) — the Flink
    MATCH_RECOGNIZE DEFINE surface minus nested parentheses.

    ``bound`` is a pyspark Column UPPER BOUND of the predicate — true for
    every row the Python predicate could accept in ANY match state — built
    from the row-local atoms only (non-row-local atoms relax to TRUE:
    dropped from conjunctions; a fully non-local disjunct makes the whole
    bound None = unpruneable). The pre-gate filters on it JVM-side."""
    import pyspark.sql.functions as F

    needs = False
    navs: set = set()
    disjuncts = []
    bound_disjuncts: list = []
    bound_ok = True
    for part in re.split(r"(?i)\s+OR\s+", expr.strip()):
        conj = []
        conj_bounds: list = []
        for atom in re.split(r"(?i)\s+AND\s+", part.strip()):
            atom = atom.strip()
            nm = _IS_NULL.match(atom)
            if nm:
                gl, nl, vl = _operand(nm.group(1), defined)
                needs = needs or nl
                navs |= vl
                cl = _operand_col(nm.group(1), defined)
                if nm.group(2):  # IS NOT NULL
                    conj.append((gl, lambda a, b: a is not None, gl))
                    if cl is not None:
                        conj_bounds.append(cl.isNotNull())
                else:
                    conj.append((gl, lambda a, b: a is None, gl))
                    if cl is not None:
                        conj_bounds.append(cl.isNull())
                continue
            pieces = _CMP.split(atom)
            if len(pieces) != 3:
                raise ValueError(f"unsupported DEFINE atom: {atom!r}")
            gl, nl, vl = _operand(pieces[0], defined)
            gr, nr, vr = _operand(pieces[2], defined)
            needs = needs or nl or nr
            navs |= vl | vr
            conj.append((gl, _OPS[pieces[1]], gr))
            cl = _operand_col(pieces[0], defined)
            cr = _operand_col(pieces[2], defined)
            if cl is not None and cr is not None:
                conj_bounds.append(_COL_OPS[pieces[1]](cl, cr))
        disjuncts.append(conj)
        if conj_bounds:
            b = conj_bounds[0]
            for extra in conj_bounds[1:]:
                b = b & extra
            bound_disjuncts.append(b)
        else:
            # this disjunct has no row-local atom: it may accept any row,
            # so the whole expression has no usable upper bound
            bound_ok = False

    def pred(row, ctx, _d=disjuncts):
        return any(
            all(cmp(gl(row, ctx), gr(row, ctx)) for gl, cmp, gr in conj)
            for conj in _d
        )

    bound = None
    if bound_ok and bound_disjuncts:
        bound = bound_disjuncts[0]
        for extra in bound_disjuncts[1:]:
            bound = bound | extra
    return pred, needs, navs, bound


def _parse_defines(text: str) -> tuple[dict[str, object], bool, set, dict]:
    """DEFINE clauses → ({VAR: pred}, needs_events, navs, {VAR: bound}).
    Each definition is a boolean expression over comparisons (see
    :func:`_parse_expr`); ``needs_events`` reports whether any predicate
    aggregates over a variable's full row set (→ the pattern must retain
    events); ``navs`` collects the (PREV|NEXT, col, n) physical-navigation
    columns the front door must precompute as lag/lead windows; ``bounds``
    maps each variable to its Catalyst upper-bound Column (absent when
    unpruneable)."""
    defs: dict[str, object] = {}
    needs_events = False
    navs: set = set()
    bounds: dict = {}
    for name, expr in _DEF_ITEM.findall(text):
        pred, needs, nv, bound = _parse_expr(expr, name)
        needs_events = needs_events or needs
        navs |= nv
        defs[name.upper()] = pred
        if bound is not None:
            bounds[name.upper()] = bound
    return defs, needs_events, navs, bounds

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
    (partition_col, order_col, Pattern). Rejects PREV/NEXT physical
    navigation — those need the batch front door (:func:`match_recognize`)
    which precomputes the lag/lead columns the predicates read."""
    part, order, pat, navs, _bounds = _parse_mr(sql)
    if navs:
        raise ValueError(
            "PREV/NEXT physical navigation requires the batch "
            "match_recognize() front door (lag/lead precompute); "
            f"needed: {sorted(navs)}"
        )
    return part, order, pat


def _parse_mr(sql: str) -> tuple[str, str, Pattern, set, dict]:
    """Full parse → (partition_col, order_col, Pattern, navs, bounds).
    ``navs`` is the set of (PREV|NEXT, col, n) physical-navigation columns
    DEFINE predicates read (computed as lag/lead over the partition order
    before rows enter the NFA); ``bounds`` maps variables to Catalyst
    upper-bound Columns for the candidate pre-gate."""
    m = _MR.search(sql)
    if not m:
        raise ValueError("unsupported MATCH_RECOGNIZE syntax (see module doc)")
    defines, needs_events, navs, bounds = _parse_defines(m.group("define"))

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
    if needs_events:  # DEFINE aggregates read the variable's full row set
        pat = pat.with_events()
    return m.group("part"), m.group("order"), pat.validate(), navs, bounds


def _pregate(df: DataFrame, part: str, pat: Pattern, bounds: dict):
    """Vectorized CEP candidate pre-gate: Catalyst filters evaluated BEFORE
    rows reach the Python NFA, a pure optimization with byte-identical
    output.

    1. ROW gate — keep only rows satisfying the upper bound of AT LEAST
       ONE pattern variable's DEFINE. A row matching no variable is never
       consumed by any branch under relaxed contiguity, never enters
       first/last/events state, and the SQL grammar produces no
       kill/until/strict steps — so dropping it cannot change the match
       set. Row-local bounds typically reach the parquet scan as
       PushedFilters, so at 100 TB the non-candidate bulk never leaves
       the scan stage.
    2. KEY gate — keep only partitions with at least one row satisfying
       the match-START upper bound (the leading optional prefix plus the
       first mandatory step, across every PERMUTE sequence): a key with
       no possible first row yields zero matches, so its rows need not be
       shipped to Python at all. One window max over the same partition
       key the NFA groups on — no extra exchange.

    Both gates degrade to no-ops when a needed variable has no row-local
    bound (iterative/aggregate-only DEFINEs). Defensively skipped for
    step features the SQL grammar can't produce today (strict contiguity,
    negatives, until, consecutive) whose semantics DO observe dropped
    rows."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    step_lists = pat.seqs if pat.seqs else [pat.steps]
    for steps in step_lists:
        for s in steps:
            if s.negative or s.strict or s.consecutive or s.until_pred:
                return df
    used: list[str] = []
    starts: list[str] = []
    for steps in step_lists:
        for s in steps:
            used.extend([n for n, _ in s.alts] if s.alts else [s.name])
        for s in steps:
            starts.extend(
                [n for n, _ in s.alts] if s.alts else [s.name]
            )
            if s.min_times > 0:
                break

    def union_bound(names: list[str]):
        cols = []
        # sorted: deterministic OR order → stable plans across runs
        for n in sorted(set(names)):
            b = bounds.get(n.upper())
            if b is None:
                return None  # some variable unpruneable → gate off
            cols.append(b)
        out = cols[0]
        for b in cols[1:]:
            out = out | b
        return out

    row_bound = union_bound(used)
    if row_bound is not None:
        df = df.filter(row_bound)
    start_bound = union_bound(starts)
    if start_bound is not None:
        from flink_1_12_2_spark.session import pinned_repartition

        # pin the key partitioning BEFORE the window: the window's own
        # ENSURE_REQUIREMENTS exchange is AQE-coalescible, and a later
        # pin would collapse as a no-op — leaving the window AND the
        # downstream Python NFA on the 1-3 byte-coalesced partitions
        df = (
            pinned_repartition(df, part)
            .withColumn(
                "__mr_has_start",
                F.max(start_bound.cast("int")).over(Window.partitionBy(part)),
            )
            .filter(F.col("__mr_has_start") == 1)
            .drop("__mr_has_start")
        )
    return df


def _with_nav_columns(df: DataFrame, part: str, order: str, navs: set):
    """Precompute PREV/NEXT physical-navigation values as lag/lead window
    columns over (PARTITION BY part ORDER BY order, event_id) — the same
    key the NFA groups on, so Catalyst reuses one exchange for both the
    window and the applyInPandas stage. The Python predicate then reads a
    plain column of its own row: navigation costs zero per-row Python."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from flink_1_12_2_spark.session import pinned_repartition

    if not navs:
        return df
    # pinned key partitioning: the lag/lead exchange feeds the Python NFA
    # downstream, so byte-based AQE coalescing here would starve it (see
    # session.pinned_repartition)
    df = pinned_repartition(df, part)
    w = Window.partitionBy(part).orderBy(order, "event_id")
    for fn, col, n in sorted(navs):
        shift = F.lag(col, n) if fn == "PREV" else F.lead(col, n)
        df = df.withColumn(_nav_col(fn, col, n), shift.over(w))
    return df


# MEASURES item: optional RUNNING|FINAL prefix (SQL:2016 semantics
# keyword: ONE ROW PER MATCH output is always FINAL — RUNNING evaluated
# at the last row equals FINAL, so both keywords are accepted there; in
# ALL ROWS PER MATCH the default is RUNNING and FINAL pins the whole-match
# value onto every row), then AGG(Var.col[, offset]) — the offset is the
# FIRST/LAST logical navigation argument (MatchRecognizeITCase.scala:142)
_M_AGG = re.compile(
    r"(?is)^(?:(RUNNING|FINAL)\s+)?"
    r"(SUM|COUNT|AVG|MIN|MAX|FIRST|LAST)\s*\(\s*(\w+)\.(\w+)\s*"
    r"(?:,\s*(\d+)\s*)?\)\s+AS\s+(\w+)$"
)
_M_PLAIN = re.compile(
    r"(?is)^(?:(?:RUNNING|FINAL)\s+)?(FIRST|LAST)\s*\(\s*(\w+)\s*\)"
    r"\s+AS\s+(\w+)$"
)
_M_CLS = re.compile(r"(?is)^CLASSIFIER\s*\(\s*\)\s+AS\s+(\w+)$")
_M_MN = re.compile(r"(?is)^MATCH_NUMBER\s*\(\s*\)\s+AS\s+(\w+)$")
# Flink time attributes of the MATCH output (FlinkSqlOperatorTable
# MATCH_ROWTIME/MATCH_PROCTIME; MatchRecognizeITCase.scala): the match's
# event-time (its LAST row's rowtime — what lets a window aggregate chain
# after MATCH_RECOGNIZE) and a processing-time marker.
_M_MRT = re.compile(r"(?is)^MATCH_ROWTIME\s*\(\s*\)\s+AS\s+(\w+)$")
_M_MPT = re.compile(r"(?is)^MATCH_PROCTIME\s*\(\s*\)\s+AS\s+(\w+)$")
_SUBSET_ITEM = re.compile(r"(\w+)\s*=\s*\(([\w\s,]*)\)")


def _split_measures(text: str | None) -> list[str]:
    """Split the MEASURES list on TOP-LEVEL commas only — offset arguments
    (``LAST(A.col, 2)``) carry commas inside the call parens."""
    items: list[str] = []
    depth = 0
    cur: list[str] = []
    for ch in text or "":
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            items.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    items.append("".join(cur))
    return [i.strip() for i in items if i.strip()]


def _parse_subsets(text: str | None) -> dict[str, list[str]]:
    """SUBSET clause → {union_var: [member_vars]} (SQL:2016; the reference
    rejects SUBSET — docs known limitations — supported here for MEASURES)."""
    if not text:
        return {}
    return {
        name: [v.strip() for v in members.split(",") if v.strip()]
        for name, members in _SUBSET_ITEM.findall(text)
    }


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


def _match_recognize_all_rows(
    df: DataFrame, nfa_in: DataFrame, sql: str, m, part: str, order: str, pat
) -> DataFrame:
    """ALL ROWS PER MATCH emission (SQL:2016 R010; BEYOND the reference —
    Flink 1.12 rejects it, docs/dev/table/streaming/match_recognize "known
    limitations"). One output row per matched input row, carrying every
    input column plus MEASURES under RUNNING semantics:

    - ``SUM/COUNT/AVG/MIN/MAX(Var.col)`` — over the rows assigned to
      ``Var`` up to and including the current row;
    - ``CLASSIFIER()`` — the CURRENT row's pattern variable;
    - ``MATCH_NUMBER()`` — same numbering as ONE ROW mode.
    ``FIRST/LAST`` measures are rejected here (RUNNING boundary accessors
    are not implemented for row-grain output).

    Scale: the NFA emits (match → var → event-id) assignments; rows
    explode per match and join back to the input key-partitioned; the
    running window partitions by (partition, match_number) — bounded by
    match length, never by partition size."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    items = _split_measures(m.group("measures"))
    # (fn, var, col, alias, final) — final=True pins the whole-match value
    # on every row (SQL:2016 FINAL keyword; default here is RUNNING)
    specs: list[tuple[str, str, str, str, bool]] = []
    cls_alias = mn_alias = mrt_alias = mpt_alias = None
    for it in items:
        am = _M_AGG.match(it)
        if am:
            prefix, fn, var, col, off, alias = am.groups()
            if fn.upper() in ("FIRST", "LAST"):
                raise ValueError(
                    f"ALL ROWS PER MATCH: FIRST/LAST measures unsupported: {it!r}"
                )
            if off:
                raise ValueError(
                    f"offset argument only valid on FIRST/LAST: {it!r}"
                )
            final = (prefix or "").upper() == "FINAL"
            specs.append((fn.upper(), var, col, alias, final))
            continue
        cm = _M_CLS.match(it)
        if cm:
            cls_alias = cm.group(1)
            continue
        nm = _M_MN.match(it)
        if nm:
            mn_alias = nm.group(1)
            continue
        rt = _M_MRT.match(it)
        if rt:
            mrt_alias = rt.group(1)
            continue
        pt = _M_MPT.match(it)
        if pt:
            mpt_alias = pt.group(1)
            continue
        raise ValueError(f"ALL ROWS PER MATCH: unsupported MEASURES item: {it!r}")

    out = cep_match_batch(
        nfa_in, pat, key_col=part, time_col=order, include_vars=True
    )
    wmn = Window.partitionBy(part).orderBy(
        "first_ts_us", "first_event_id", "last_ts_us", "last_event_id"
    )
    pairs = (
        out.withColumn("__mn", F.row_number().over(wmn))
        .withColumn(
            "__vars", F.from_json("vars_json", "map<string,array<bigint>>")
        )
        .select(
            F.col(part).alias("__k"),
            "__mn",
            F.explode("__vars").alias("__var", "__ids"),
        )
        .select("__k", "__mn", "__var", F.explode("__ids").alias("__eid"))
    )
    side = df.select(
        F.col(part).alias("__k"), F.col("event_id").alias("__eid"), "*"
    )
    joined = pairs.join(side, ["__k", "__eid"])
    runw = (
        Window.partitionBy("__k", "__mn")
        .orderBy(order, "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # FINAL measures: whole-match frame — the aggregate over ALL of the
    # match's rows repeated on every output row
    finw = (
        Window.partitionBy("__k", "__mn")
        .orderBy(order, "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    subsets = _parse_subsets(m.group("subset"))
    proj = [F.col(c) for c in df.columns]
    for fn, var, col, alias, final in specs:
        cond = (
            F.col("__var").isin(*subsets[var])
            if var in subsets
            else F.col("__var") == var
        )
        val = F.when(cond, F.col(col))
        expr = {
            "SUM": F.sum(val),
            "COUNT": F.count(val),
            "AVG": F.avg(val),
            "MIN": F.min(val),
            "MAX": F.max(val),
        }[fn]
        proj.append(expr.over(finw if final else runw).alias(alias))
    if cls_alias is not None:
        proj.append(F.col("__var").alias(cls_alias))
    if mn_alias is not None:
        proj.append(F.col("__mn").alias(mn_alias))
    if mrt_alias is not None:
        # RUNNING rowtime: the CURRENT row's order value (row-grain
        # output advances the match rowtime row by row)
        proj.append(F.col(order).alias(mrt_alias))
    if mpt_alias is not None:
        proj.append(F.current_timestamp().alias(mpt_alias))
    return joined.select(*proj)


def match_recognize(df: DataFrame, sql: str) -> DataFrame:
    """Execute a restricted MATCH_RECOGNIZE statement against ``df`` (batch).
    Returns (user_id, first_event_id, last_event_id, first_ts_us, last_ts_us)
    per match plus MEASURES columns — one row per completed match (ONE ROW
    PER MATCH → FINAL semantics). With ``ALL ROWS PER MATCH`` in the SQL,
    emits one row per MATCHED INPUT ROW instead (RUNNING measures,
    per-row CLASSIFIER — see :func:`_match_recognize_all_rows`).

    MEASURES surface (StreamExecMatch / Flink's MATCH_RECOGNIZE measures):

    - ``FIRST(col) / LAST(col) AS alias`` — a column of the match's
      first/last row (match-level accessors);
    - ``SUM/COUNT/AVG/MIN/MAX(Var.col) AS alias`` — aggregates over the
      rows the match assigned to pattern variable ``Var``;
    - ``FIRST/LAST(Var.col) AS alias`` — the variable's boundary rows;
    - ``CLASSIFIER() AS alias`` — the variable of the match's LAST row;
    - ``MATCH_NUMBER() AS alias`` — 1-based sequential match number per
      partition (ordered by match start).

    Implementation: the NFA records each match's variable→event-ids
    assignment (``vars_json``); per-variable measures posexplode the id
    list and join back to the input on (partition, event_id) — both sides
    key-partitioned, aggregate state bounded by match length. The NFA
    itself stays measure-agnostic.

    Cache contract: when the MEASURES reference per-variable aggregates,
    the (match-count-sized) NFA output is persisted so each aggregate
    join does not recompute the Python-NFA subtree; the cache lives until
    the caller unpersists the result or runs
    ``spark.catalog.clearCache()`` (the registry harness does between
    queries)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    m = _MR.search(sql)
    part, order, pat, navs, bounds = _parse_mr(sql)
    nfa_in = _with_nav_columns(df, part, order, navs)
    nfa_in = _pregate(nfa_in, part, pat, bounds)
    if (m.group("rows") or "").upper().startswith("ALL"):
        return _match_recognize_all_rows(df, nfa_in, sql, m, part, order, pat)
    items = _split_measures(m.group("measures"))
    plain: list[tuple[str, str, str]] = []
    # per variable: (fn, col, alias, offset)
    var_aggs: dict[str, list[tuple[str, str, str, int]]] = {}
    cls_alias = mn_alias = mrt_alias = mpt_alias = None
    for it in items:
        am = _M_AGG.match(it)
        if am:
            _prefix, fn, var, col, off, alias = am.groups()
            off = int(off) if off else 0
            if off and fn.upper() not in ("FIRST", "LAST"):
                raise ValueError(
                    f"offset argument only valid on FIRST/LAST: {it!r}"
                )
            # RUNNING|FINAL both legal here: ONE ROW PER MATCH evaluates
            # at the final row where RUNNING == FINAL
            var_aggs.setdefault(var, []).append((fn.upper(), col, alias, off))
            continue
        pm = _M_PLAIN.match(it)
        if pm:
            plain.append(pm.groups())
            continue
        cm = _M_CLS.match(it)
        if cm:
            cls_alias = cm.group(1)
            continue
        nm = _M_MN.match(it)
        if nm:
            mn_alias = nm.group(1)
            continue
        rt = _M_MRT.match(it)
        if rt:
            mrt_alias = rt.group(1)
            continue
        pt = _M_MPT.match(it)
        if pt:
            mpt_alias = pt.group(1)
            continue
        raise ValueError(f"unsupported MEASURES item: {it!r}")
    need_vars = bool(var_aggs) or cls_alias is not None
    out = cep_match_batch(
        nfa_in, pat, key_col=part, time_col=order, include_vars=need_vars
    )
    if var_aggs:
        # each per-variable aggregate joins `out` back against an
        # aggregation DERIVED FROM `out` — without a cache boundary Spark
        # recomputes the whole Python-NFA subtree once per reference
        # (measured: 6.5 s vs 1.4 s single-pass at sf0.1). persist() (not
        # localCheckpoint) computes the (small, match-count-sized) NFA
        # output once while keeping the subtree visible to EXPLAIN/plan
        # tests and reclaimable via spark.catalog.clearCache().
        out = out.persist().transform(_track_cache)
        # ALWAYS eager-fill this cache: every per-variable aggregate join
        # scans it, and left lazy their map stages race the cold fill and
        # each re-runs the subtree (r10 finding). The r11 adaptive
        # heuristic (_maybe_eager: skip the barrier on single-split
        # sources) was built for dedup pipelines whose raced subtree is a
        # cheap scan — here the subtree is the PYTHON NFA, expensive at
        # any split count, so the race costs ~1 s even on a single local
        # file (r12 A/B at sf0.1: lazy min 3.6 s vs eager min 2.6 s —
        # the real cause of the r11 bench drift on this row, previously
        # misattributed to co-tenant load).
        out.count()
    for which, col, alias in plain:
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
    if need_vars:
        out = out.withColumn(
            "__vars", F.from_json("vars_json", "map<string,array<bigint>>")
        )
    if cls_alias is not None:
        # the variable whose id list contains the match's last row
        ent = F.filter(
            F.map_entries(F.col("__vars")),
            lambda e: F.array_contains(e["value"], F.col("last_event_id")),
        )
        out = out.withColumn(cls_alias, F.element_at(ent, 1)["key"])
    subsets = _parse_subsets(m.group("subset"))
    for var, specs in var_aggs.items():
        if var in subsets:
            # union variable: concatenate the member id lists (order-
            # insensitive aggregates only — FIRST/LAST positions are
            # per-member and would be meaningless on the concat)
            bad = [a for fn, _, a, _ in specs if fn in ("FIRST", "LAST")]
            if bad:
                raise ValueError(
                    f"FIRST/LAST unsupported on SUBSET variable {var!r}: {bad}"
                )
            empty = F.array().cast("array<bigint>")
            eids = F.flatten(
                F.array(
                    *[
                        F.coalesce(
                            F.element_at(F.col("__vars"), F.lit(mv)), empty
                        )
                        for mv in subsets[var]
                    ]
                )
            )
        else:
            eids = F.coalesce(
                F.element_at(F.col("__vars"), F.lit(var)),
                F.lit(None).cast("array<bigint>"),
            )
        ex = out.select(
            F.col(part).alias("__k"),
            F.col("first_event_id").alias("__f"),
            F.col("last_event_id").alias("__l"),
            F.posexplode(eids).alias("__pos", "__eid"),
        )
        cols = sorted({c for _, c, _, _ in specs})
        side = df.select(
            F.col(part).alias("__k"),
            F.col("event_id").alias("__eid"),
            *[F.col(c).alias(f"__c_{c}") for c in cols],
        )
        joined = ex.join(side, ["__k", "__eid"])
        aggs = []
        for fn, c, alias, off in specs:
            col = F.col(f"__c_{c}")
            if fn in ("FIRST", "LAST") and off:
                # logical offset navigation (FIRST(A.c, n) = n rows after
                # the variable's first; LAST(A.c, n) = n before its last;
                # out of range → NULL): collect (pos, val), sort by match
                # position, index — state bounded by match length
                lst = F.sort_array(
                    F.collect_list(
                        F.struct(F.col("__pos").alias("p"), col.alias("v"))
                    )
                )
                idx = (
                    F.lit(off + 1)
                    if fn == "FIRST"
                    else F.size(lst) - F.lit(off)
                )
                expr = F.when(
                    F.size(lst) > off, F.element_at(lst, idx)["v"]
                )
            else:
                expr = {
                    "SUM": F.sum(col),
                    "COUNT": F.count(col),
                    "AVG": F.avg(col),
                    "MIN": F.min(col),
                    "MAX": F.max(col),
                    # boundary rows by position in MATCH order (posexplode),
                    # not by raw event-id
                    "FIRST": F.min_by(col, F.col("__pos")),
                    "LAST": F.max_by(col, F.col("__pos")),
                }[fn]
            aggs.append(expr.alias(alias))
        aggd = joined.groupBy("__k", "__f", "__l").agg(*aggs)
        out = out.join(
            aggd,
            (out[part] == aggd["__k"])
            & (out["first_event_id"] == aggd["__f"])
            & (out["last_event_id"] == aggd["__l"]),
            "left",
        ).drop("__k", "__f", "__l")
        for fn, _, alias, _ in specs:
            if fn == "COUNT":
                # SQL COUNT over an empty variable (e.g. A? unmatched) is
                # 0, not NULL — the left join leaves NULL when no row of
                # the match mapped to the variable
                out = out.withColumn(
                    alias, F.coalesce(F.col(alias), F.lit(0))
                )
    if mn_alias is not None:
        # last_event_id tiebreak: overlapping matches can share a start
        # (eager trailing loops, SKIP TO FIRST/LAST) — numbering must stay
        # deterministic for the oracle hash
        w = Window.partitionBy(part).orderBy(
            "first_ts_us", "first_event_id", "last_ts_us", "last_event_id"
        )
        out = out.withColumn(mn_alias, F.row_number().over(w))
    if mrt_alias is not None:
        # MATCH_ROWTIME(): the match's event-time attribute — its LAST
        # row's rowtime, in this surface's epoch-micros convention (same
        # unit as first_ts_us/last_ts_us), so a downstream window
        # aggregate can tumble over MATCH_RECOGNIZE output exactly as
        # Flink chains windows after MATCH_ROWTIME()
        out = out.withColumn(mrt_alias, F.col("last_ts_us"))
    if mpt_alias is not None:
        # MATCH_PROCTIME(): processing-time marker — inherently
        # nondeterministic (wall clock), same contract as the engine's
        # PROCTIME() rewrite; excluded from value-hash oracles
        out = out.withColumn(mpt_alias, F.current_timestamp())
    # vars_json also appears when DEFINE aggregates forced event retention
    # without any var-anchored measure — always scrub the internals
    return out.drop("__vars", "vars_json")
