"""Interactive SQL shell over the engine's SQL front door.

Reference parity: flink-table/flink-sql-client —
``SqlClient.java`` (entry, ``-f`` script / ``-e`` statement modes) and
``cli/CliClient.java`` (the ``;``-terminated statement loop, error
reporting that keeps the session alive, ``QUIT;``/``EXIT;``). The heavy
lifting — DDL, catalog statements, INSERT routing, the Flink→Spark
rewrite, MATCH_RECOGNIZE — is ``EngineSession.sql`` (session.py), exactly
as SqlClient delegates to the TableEnvironment's ``executeSql``.

Usage:
    python tools/sql_shell.py                      # interactive REPL
    python tools/sql_shell.py -e "SHOW TABLES;"    # one-shot statement(s)
    python tools/sql_shell.py -f script.sql        # run a ;-separated file
    ... [--sf-dir /root/testdata/sf0.01]           # pre-register testdata

Statements end with ``;`` and may span lines. Results print as an ASCII
table capped at ``_MAX_ROWS`` rows (the reference's tableau mode).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

_MAX_ROWS = 100
_PROMPT = "flink-sql> "
_CONT = "         > "


def split_statements(text: str) -> list[str]:
    """Split a script on ``;`` outside single/double quotes (the CliClient
    statement splitter — quotes may contain semicolons)."""
    out, buf, quote = [], [], None
    for ch in text:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
        elif ch in ("'", '"'):
            quote = ch
            buf.append(ch)
        elif ch == ";":
            stmt = "".join(buf).strip()
            if stmt:
                out.append(stmt)
            buf = []
        else:
            buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        out.append(tail)
    return out


def render(df, max_rows: int = _MAX_ROWS) -> str:
    """ASCII tableau (SqlClient's batch result mode): header + rows,
    column widths fit to content, capped at ``max_rows``."""
    cols = df.columns
    rows = df.take(max_rows + 1)
    clipped = len(rows) > max_rows
    rows = rows[:max_rows]
    cells = [[("NULL" if v is None else str(v)) for v in r] for r in rows]
    widths = [
        max(len(c), *(len(row[i]) for row in cells)) if cells else len(c)
        for i, c in enumerate(cols)
    ]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    head = "|" + "|".join(f" {c:<{w}} " for c, w in zip(cols, widths)) + "|"
    body = [
        "|" + "|".join(f" {v:<{w}} " for v, w in zip(row, widths)) + "|"
        for row in cells
    ]
    lines = [sep, head, sep, *body, sep]
    lines.append(
        f"{len(rows)} row(s)" + (f" (showing first {max_rows})" if clipped
                                 else "")
    )
    return "\n".join(lines)


def run_statement(engine, stmt: str, out=sys.stdout) -> bool:
    """Execute one statement; print its tableau or the error (the session
    survives errors, like CliClient). Returns False when the statement is
    QUIT/EXIT."""
    if stmt.strip().upper() in ("QUIT", "EXIT"):
        return False
    try:
        df = engine.sql(stmt)
        if df is not None:
            print(render(df), file=out)
    except Exception as e:  # noqa: BLE001 — REPL: report, don't die
        print(f"[ERROR] {type(e).__name__}: {e}", file=out)
    return True


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="engine SQL shell")
    ap.add_argument("-e", "--execute", help="run statement(s) and exit")
    ap.add_argument("-f", "--file", help="run a ;-separated SQL script")
    ap.add_argument(
        "--sf-dir",
        default=None,
        help="pre-register the driver testdata tables from this directory",
    )
    args = ap.parse_args(argv)

    from flink_1_12_2_spark.session import EngineSession

    engine = EngineSession()
    engine.spark.sparkContext.setLogLevel("ERROR")
    if args.sf_dir:
        engine.register_testdata(args.sf_dir)

    if args.execute or args.file:
        text = args.execute or Path(args.file).read_text()
        for stmt in split_statements(text):
            if not run_statement(engine, stmt):
                break
        return 0

    print("engine SQL shell — statements end with ';', QUIT; exits")
    buf: list[str] = []
    while True:
        try:
            line = input(_CONT if buf else _PROMPT)
        except EOFError:
            break
        buf.append(line)
        joined = "\n".join(buf)
        if ";" in line:
            buf = []
            alive = True
            for stmt in split_statements(joined):
                alive = run_statement(engine, stmt)
                if not alive:
                    break
            if not alive:
                break
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
