"""Gate-rotation readiness report across the whole registry.

The rotation discipline (memory: oracle-environment-rules) says a row
may enter GATE_ORDER only if it cannot reopen a known driver-divergence
class. This tool mechanizes the checklist's DuckDB-only half:

1. oracle output types ⊆ the gate-portable set (tools/oracle_types.py's
   allowlist — the int128/DECIMAL class, r9 judge diagnosis);
2. oracle insensitive to ``SET integer_division`` (the r8 class);
3. already gated or not (so the report doubles as an audit of the
   current window).

The Spark-side dtype sweep stays in tests/test_plans.py (needs a
session). Output: one line per READY non-gated row, then a summary.

Usage: python tools/rotation_ready.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from tools.oracle_sensitivity import run_sweep as division_sweep  # noqa: E402
from tools.oracle_types import (  # noqa: E402
    GATE_ALLOWED_TYPE_IDS,
    connect,
    oracle_types,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entry_mod

    from flink_1_12_2_spark.registry import GATE_ORDER

    oracles = entry_mod.oracle_sql()
    con = connect(sf_dir)
    exact_ok: set[str] = set()      # int/string/bool/date/ts only
    double_rows: set[str] = set()   # carries DOUBLE/FLOAT output columns
    exotic: set[str] = set()        # anything outside the gate allowlist
    for name, sql in oracles.items():
        if name.startswith("env_probe_"):
            continue
        try:
            cols = oracle_types(con, sql)
        except Exception:  # noqa: BLE001
            exotic.add(name)
            continue
        tids = {t.lower() for _, t in cols}
        if not tids <= GATE_ALLOWED_TYPE_IDS:
            exotic.add(name)
        elif tids & {"double", "float"}:
            double_rows.add(name)
        else:
            exact_ok.add(name)
    sensitive = set(division_sweep(sf_dir, exact_ok))
    gated = set(GATE_ORDER)
    ready = sorted(exact_ok - sensitive - gated)
    print(f"\n{len(ready)} non-gated rotation-READY rows (exact "
          "int/string output + division-insensitive):")
    for name in ready:
        print(f"  {name}")
    print(f"\n{len(double_rows - gated)} non-gated DOUBLE-carrying rows "
          "(rotation needs an exact-grid/dyadic proof per column, the "
          "q98 standard):")
    for name in sorted(double_rows - gated)[:40]:
        print(f"  {name}")
    print(f"\n{len(exotic)} rows with exotic/unresolvable oracle types "
          "(must be fixed before any rotation):")
    for name in sorted(exotic):
        print(f"  {name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
