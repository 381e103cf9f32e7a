"""Oracle-side result-type gate (r9 judge diagnosis, verdict item 2).

The four r9 driver-red rows were all one class: the ORACLE emitted a
HUGEINT (int128) output column — DuckDB ``SUM(BIGINT)`` widens to
int128, Spark stays int64, and the driver harness canonicalizes the two
differently (the local replica stringifies Python ints and cannot see
it). The r9 rotation-readiness sweep checked only the SPARK side's
dtypes, so the class slipped through; this test closes the oracle side
for EVERY registered oracle, not just the gated window, so gate
rotation can never reintroduce it.

DuckDB-only via the relation API (types resolve without executing), so
the full ~400-oracle sweep runs in seconds.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def _sweep():
    from tools.oracle_types import run_sweep

    return run_sweep("/root/testdata/sf0.001")


def test_no_oracle_emits_hugeint_or_decimal(_sweep):
    assert not _sweep, (
        f"oracles with int128/DECIMAL output columns: {sorted(_sweep)} — "
        "CAST the aggregate to BIGINT (or add the column to "
        "registry._ORACLE_BIGINT_RECAST) per memory:oracle-environment-rules; "
        "DuckDB SUM(BIGINT)->HUGEINT is the canonical trap"
    )


def test_gated_oracles_stay_inside_portable_type_surface():
    """Gate rows are held to the tighter allowlist: only types whose
    driver canonicalization the env probes have validated."""
    import __spark_entry__ as entry_mod

    from flink_1_12_2_spark.registry import GATE_ORDER
    from tools.oracle_types import (
        GATE_ALLOWED_TYPE_IDS,
        connect,
        oracle_types,
    )

    oracles = entry_mod.oracle_sql()
    con = connect("/root/testdata/sf0.001")
    bad: dict[str, list[tuple[str, str]]] = {}
    for name in GATE_ORDER:
        if name.startswith("env_probe_") or name not in oracles:
            continue
        offenders = [
            (c, t)
            for c, t in oracle_types(con, oracles[name])
            if t.lower() not in GATE_ALLOWED_TYPE_IDS
        ]
        if offenders:
            bad[name] = offenders
    assert not bad, f"gated oracles emit non-portable types: {bad}"


def test_probe_rows_are_exempt_by_design():
    """The canon probes DELIBERATELY emit exotic types to fingerprint the
    driver — the sweep must keep skipping them, not silently widen."""
    from tools.oracle_types import run_sweep

    hits = run_sweep(
        "/root/testdata/sf0.001", {"env_probe_value_canon"}
    )
    assert not hits  # exempted inside run_sweep, not allowlisted here


def test_oracle_datetime_literals_fit_pandas_ns_window():
    """r11 probe result: the driver's canonicalizer materializes oracle
    datetimes through pandas datetime64[ns], so any DATE/TIMESTAMP
    outside [1677-09-21 00:12:43.145224193, 2262-04-11 23:47:16.854775807]
    crashes the gate row with OutOfBoundsDatetime even when both engines
    agree on the value (memory:oracle-environment-rules rule — oracle
    datetimes must fit pandas ns bounds). Scan every registered oracle's
    datetime LITERALS with pandas itself so the class can never be
    reintroduced by rotation."""
    import re

    import pandas as pd

    import __spark_entry__ as entry_mod

    lit = re.compile(
        r"(?:DATE|TIMESTAMP(?:_NTZ|_LTZ)?)\s*'([^']+)'", re.IGNORECASE
    )
    bad: dict[str, list[str]] = {}
    for name, sql in entry_mod.oracle_sql().items():
        for raw in lit.findall(sql):
            try:
                pd.Timestamp(raw)
            except (pd.errors.OutOfBoundsDatetime, ValueError) as e:
                bad.setdefault(name, []).append(f"{raw!r}: {e}")
    assert not bad, (
        f"oracles with datetime literals outside pandas ns bounds: {bad}"
    )
