"""Environment-sensitivity gate: every DRIVER-GATED oracle must produce
identical results under DuckDB's ``integer_division`` toggle — the
division-semantics axis that held the r6-r8 DSIR row red — except the
engine-semantics probe, whose entire purpose is to CHANGE under it.

DuckDB-only (no Spark): cheap enough to run in the suite. The full
394-oracle sweep is ``python tools/oracle_sensitivity.py``."""

from __future__ import annotations


def test_gated_oracles_integer_division_insensitive():
    from flink_1_12_2_spark.registry import GATE_ORDER

    from tools.oracle_sensitivity import run_sweep

    sensitive = set(run_sweep("/root/testdata/sf0.01", set(GATE_ORDER)))
    # the probe is the detector — it MUST react to the toggle
    assert "env_probe_engine_semantics" in sensitive
    sensitive.discard("env_probe_engine_semantics")
    assert not sensitive, (
        f"driver-gated oracles react to integer_division: {sorted(sensitive)}"
        " — apply CAST(... AS DOUBLE) / exact floor-div per "
        "memory:oracle-environment-rules before the driver sees them"
    )
