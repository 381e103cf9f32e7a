from __future__ import annotations

import sys
from pathlib import Path

import pytest

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from flink_1_12_2_spark.session import get_spark

    # one JVM hosts the full suite (169 parity queries + unit tests):
    # the 1g default heap intermittently OOMs near the end of the sweep
    # (localCheckpoint blocks from the iteration queries accumulate until
    # the ContextCleaner catches up) — give it room
    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
