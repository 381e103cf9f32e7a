"""Round-14 optimization pins: tmpfs capacity guard, driver-memory clamp,
session cache registry, and the no-data micro-batch skip."""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_DIR


# ---- /dev/shm capacity guard (r13 verdict item 1 / ADVICE medium) ----------


def test_fast_local_dir_falls_back_when_shm_small(monkeypatch):
    from flink_1_12_2_spark import session as S

    class FakeSt:
        f_bavail = 100
        f_frsize = 4096  # ~400 KB free — far below any sane headroom

    monkeypatch.delenv("SPARK_GRAFT_SHM_MIN_FREE", raising=False)
    monkeypatch.setattr(S.os, "statvfs", lambda p: FakeSt())
    assert S._fast_local_dir("/dev/shm") is None


def test_fast_local_dir_used_when_headroom(monkeypatch):
    from flink_1_12_2_spark import session as S

    class FakeSt:
        f_bavail = (64 << 30) // 4096  # 64 GiB free
        f_frsize = 4096

    monkeypatch.delenv("SPARK_GRAFT_SHM_MIN_FREE", raising=False)
    monkeypatch.setattr(S.os, "statvfs", lambda p: FakeSt())
    assert S._fast_local_dir("/dev/shm") == "/dev/shm"


def test_fast_local_dir_env_threshold(monkeypatch):
    from flink_1_12_2_spark import session as S

    class FakeSt:
        f_bavail = (1 << 30) // 4096  # 1 GiB free
        f_frsize = 4096

    monkeypatch.setattr(S.os, "statvfs", lambda p: FakeSt())
    monkeypatch.setenv("SPARK_GRAFT_SHM_MIN_FREE", str(512 << 20))
    assert S._fast_local_dir("/dev/shm") == "/dev/shm"
    monkeypatch.setenv("SPARK_GRAFT_SHM_MIN_FREE", str(2 << 30))
    assert S._fast_local_dir("/dev/shm") is None


def test_fast_local_dir_missing_path():
    from flink_1_12_2_spark import session as S

    assert S._fast_local_dir("/no/such/dir/exists") is None


# ---- driver-memory clamp (r13 ADVICE low) ----------------------------------


def test_default_driver_memory_clamp():
    from flink_1_12_2_spark.session import _default_driver_memory as d

    assert d(None) == "6g"  # unknown MemTotal -> historical default
    assert d(128 << 30) == "6g"  # big host: the measured 6g knee
    assert d(16 << 30) == "6g"  # 16 GiB: half is 8 GiB >= 6g
    assert d(8 << 30) == "4096m"  # 8 GiB host: half
    assert d(1 << 30) == "512m"  # tiny host: floor at 512m


# ---- session cache registry (r13 verdict item 4 / ADVICE low) --------------


def test_query_caches_released_after_materialization(spark):
    from flink_1_12_2_spark.cache_registry import release_query_caches
    from flink_1_12_2_spark.registry import QUERIES, load_all_query_modules

    load_all_query_modules()
    spark.catalog.clearCache()
    release_query_caches()  # drop tracking from earlier tests in the session
    jsc = spark.sparkContext._jsc.sc()
    # earlier tests may leave localCheckpoint RDD blocks (not catalog
    # caches) behind — assert against that baseline, not absolute zero
    base_n = jsc.getPersistentRDDs().size()

    df = QUERIES["dedup_ngram_jaccard"].fn(spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    assert jsc.getPersistentRDDs().size() > base_n  # the pipeline did cache

    released = release_query_caches()
    assert released > 0
    assert jsc.getPersistentRDDs().size() == base_n


