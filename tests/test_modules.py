"""Module system parity (Module.java / CoreModule.java:30 /
HiveModule.java:40 / ModuleManager.java; TableEnvironment.java:384-392,725)
— load/unload/list/use, CoreModule-first default, resolution order."""

from __future__ import annotations

import pytest

from flink_1_12_2_spark.modules import (
    BUILT_IN_FUNC_BLACKLIST,
    CoreModule,
    HiveModule,
    Module,
    ModuleManager,
)
from flink_1_12_2_spark.session import EngineSession, get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


class _Fake(Module):
    def __init__(self, defs: dict):
        self._defs = defs

    def list_functions(self):
        return set(self._defs)

    def get_function_definition(self, name):
        for k, v in self._defs.items():
            if k.lower() == name.lower():
                return v
        return None


def test_core_module_loaded_first_by_default():
    mm = ModuleManager()
    assert mm.list_modules() == ["core"]
    # a core built-in resolves out of the box
    assert mm.get_function_definition("SPLIT_INDEX") is not None


def test_load_unload_validation():
    mm = ModuleManager()
    with pytest.raises(ValueError, match="already exists"):
        mm.load_module("core", CoreModule.INSTANCE)
    with pytest.raises(ValueError, match="No module with name x exists"):
        mm.unload_module("x")
    with pytest.raises(ValueError, match="cannot be null or empty"):
        mm.load_module("  ", CoreModule.INSTANCE)
    mm.load_module("m1", _Fake({"f": lambda: 1}))
    assert mm.list_modules() == ["core", "m1"]
    mm.unload_module("core")  # even the core module may be unloaded
    assert mm.list_modules() == ["m1"]
    assert mm.get_function_definition("SPLIT_INDEX") is None


def test_resolution_order_is_loaded_order():
    """ModuleManager.getFunctionDefinition: modules are consulted in
    loaded order; the FIRST module listing the name wins."""
    mm = ModuleManager()
    a = _Fake({"dup": lambda: "a", "only_a": lambda: "A"})
    b = _Fake({"DUP": lambda: "b"})
    mm.load_module("a", a)
    mm.load_module("b", b)
    assert mm.get_function_definition("dup")() == "a"
    # core first: a core name shadows the same name in later modules
    core_shadow = _Fake({"SPLIT_INDEX": lambda *args: "shadowed"})
    mm2 = ModuleManager()
    mm2.load_module("shadow", core_shadow)
    got = mm2.get_function_definition("split_index")
    # CoreModule provides SPLIT_INDEX and was loaded first → not shadowed
    assert got is not core_shadow._defs["SPLIT_INDEX"]


def test_use_modules_reorders_resolution():
    mm = ModuleManager()
    a = _Fake({"dup": lambda: "a"})
    b = _Fake({"dup": lambda: "b"})
    mm.load_module("a", a)
    mm.load_module("b", b)
    assert mm.get_function_definition("dup")() == "a"
    mm.use_modules("b", "a", "core")
    assert mm.list_modules() == ["b", "a", "core"]
    assert mm.get_function_definition("dup")() == "b"
    # a module left out of use_modules stays LOADED but stops resolving
    mm.use_modules("core")
    assert mm.get_function_definition("dup") is None
    assert dict(mm.list_full_modules()) == {
        "core": True, "a": False, "b": False,
    }
    with pytest.raises(ValueError, match="No module with name z"):
        mm.use_modules("z")
    with pytest.raises(ValueError, match="more than once"):
        mm.use_modules("core", "core")


def test_hive_module_lists_builtins_minus_blacklist(spark):
    hm = HiveModule(spark)
    fns = hm.list_functions()
    assert "concat" in fns and "upper" in fns
    assert not (fns & BUILT_IN_FUNC_BLACKLIST)
    # blacklisted names never resolve from the hive module
    assert hm.get_function_definition("row_number") is None
    # a served definition builds a working Column
    df = spark.range(1).select(
        hm.get_function_definition("upper")("id").alias("u")
    )
    assert df.collect()[0]["u"] == "0"


def test_session_module_surface_and_sql(spark):
    eng = EngineSession(spark)
    assert eng.list_modules() == ["core"]
    rows = eng.sql("SHOW MODULES").collect()
    assert [r["module_name"] for r in rows] == ["core"]
    eng.sql("LOAD MODULE hive")
    assert eng.list_modules() == ["core", "hive"]
    # hive loaded after core → core still wins for names both define
    eng.use_modules("hive", "core")
    assert [r["module_name"] for r in eng.sql("SHOW MODULES").collect()] == [
        "hive", "core",
    ]
    full = {
        (r["module_name"], r["used"])
        for r in eng.sql("SHOW FULL MODULES").collect()
    }
    assert full == {("core", True), ("hive", True)}
    eng.sql("USE MODULES core")
    assert eng.list_modules() == ["core"]
    full = dict(
        (r["module_name"], r["used"])
        for r in eng.sql("SHOW FULL MODULES").collect()
    )
    assert full == {"core": True, "hive": False}
    eng.sql("UNLOAD MODULE hive")
    assert [
        r["module_name"] for r in eng.sql("SHOW FULL MODULES").collect()
    ] == ["core"]
    with pytest.raises(ValueError, match="No module with name hive"):
        eng.sql("UNLOAD MODULE hive")
    with pytest.raises(ValueError, match="module factory"):
        eng.sql("LOAD MODULE bogus")


def test_session_call_function_resolves_through_chain(spark):
    eng = EngineSession(spark)
    # core SPLIT_INDEX semantics (0-based index)
    import pyspark.sql.functions as F

    got = spark.range(1).select(
        eng.call_function(
            "SPLIT_INDEX", F.lit("a,b,c"), F.lit(","), F.lit(1)
        ).alias("v")
    ).collect()[0]["v"]
    assert got == "b"
    with pytest.raises(ValueError, match="No match found"):
        eng.call_function("NOT_A_FUNCTION")
    # hive module adds names core lacks
    eng.sql("LOAD MODULE hive")
    assert eng.modules.get_function_definition("crc32") is not None


def test_show_functions_reflects_module_chain(spark):
    eng = EngineSession(spark)
    base = {r[0] for r in eng.sql("SHOW FUNCTIONS").collect()}
    assert "SPLIT_INDEX" in base
    assert "crc32" not in base
    eng.sql("LOAD MODULE hive")
    withhive = {r[0] for r in eng.sql("SHOW FUNCTIONS").collect()}
    assert "crc32" in withhive
