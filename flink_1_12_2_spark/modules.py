"""Pluggable function-module system — Flink's module API on the engine's
function registry.

Flink parity: ``Module`` (flink-table/flink-table-common/src/main/java/org/
apache/flink/table/module/Module.java — listFunctions +
getFunctionDefinition), ``CoreModule`` (CoreModule.java:30 — the built-in
definitions), ``HiveModule`` (flink-connectors/flink-connector-hive/.../
module/hive/HiveModule.java:40 — Hive built-ins minus a blacklist of names
the planner must keep), and ``ModuleManager`` (flink-table/flink-table-api-
java/.../module/ModuleManager.java — insertion-ordered LinkedHashMap
seeded with CoreModule; function resolution walks modules IN LOADED ORDER
and the first module listing the name wins).

TableEnvironment surface: ``loadModule``/``unloadModule``
(TableEnvironment.java:384-392) and ``listModules`` (:725). ``useModules``
(declared-order re-selection) is the immediately-following evolution of
this API; it is included so resolution order can be changed without
unload/reload churn.

Everything here is driver-side metadata — module dictionaries are a few
hundred names; no distributed state, so scale is a non-issue.
"""

from __future__ import annotations

from typing import Callable, Optional


class Module:
    """Module.java: a named set of function definitions."""

    def list_functions(self) -> set[str]:
        raise NotImplementedError

    def get_function_definition(self, name: str) -> Optional[Callable]:
        raise NotImplementedError


class CoreModule(Module):
    """CoreModule.java:30 — the engine's built-in function surface
    (functions/registry.FLINK_FUNCTIONS, the BuiltInFunctionDefinitions
    port)."""

    INSTANCE: "CoreModule"

    def list_functions(self) -> set[str]:
        from flink_1_12_2_spark.functions.registry import FLINK_FUNCTIONS

        return set(FLINK_FUNCTIONS)

    def get_function_definition(self, name: str) -> Optional[Callable]:
        from flink_1_12_2_spark.functions.registry import FLINK_FUNCTIONS

        return FLINK_FUNCTIONS.get(name.upper())


CoreModule.INSTANCE = CoreModule()

# HiveModule.java:42 — names Hive also defines but whose planner semantics
# must stay with the core definitions (rank/lead/first_value/window aux
# functions); the module never serves these.
BUILT_IN_FUNC_BLACKLIST = frozenset(
    {
        "count", "current_date", "current_timestamp", "dense_rank",
        "first_value", "lag", "last_value", "lead", "rank", "row_number",
        "hop", "hop_end", "hop_proctime", "hop_rowtime", "hop_start",
        "session", "session_end", "session_proctime", "session_rowtime",
        "session_start", "tumble", "tumble_end", "tumble_proctime",
        "tumble_rowtime", "tumble_start",
    }
)


class HiveModule(Module):
    """HiveModule.java:40 — expose Hive built-ins as module functions.

    Spark-first analogue: Spark's own function registry implements the
    Hive built-in surface (Spark SQL is Hive-compatible by design), so
    the module lists the session's registered built-in names minus the
    blacklist, and a definition is a Column-builder dispatching through
    ``F.call_function`` — JVM-side, no Python at row time. Like the
    reference (which needs a HiveShim), construction requires the
    capability: a SparkSession; pass one with hive support enabled to
    surface metastore-registered permanent functions too."""

    def __init__(self, spark):
        if spark is None:
            raise ValueError(
                "HiveModule requires a SparkSession (the hive-capability "
                "analogue of the reference's HiveShim)"
            )
        self._spark = spark
        self._names: set[str] | None = None

    def list_functions(self) -> set[str]:
        if self._names is None:
            rows = self._spark.sql("SHOW SYSTEM FUNCTIONS").collect()
            self._names = {
                r[0].lower() for r in rows
            } - BUILT_IN_FUNC_BLACKLIST
        return set(self._names)

    def get_function_definition(self, name: str) -> Optional[Callable]:
        lowered = name.lower()
        if lowered in BUILT_IN_FUNC_BLACKLIST:
            return None  # HiveModule.java:100 — blacklisted → empty
        if lowered not in self.list_functions():
            return None
        import pyspark.sql.functions as F

        def call(*args):
            return F.call_function(lowered, *args)

        call.__name__ = f"hive_{lowered}"
        return call


MODULE_TYPE_CORE = "core"  # CoreModuleDescriptorValidator.MODULE_TYPE_CORE
MODULE_TYPE_HIVE = "hive"


class ModuleManager:
    """ModuleManager.java — insertion-ordered module registry seeded with
    CoreModule under the name 'core'; resolution walks loaded order."""

    def __init__(self):
        # dict preserves insertion order = the LinkedHashMap contract;
        # _used is the (ordered) resolution chain — load appends to both,
        # use_modules re-selects/re-orders _used without unloading
        self._loaded: dict[str, Module] = {
            MODULE_TYPE_CORE: CoreModule.INSTANCE
        }
        self._used: list[str] = [MODULE_TYPE_CORE]

    def load_module(self, name: str, module: Module) -> None:
        if not name or not name.strip():
            raise ValueError("name cannot be null or empty string")
        if module is None:
            raise ValueError("module cannot be null")
        if name in self._loaded:
            raise ValueError(f"A module with name {name} already exists")
        self._loaded[name] = module
        self._used.append(name)

    def unload_module(self, name: str) -> None:
        if name not in self._loaded:
            raise ValueError(f"No module with name {name} exists")
        del self._loaded[name]
        if name in self._used:
            self._used.remove(name)

    def list_modules(self) -> list[str]:
        """Names of the USED modules in resolution order
        (TableEnvironment.listModules:725)."""
        return list(self._used)

    def list_full_modules(self) -> list[tuple[str, bool]]:
        """Every loaded module with its used flag (the SHOW FULL MODULES
        view of the same state)."""
        return [(n, n in self._used) for n in self._loaded]

    def use_modules(self, *names: str) -> None:
        """Re-select and re-order the resolution chain. Every name must
        be loaded and appear once; loaded-but-unused modules stay
        loaded and stop resolving until named again."""
        seen: list[str] = []
        for n in names:
            if n not in self._loaded:
                raise ValueError(f"No module with name {n} exists")
            if n in seen:
                raise ValueError(f"Module {n} appears more than once")
            seen.append(n)
        self._used = seen

    def list_functions(self) -> set[str]:
        out: set[str] = set()
        for n in self._used:
            out |= self._loaded[n].list_functions()
        return out

    def get_function_definition(self, name: str) -> Optional[Callable]:
        """First used module (in order) listing the name wins —
        ModuleManager.java getFunctionDefinition's findFirst."""
        for n in self._used:
            mod = self._loaded[n]
            if any(
                f.lower() == name.lower() for f in mod.list_functions()
            ):
                return mod.get_function_definition(name)
        return None
