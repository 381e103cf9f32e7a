"""PySpark worker daemon with heavyweight libraries preloaded before fork.

Spark's Python workers are forked from ``pyspark.daemon``; the daemon itself
imports only pyspark internals, so EVERY forked worker that runs a pandas
UDF / applyInPandas(WithState) stage imports numpy+pandas+pyarrow from
scratch. Stage metrics on the stateful bench rows showed 1.1-1.5 s
"time to start Python workers" plus 0.6-1.0 s "time to initialize" PER TASK
— ~60 s of cumulative import cost per 32-task stateful stage, every
micro-batch (stateful tasks do not return their worker to the reuse pool,
so the import re-runs per task).

Importing the libraries HERE, in the daemon before ``manager()`` starts
forking, makes every forked worker inherit the loaded modules copy-on-write
for free. Pure start-up-latency optimization: worker behavior is unchanged
(``pyspark.daemon.manager`` runs exactly as stock), and any import failure
falls through silently — the worker would simply import lazily as before.

Wired up by ``session.get_spark`` via ``spark.python.daemon.module`` (a
public Spark conf); the repo root must be importable in the daemon process,
which get_spark guarantees by exporting PYTHONPATH before the JVM starts.
"""

for _mod in ("numpy", "pandas", "pyarrow", "pyarrow.compute"):
    try:
        __import__(_mod)
    except Exception:  # pragma: no cover — preload is best-effort
        pass

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
