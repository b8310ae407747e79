"""PySpark worker daemon with the heavy scientific stack preloaded.

Python workers are forked from the daemon process; anything imported
HERE is inherited copy-on-write, so each of N cold workers skips its own
numpy/pandas/pyarrow import (~0.5-1 s apiece — measured as a multi-second
first-Arrow-stage tax at local[32]). Selected via
``spark.python.daemon.module`` (session.get_spark); import failures fall
through so a stripped-down worker environment still starts.

Everything else defers to the stock daemon loop.
"""

try:  # pragma: no cover - import side effects only
    # Only the scientific stack — importing rerankers_spark here would
    # serialize its full (pyspark.sql-heavy) import into EVERY daemon
    # start, and Spark spins one daemon per (python exec, env) pool, so
    # a heavy preload showed up as multi-second 1-task stages whenever a
    # new pool (e.g. the pickled-RDD pool vs the Arrow-UDF pool) came up.
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401
    import pyarrow.pandas_compat  # noqa: F401
except Exception:  # the daemon must come up even if preloads fail
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
