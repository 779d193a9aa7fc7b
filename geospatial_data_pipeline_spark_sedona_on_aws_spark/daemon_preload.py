"""PySpark worker daemon with the engine's heavy modules pre-imported.

Measured problem (r14 optimization round, guide §4.5 — heavyweight init
once): a forked Python worker pays ~0.7 s importing numpy + pandas +
pyarrow + the engine kernel modules the first time a UDF lands on it.
Worker demand is bursty — a query with two chained ArrowEvalPython
frontiers needs 2 workers per core at once, growing the pool past the
warm set — so mid-bench queries keep landing on cold workers: measured
same-session A/B, st_buffer_round 1.9-2.4 s warm vs 3.2-6.9 s right
after the pool grew (and the r13 driver-bench "bimodality" of exactly
that query). Pre-importing in the DAEMON (before the fork loop) gives
every forked worker the full stack through copy-on-write pages: the
fork itself stays ~1 ms and no worker ever pays the import again.

Wired via `spark.python.daemon.module` (session.get_spark). Imports are
best-effort: any failure falls back to a plain pyspark.daemon — the
daemon must never die at import time, workers import lazily as before.
"""

try:  # engine + numeric stack: best-effort, COW-shared after fork
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401
    import pyspark.sql.pandas.serializers  # noqa: F401  (worker hot path)

    from .functions import geomb, lanes, lanes_ops, spatial  # noqa: F401
    from .functions import chainrw, grid, spatial_ext, text  # noqa: F401
    from .kernel import geom, geomtypes, packed, transform  # noqa: F401
except Exception:  # pragma: no cover - missing optional dep on a worker host
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
