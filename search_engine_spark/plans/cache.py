"""S7 — query-result cache (the reference's Redis response cache).

Reference behavior (services/impl/SearchServiceImpl.java:281-303,
:313-317; services/utils/Serializer.java:6-17): results are cached
under ``HSET "query: "+(site|all)  query -> serialize(response)``
with the FULL pre-pagination data list; a hit re-applies
offset/limit to the cached list (:64-69); the cache is cleared on
shutdown (``@PreDestroy`` :313-317) and when a reindex wipes the
tables (services/utils/DataCleaner.java:62-69 flushes Redis).

Spark rebuild: a search result is tiny (top-``depth`` ranked rows),
so the natural analog is a bounded driver-side LRU of Arrow-sized
pandas frames keyed by ``(site-scope, normalized query)`` — the same
key shape as the Redis hash — with the pagination window re-applied
on hit, never re-running the cluster job.  Entries carry the index's
build fingerprint (the manifest's ``build_id`` set): any rebuild,
append or vacuum changes the fingerprint and stale entries miss, the
declarative analog of DataCleaner's flush.  ``clear()`` is the
``@PreDestroy`` analog.

Scale note: this cache is per-driver (per "search endpoint" process),
exactly like the reference's one Redis per app instance.  It stores
only final top-k rows — never corpus-sized data — so memory is
bounded by ``max_entries × depth`` rows.
"""

from __future__ import annotations

from collections import OrderedDict
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.plans.build import read_manifest


def index_fingerprint(spark: SparkSession, out_dir: str) -> str:
    """Identity of the current index contents: sorted distinct
    manifest ``build_id``s (every build/append/vacuum appends or
    rewrites manifest rows).  Readable on any Hadoop filesystem."""
    mf = read_manifest(spark, out_dir)
    if mf is None:
        return "<no-manifest>"
    rows = (
        mf.select("build_id").distinct().orderBy("build_id").collect()
    )
    return ",".join(r["build_id"] for r in rows)


def cache_key(query: str, sites: list[str] | None) -> tuple[str, str]:
    """Reference key shape: hash name ``"query: "+(site|all)``, field
    = the raw query string (SearchServiceImpl.java:292-296)."""
    scope = "|".join(sorted(sites)) if sites else "all"
    return (scope, query.strip())


@dataclass
class _Entry:
    frame: pd.DataFrame          # full top-`depth` rows, rn ascending
    schema: object               # pyspark StructType of the result
    fingerprint: str
    total: int | None = None     # cached search_total (optional)


class QueryResultCache:
    """Bounded LRU of pre-pagination search results.

    >>> cache = QueryResultCache(spark, depth=200)
    >>> df = cache.search(lambda off, lim: search(idx, q, offset=off,
    ...                   limit=lim), q, sites=None, offset=0, limit=20,
    ...                   fingerprint=fp)

    The callable runs the real query path with the cache's depth on a
    miss; hits slice the stored frame (reference hit path :64-69).
    """

    def __init__(
        self,
        spark: SparkSession,
        depth: int = 500,
        max_entries: int = 256,
    ):
        if depth < 1:
            raise ValueError("depth must be >= 1")
        self.spark = spark
        self.depth = depth
        self.max_entries = max_entries
        self._entries: OrderedDict[tuple[str, str], _Entry] = (
            OrderedDict()
        )
        self.hits = 0
        self.misses = 0

    # -- core -------------------------------------------------------

    def search(
        self,
        run_query,
        query: str,
        sites: list[str] | None = None,
        offset: int = 0,
        limit: int = 20,
        fingerprint: str = "",
    ) -> DataFrame:
        """``run_query(offset, limit) -> DataFrame`` is the real path
        (plans.search.search / plans.wand.search_compact partial).

        Pages that fit inside the cached depth are served from the
        cache; deeper requests fall through to the real path (and are
        not cached — same as the reference, whose cache stores the
        response for the *bounded* data list it computed)."""
        key = cache_key(query, sites)
        want_end = offset + limit

        entry = self._entries.get(key)
        if entry is not None and entry.fingerprint != fingerprint:
            # reindex happened: reference flushes Redis via
            # DataCleaner; here the stale entry just drops out
            del self._entries[key]
            entry = None

        if entry is not None and want_end <= self.depth:
            self._entries.move_to_end(key)
            self.hits += 1
            return self._slice(entry, offset, limit)

        if want_end > self.depth:
            # deeper than the cache stores — run exactly what was
            # asked, bypass storage
            self.misses += 1
            return run_query(offset, limit)

        self.misses += 1
        full = run_query(0, self.depth)
        pdf = full.toPandas()
        entry = _Entry(
            frame=pdf, schema=full.schema, fingerprint=fingerprint
        )
        self._entries[key] = entry
        self._entries.move_to_end(key)
        while len(self._entries) > self.max_entries:
            self._entries.popitem(last=False)
        return self._slice(entry, offset, limit)

    def _slice(self, entry: _Entry, offset: int, limit: int) -> DataFrame:
        pdf = entry.frame
        if "rn" in pdf.columns:
            out = pdf[(pdf["rn"] > offset) & (pdf["rn"] <= offset + limit)]
        else:
            out = pdf.iloc[offset:offset + limit]
        return self.spark.createDataFrame(
            out.reset_index(drop=True), schema=entry.schema
        )

    # -- lifecycle --------------------------------------------------

    def clear(self) -> None:
        """Reference ``@PreDestroy``/DataCleaner analog."""
        self._entries.clear()

    def __len__(self) -> int:
        return len(self._entries)


def cached_search_compact(
    cache: QueryResultCache,
    cidx,
    query: str,
    sites: list[str] | None = None,
    offset: int = 0,
    limit: int = 20,
    fingerprint: str = "",
    **kw,
) -> DataFrame:
    """Convenience binding of the cache to the compacted-index query
    path (plans.wand.search_compact)."""
    from search_engine_spark.plans.wand import search_compact

    def run(off: int, lim: int) -> DataFrame:
        return search_compact(
            cidx, query, sites=sites, offset=off, limit=lim, **kw
        )

    return cache.search(
        run, query, sites=sites, offset=offset, limit=limit,
        fingerprint=fingerprint,
    )
