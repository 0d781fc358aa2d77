"""Scoped DataFrame persists for within-one-query reuse.

DataFrame.persist registers the plan in Spark's CacheManager and is
NEVER released until an explicit unpersist — unlike RDD caches, the
driver's GC does not clean it up. Operators that persist an
intermediate for within-one-query reuse (the dedup signature/shingle
frames, the pagerank edge table) therefore LEAK one cached plan per
query build: a long analytics session (the 90-entry bench runs ~450
query builds) accumulates gigabytes of dead cached blocks, and the
eviction churn slows every later query (r15: measured as diffuse
10-70% slowdowns on UNRELATED entries late in a bench session).

`persist_scoped(df, key)` keeps AT MOST ONE live cache per key:
persisting a new frame unpersists the previous one (non-blocking).
The previous frame stays CORRECT if some caller still holds it — it
just recomputes — so this is pure cache hygiene, not a semantics
change. It is also NOT cross-run result caching: each call persists
the freshly built frame; nothing survives or is keyed on inputs.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_LIVE: dict[str, DataFrame] = {}


def persist_scoped(df: DataFrame, key: str,
                   level: StorageLevel = StorageLevel.MEMORY_AND_DISK
                   ) -> DataFrame:
    prev = _LIVE.pop(key, None)
    if prev is not None:
        try:
            prev.unpersist(False)
        except Exception:
            pass  # session gone / already unpersisted: nothing to free
    out = df.persist(level)
    _LIVE[key] = out
    return out
