"""Per-thread registry for operator-internal staging caches.

Several operators (shingle/minhash/simhash staging in ``dedup``, the
postings table in ``tfidf``, partition assignments in ``clustering``,
the split-ledger in ``curation``) persist an intermediate frame that
feeds multiple consumers of ONE returned plan.  Because the caller
collects the returned DataFrame *after* the operator function returns,
the operator itself cannot unpersist — doing so before the terminal
action would silently recompute the staging subtree per consumer.

Caller contract (documented on each staging operator): after the
terminal action on the returned DataFrame, call ``release_staging()``
(or ``spark.catalog.clearCache()``) to drop the scratch caches.  Both
``bench.py`` and ``scripts/t2_rehearsal.py`` do this between queries;
a long-lived interactive session that never releases simply accrues
cache entries until LRU eviction — safe, but not free.

Scope: the registry is THREAD-LOCAL.  Sessions that interleave queries
from multiple threads (the standard Spark concurrency model — one
submitting thread per concurrent query) each see a private registry,
so one thread's ``release_staging()`` can never drop a staged subtree
another thread's in-flight query still needs — the hazard a process-
global registry had.  The corollary contract: build and release on the
SAME thread.  A plan staged on thread A and released from thread B is
not reachable from B's registry (it falls back to LRU eviction or a
session-wide ``clearCache()``), which is the safe failure direction —
a leak until eviction, never a premature unpersist.

At 100 TB these frames are staging-table writes, not executor caches;
the registry is the local-mode analog of dropping the staging table.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCAL = threading.local()


def _registry() -> list[DataFrame]:
    reg = getattr(_LOCAL, "staged", None)
    if reg is None:
        reg = _LOCAL.staged = []
    return reg


def stage(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it (on this thread's registry) for a
    later :func:`release_staging`."""
    df.persist()
    _registry().append(df)
    return df


def release_staging(blocking: bool = False) -> int:
    """Unpersist every staging frame registered BY THIS THREAD;
    returns how many."""
    reg = _registry()
    n = 0
    while reg:
        reg.pop().unpersist(blocking)
        n += 1
    return n
