"""Session-scope registry for operator-internal staging caches.

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

At 100 TB these frames are staging-table writes, not executor caches;
the registry is the local-mode analog of dropping the staging table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_STAGED: list[DataFrame] = []


def stage(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for later :func:`release_staging`."""
    df.persist()
    _STAGED.append(df)
    return df


def release_staging(blocking: bool = False) -> int:
    """Unpersist every registered staging frame; returns how many."""
    n = 0
    while _STAGED:
        _STAGED.pop().unpersist(blocking)
        n += 1
    return n
