"""Build-once-per-application broadcast cache.

Several operators ship a build-once side-input to executors (the
segmentation corpus trie, the pipeline's static item-name trie, the
Aho-Corasick blocklist automaton).  Each used to hand-roll the same
applicationId-keyed cache-clear-then-broadcast dance with subtly different
key/clear semantics; this is the single shared implementation.

Semantics: one live entry per NAMESPACE (caller-chosen, e.g. the operator
family) — a new key within a namespace (new application, or a new
parameterization) evicts that namespace's previous entry, so a stale
broadcast from a stopped SparkContext can never be returned and memory
stays bounded no matter how many corpora a long-lived test process
touches, while distinct side-inputs (trie vs automaton) coexist without
thrashing each other."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import SparkSession

_CACHE: dict[str, dict] = {}


def broadcast_once(
    spark: SparkSession, namespace: str, key: tuple, builder: Callable[[], object]
):
    """Return a Broadcast of ``builder()``, built at most once per
    (applicationId, *key) while that key is ``namespace``'s live entry."""
    ns = _CACHE.setdefault(namespace, {})
    app_id = spark.sparkContext.applicationId
    full_key = (app_id, *key)
    if full_key not in ns:
        # Evict the namespace's previous entry EXPLICITLY: dropping the
        # Python reference alone leaves executor-side broadcast blocks
        # alive until driver GC happens to run the ContextCleaner —
        # unbounded in practice for a long-lived process cycling corpora.
        # Only unpersist broadcasts of the LIVE application (a stopped
        # context's broadcast is gone with its executors; poking it can
        # only raise), and never let cleanup failure break the build path.
        for (old_app, *_), old_bc in list(ns.items()):
            if old_app == app_id:
                try:
                    old_bc.unpersist(blocking=False)
                except Exception:
                    pass  # already cleaned / context racing shutdown
        ns.clear()  # one live side-input per namespace is plenty
        ns[full_key] = spark.sparkContext.broadcast(builder())
    return ns[full_key]
