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
    full_key = (spark.sparkContext.applicationId, *key)
    if full_key not in ns:
        ns.clear()  # one live side-input per namespace is plenty
        ns[full_key] = spark.sparkContext.broadcast(builder())
    return ns[full_key]
