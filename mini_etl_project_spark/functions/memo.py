"""JVM-aware memoization for deterministic Column-expression builders.

Catalyst Columns are immutable expression trees, so reusing one across
plans and queries is sound — but a cached Column holds py4j references
into a specific JVM gateway. A plain ``functools.lru_cache`` (the r12
form) would serve stale references if the SparkContext is torn down and
recreated inside one Python process (ADVICE r12). ``jvm_memo`` keys the
cache on the ACTIVE SparkContext identity and drops every entry when it
changes, so a fresh JVM always rebuilds its expressions.

Only deterministic builders over hashable inputs (column NAMES, counts)
may use this — data never enters the cache, only unresolved expression
shapes (the r12 no-data rule).
"""

from __future__ import annotations

import functools
from typing import Callable, TypeVar

T = TypeVar("T")


def jvm_memo(fn: Callable[..., T]) -> Callable[..., T]:
    state: dict = {"ctx": None, "cache": {}}

    @functools.wraps(fn)
    def wrap(*args):
        from pyspark import SparkContext

        ctx = SparkContext._active_spark_context
        if ctx is not state["ctx"]:
            state["ctx"] = ctx
            state["cache"] = {}
        cache = state["cache"]
        if args not in cache:
            cache[args] = fn(*args)
        return cache[args]

    wrap.cache_clear = lambda: state["cache"].clear()  # type: ignore[attr-defined]
    return wrap
