"""Query registry.

A :class:`Query` pairs a Spark DataFrame builder with the equivalent ANSI
SQL (DuckDB dialect) oracle statement. The driver's correctness gate runs
both at sf=0.01 and compares row count + schema + order-insensitive value
hash (SURVEY.md §5.2), so:

* every computed column is aliased identically on both sides;
* float aggregates are made cross-engine deterministic by scaling each
  row to an integer *before* summing (``floor(x * scale)`` on identical
  input doubles is bit-deterministic; bigint sums are exact — no
  summation-order drift between engines);
* timestamps are emitted as formatted strings.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "Query"] = {}


@dataclass
class Query:
    name: str
    build: Builder
    oracle: str | None  # DuckDB SQL; None => rows-only check
    doc: str = ""
    tags: tuple[str, ...] = ()
    bench: bool = False  # include in bench.py headline set
    # extra=True: still registered, locally validated (tools/validate.py)
    # and oracle-certified by pytest (tests/test_oracle_extras.py), but
    # NOT exposed through __spark_entry__.queries() — the driver certifies
    # at most 50 entries per round, so that window is reserved for the 50
    # primary queries. Every extra is a strict subset or a how-variant of
    # a primary query (see each decorator's doc).
    extra: bool = False


def query(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
    extra: bool = False,
) -> Callable[[Builder], Builder]:
    """Register a declared query (decorator over the Spark builder)."""

    def wrap(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(
            name,
            fn,
            oracle,
            doc=doc or (fn.__doc__ or ""),
            tags=tags,
            bench=bench,
            extra=extra,
        )
        return fn

    return wrap


def primary_queries() -> dict[str, Query]:
    """The driver-certified surface (must stay <=50 entries)."""
    return {n: q for n, q in REGISTRY.items() if not q.extra}
