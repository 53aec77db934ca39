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
    # and oracle-certified by pytest (tests/test_oracle_extras.py), and NOT
    # part of the default primary set — but CERT_WINDOW may still name an
    # extra to give it a driver row (the rotation draws from the FULL
    # registry). Every extra is a strict subset or a how-variant of a
    # primary query (see each decorator's doc).
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


# ---------------------------------------------------------------------------
# Per-round driver certification window.
#
# The driver certifies at most 50 queries()/oracle_sql() entries per round,
# but the registry holds 93. Rather than burning the same 50 slots every
# round, the window ROTATES. Round-5 rationale: round 4's events fixtures
# changed ts encoding and broke every events-backed query at analysis time
# (session.py load_table, fixed this round), so the window re-certifies the
# ENTIRE events blast radius (22 queries — incl. the 6 never-green
# casualties q_approx_aggs / q_approx_count_distinct / q_json_typed /
# q_lag_delta / q_moving_window / q_sketch_rollup), adds q_rep_filter (the
# last registry entry with no driver row ever), the six line-op queries
# whose shared corpus gained a CR-suffixed branch this round (certifying
# the \z end-of-input semantics at the driver, functions/lines.py:44-51),
# q_dedup_candidates_verified (candidate frame now materialized once), the
# 12 bench headliners, and regression anchors. Queries OUTSIDE the window
# stay cross-engine-certified every run by tools/validate.py and
# tests/test_oracle_extras.py (same compare).
# ---------------------------------------------------------------------------

CERT_WINDOW: tuple[str, ...] = (
    # -- never driver-certified: last gap in the ledger ---------------------
    "q_rep_filter",
    # -- events blast radius: every query the r4 loader break took down -----
    "q_approx_aggs",
    "q_approx_count_distinct",
    "q_asof_join",
    "q_broadcast_join",
    "q_count_distinct",
    "q_date_bucket",
    "q_enrich_join_salted",
    "q_fanout_dup",
    "q_json_extract",
    "q_json_typed",
    "q_lag_delta",
    "q_left_join_default",
    "q_moving_window",
    "q_pagerank",
    "q_pivot",
    "q_project_kv",
    "q_range_join",
    "q_sessionize",
    "q_sketch_rollup",
    "q_time_rollup",
    "q_window_sliding",
    "q_window_tumbling",
    # -- line-op family: corpus gained the CR-suffixed branch this round ----
    "q_field_extract",
    "q_md5_mask",
    "q_md5_mask_multi",
    "q_field_drop",
    "q_project_44to10",
    "q_dirty_filter",
    "q_gprs_pipeline",
    "q_filter_prefix",
    "q_count_by_type",
    "q_cluster_sort",
    "q_union",
    "q_group_concat",
    # -- changed this round: candidate frame materialized once --------------
    "q_dedup_candidates_verified",
    # -- remaining bench headliners + regression anchors --------------------
    "q_tpch_q1",
    "q_join_bigbig",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_dedup_ngram_jaccard",
    "q_embed_topk",
    "q_corpus_prep",
    "q_lookup_build",
    "q_cluster_sort_bucketed",
    "q_count_by_type_salted",
    "q_dedup_simhash",
    "q_dedup_clusters",
    "q_dedup_keep_best",
    "q_dedup_embed_cosine",
)


def window_queries() -> dict[str, Query]:
    """The <=50 registry entries exposed to the driver this round.

    Hard-raises (not assert — survives ``python -O``) on an oversized
    window or a name that doesn't resolve, so a bad rotation fails at
    import time in the driver, not as a silent certification gap.
    """
    if len(CERT_WINDOW) > 50:
        raise RuntimeError(
            f"certification window has {len(CERT_WINDOW)} entries; driver cap is 50"
        )
    if len(set(CERT_WINDOW)) != len(CERT_WINDOW):
        raise RuntimeError("certification window contains duplicates")
    missing = [n for n in CERT_WINDOW if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"certification window names not in registry: {missing}")
    return {n: REGISTRY[n] for n in CERT_WINDOW}
