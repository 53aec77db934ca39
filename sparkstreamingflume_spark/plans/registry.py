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
# but the registry holds more (len(REGISTRY) — don't hard-code it; the
# count drifts as operators land). Rather than burning the same 50 slots
# every round, the window ROTATES. Round-7 rationale: with the 101-query
# ledger fully closed in round 6 (every registry entry has a green driver
# row in some round), the window's job is pure staleness control — the
# round-6 verdict's target is "no registry query's newest driver row older
# than two rounds". Slots, in priority order: (1) the queries whose PLAN
# changed this round (the SimHash pair family gained the BUCKET_CEIL
# count-window prune; q_embed_quantize_topk gained IVF cell gating) so the
# changed plans get driver rows, (2) ALL 22 primaries whose last row is
# round 5 (the §2 line-op block: md5-mask/filter-prefix/field-extract/
# 44-to-10/lookup-build/..., plus windows, joins, pagerank), (3) the 14
# round-4-green extras (the relational anchors q_distinct/q_cube/
# q_intersect/q_except/q_histogram/q_subqueries/q_topk plus the corpus-prep
# family), (4) 11 of the 15 round-5-green extras. The four r5 extras left
# out (q_dedup_simhash, q_cluster_sort_bucketed, q_count_by_type_salted,
# q_enrich_join_salted) are strict subsets / how-variants of primaries
# that ARE in this window, and every extra is cross-engine-certified every
# run by tools/validate.py and tests/test_oracle_extras.py (same compare);
# the 50 round-6-green queries rest one round on those same gates.
# ---------------------------------------------------------------------------

# ROUND-13 ROTATION (the round-12 verdict's prescribed set, task 1):
# (1) ALL 49 queries whose newest driver row is round 10 — the staleness
# frontier ("no registry row older than two rounds" breaks for them at
# r13); the exact list was recomputed from the CORRECTNESS_r01..r12
# union before rotating (histogram r12: 50, r11: 36, r10: 49).
# (2) The one spare slot carries q_diversity_select (NEW this round:
# diversity-aware subset selection over the certified kNN graph — the
# last promised consumer in q_knn_graph's doc; a newly registered query
# certifies in its landing round). The 12 bench headliners and the
# r11/r12-green rows rest this round on tools/validate.py + the
# oracle-extras pytest gate (same compare, run every session); the 36
# r11-green rows are the r14 frontier.

CERT_WINDOW: tuple[str, ...] = (
    # -- the 49 round-10-stale rows (the staleness frontier) -----------------
    "q_approx_aggs",
    "q_approx_count_distinct",
    "q_cluster_sort",
    "q_contamination",
    "q_count_by_type",
    "q_count_distinct",
    "q_cube",
    "q_data_mix",
    "q_date_bucket",
    "q_dedup_keep_best",
    "q_dedup_semantic_from_graph",
    "q_dedup_simhash_pairs",
    "q_dedup_simhash_wide",
    "q_dirty_filter",
    "q_distinct",
    "q_embed_quantize_topk",
    "q_except",
    "q_fanout_dup",
    "q_field_drop",
    "q_field_extract",
    "q_filter_prefix",
    "q_histogram",
    "q_intersect",
    "q_json_extract",
    "q_json_typed",
    "q_knn_graph",
    "q_lag_delta",
    "q_left_join_default",
    "q_lookup_build",
    "q_md5_mask",
    "q_md5_mask_multi",
    "q_moving_window",
    "q_pii_scrub",
    "q_pivot",
    "q_profile",
    "q_project_44to10",
    "q_project_kv",
    "q_rep_filter",
    "q_sample_stratified",
    "q_seq_pack",
    "q_sketch_rollup",
    "q_subqueries",
    "q_text_normalize",
    "q_time_rollup",
    "q_topk",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_union",
    "q_window_tumbling",
    # -- round-13 newly registered (landing-round certification) -------------
    "q_diversity_select",
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
