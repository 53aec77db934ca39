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

# ROUND-14 ROTATION (the round-13 verdict's prescribed set, task 1):
# (1) ALL 36 queries whose newest driver row is round 11 — the staleness
# frontier; recomputed from the CORRECTNESS_r01..r13 union before
# rotating (histogram r13: 50, r12: 50, r11: 36).
# (2) The round-13-REWRITTEN queries whose driver row predates their
# rewrite (verdict "What's wrong #2"): the minhash one-pipeline rewrite
# and its direct consumer (candidates_verified), the widened chains
# (ngram/containment share a helper, group_concat, broadcast/left_join,
# embed_topk, cluster_sort, gprs hash-widen), the unrolled-dot scoring
# sites (dedup_embed_cosine), and the knn consumers that inherit the
# unroll through knn_graph (label_propagation).
# (3) The round-14 rewrites: q_diversity_select (single-pass per-cell
# selection) and q_knn_graph_lsh (Arrow SRP signatures + in-bucket pair
# enumeration) re-certify in their rewrite round even though both have
# r13 rows. q_knn_graph itself is plan-identical after round 14
# (plans/r14/q_knn_graph_{before,after}.txt) and keeps its r13 row.
# The r12/r13-green remainder rests this round on tools/validate.py +
# the oracle-extras pytest gate (same compare, run every session).

CERT_WINDOW: tuple[str, ...] = (
    # -- the 36 round-11-stale rows (the staleness frontier) -----------------
    "q_anomaly_zscore",
    "q_assoc_rules",
    "q_bloom_filter_join",
    "q_bm25_search",
    "q_cluster_sort_bucketed",
    "q_corpus_overlap",
    "q_count_by_type_salted",
    "q_dedup_block_scrub",
    "q_dedup_embed_exact",
    "q_dedup_prefix_filter",
    "q_dedup_semantic",
    "q_dedup_simhash",
    "q_dist_drift",
    "q_distinct_hll",
    "q_dsir_weight",
    "q_embed_ivf_multiprobe",
    "q_embed_ivf_refined",
    "q_enrich_join_salted",
    "q_event_transitions",
    "q_funnel",
    "q_heavy_hitters_cms",
    "q_inverted_index",
    "q_kmeans_assign",
    "q_lm_bigram",
    "q_merge_upsert",
    "q_multimodal_meta",
    "q_pagerank",
    "q_pmi_collocations",
    "q_quantile_hdr",
    "q_resample_interp",
    "q_resample_locf",
    "q_retention",
    "q_sample_weighted",
    "q_scd2_history",
    "q_session_window",
    "q_shuffle_shards",
    # -- round-13 rewrites not yet driver-certified in rewritten form --------
    "q_broadcast_join",
    "q_cluster_sort",
    "q_dedup_candidates_verified",
    "q_dedup_containment",
    "q_dedup_embed_cosine",
    "q_dedup_minhash",
    "q_dedup_ngram_jaccard",
    "q_embed_topk",
    "q_gprs_pipeline",
    "q_group_concat",
    "q_label_propagation",
    "q_left_join_default",
    # -- round-14 rewrites (re-certify in the rewrite round) -----------------
    "q_diversity_select",
    "q_knn_graph_lsh",
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
