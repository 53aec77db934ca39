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

# ROUND-12 ROTATION (the round-11 verdict's prescribed set): (1) ALL 34
# queries whose newest driver row is round 9 — the staleness frontier
# ("no registry row older than two rounds" breaks for them at r12); the
# exact list is the round-11 verdict's "What's wrong #1", verified
# against the CORRECTNESS_r01..r11 union before rotating. (2) The
# round-12 plan-touched queries — q_knn_graph_lsh (the Spark band_sig
# fold realigned to LSB-first to match the oracle's encoding, ADVICE
# r11 #1), q_media_neardup (the codepoint-domain invariant pinning the
# char-histogram == byte-histogram bridge, ADVICE r11 #2), and
# q_media_neardup_binary (NEW: the binary-payload featurizer
# certification, round-11 verdict task 4; a newly registered query
# certifies in its landing round), and q_label_propagation (NEW: the
# third promised kNN-graph consumer, landing-round certification).
# (3) The remaining spare slots carry all 12 bench headliners (their
# driver rows should track the plans the judge prices every round).
# The 49 remaining round-10-green queries rest one round on
# validate.py + the oracle-extras pytest gate (same compare, run every
# session) and are the r13 frontier.

CERT_WINDOW: tuple[str, ...] = (
    # -- the 34 round-9-stale rows (the staleness frontier) ------------------
    "q_anti_join",
    "q_approx_percentile",
    "q_asof_join",
    "q_count",
    "q_dedup_block",
    "q_dedup_candidates_verified",
    "q_dedup_clusters",
    "q_dedup_containment",
    "q_dedup_embed_cosine",
    "q_dedup_embed_cosine_bruteforce",
    "q_dedup_embed_lsh",
    "q_dedup_incremental",
    "q_doc_chunk",
    "q_doc_fingerprint",
    "q_embed_ivf",
    "q_embed_ivf_search",
    "q_grouping_sets",
    "q_lm_score",
    "q_percentile",
    "q_range_join",
    "q_rank_topn_per_group",
    "q_rollup",
    "q_sample_per_group",
    "q_semi_anti",
    "q_semi_join",
    "q_set_ops",
    "q_text_lang_id",
    "q_text_quality",
    "q_text_stats",
    "q_text_topterms",
    "q_tfidf",
    "q_token_count",
    "q_train_test_split",
    "q_window_suite",
    # -- round-12 plan-touched / newly registered ----------------------------
    "q_knn_graph_lsh",
    "q_label_propagation",
    "q_media_neardup",
    "q_media_neardup_binary",
    # -- bench headliners (fresh rows alongside the priced plans) ------------
    "q_broadcast_join",
    "q_corpus_prep",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_dedup_ngram_jaccard",
    "q_embed_topk",
    "q_gprs_pipeline",
    "q_group_concat",
    "q_join_bigbig",
    "q_sessionize",
    "q_tpch_q1",
    "q_window_sliding",
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
