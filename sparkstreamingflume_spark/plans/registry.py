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
# every round, the window ROTATES. Round-6 rationale: the top priority is
# the SIX registry entries that have never had a driver row (the round-5
# newcomers — round 5's window correctly spent its slots re-certifying the
# events blast radius instead); with them green, every registry query has
# a driver row in some round. Next come the queries whose PLAN changed
# this round (the inverted-index family gained the DF_CEIL stop-shingle
# cutoff; q_sample_per_group was rewritten to the per-partition top-K
# form), ALL SEVEN round-6 newcomers (so no query waits a full round for
# its first driver row), the 12 bench headliners (fresh rows alongside
# BENCH_r06), and the stalest remainder — everything whose last green
# row is round 3, then a round-4 slice prioritizing §2 anchors and one
# query per family (seven round-4-green relational anchors rotated OUT
# to make room for the newcomers: q_distinct/q_except/q_intersect/
# q_histogram/q_subqueries/q_topk/q_cube keep their r4 rows + the
# every-round pytest oracle gate). Queries OUTSIDE the window stay cross-engine-certified
# every run by tools/validate.py and tests/test_oracle_extras.py (same
# compare).
# ---------------------------------------------------------------------------

CERT_WINDOW: tuple[str, ...] = (
    # -- never driver-certified: the round-5 newcomers ----------------------
    "q_dedup_containment",
    "q_dedup_embed_lsh",
    "q_doc_chunk",
    "q_sample_per_group",
    "q_session_window",
    "q_tfidf",
    # -- plan changed this round (DF_CEIL prune; top-K sampler) -------------
    "q_dedup_ngram_jaccard",
    "q_dedup_candidates_verified",
    # -- round-6 newcomers --------------------------------------------------
    "q_dedup_block",
    "q_embed_quantize_topk",
    "q_train_test_split",
    "q_dedup_incremental",
    "q_lm_score",
    "q_merge_upsert",
    "q_dedup_simhash_wide",
    # -- bench headliners (fresh rows alongside BENCH_r06) ------------------
    "q_tpch_q1",
    "q_window_sliding",
    "q_dedup_exact",
    "q_join_bigbig",
    "q_embed_topk",
    "q_broadcast_join",
    "q_dedup_minhash",
    "q_group_concat",
    "q_sessionize",
    "q_gprs_pipeline",
    "q_corpus_prep",
    # -- stalest: last driver row was round 3 -------------------------------
    "q_dedup_simhash_pairs",
    "q_doc_fingerprint",
    "q_embed_ivf_search",
    "q_grouping_sets",
    "q_multimodal_meta",
    "q_percentile",
    "q_rank_topn_per_group",
    "q_semi_anti",
    "q_set_ops",
    "q_text_lang_id",
    "q_text_quality",
    "q_text_stats",
    "q_text_topterms",
    "q_tpch_q3",
    "q_tpch_q5",
    # -- round-4 slice: §2 anchors + one per relational family --------------
    "q_anti_join",
    "q_semi_join",
    "q_count",
    "q_approx_percentile",
    "q_rollup",
    "q_window_suite",
    "q_embed_ivf",
    "q_dedup_embed_cosine_bruteforce",
    "q_token_count",
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
