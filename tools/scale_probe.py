"""10x scale probe: run the headline bench at sf0.1 and sf1, gate on
superlinearity (round-3 verdict task 5).

A query whose wall-clock grows more than GATE_RATIO (15x) on 10x data is
flagged: that shape of blowup is what LSH candidate explosions, broadcast-
threshold cliffs, and window skew look like. Each scale runs in its OWN
subprocess (fresh JVM) so sf1 doesn't inherit sf0.1's warmed state, using
bench.py verbatim — same queries, same median-of-N methodology.

Usage: python tools/scale_probe.py          (expects .scaledata/sf1; run
       tools/make_sf1.py first)
Prints one JSON line: {"sf0.1": {...}, "sf1": {...}, "ratio": {...},
"flagged": [...], "gate": 15.0}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

GATE_RATIO = 15.0
SF1_DIR = os.path.abspath(".scaledata/sf1")

# Non-headliner operators probed through the same harness (round-5
# verdict task 4): the round-5/6 newcomers whose scale behavior has no
# bench row — the LSH band-bucket blowup gate matters most for
# q_dedup_embed_lsh, and the df-ceiling prune for containment.
EXTRA_QUERIES = (
    "q_dedup_containment",
    "q_dedup_embed_lsh",
    "q_doc_chunk",
    "q_sample_per_group",
    "q_session_window",
    "q_tfidf",
    # round-6 additions
    "q_dedup_block",
    "q_embed_quantize_topk",
    "q_train_test_split",
    "q_dedup_incremental",
    "q_lm_score",
    "q_merge_upsert",
    "q_dedup_simhash_wide",
    # round-7: plan changed (BUCKET_CEIL on the simhash pair family) or
    # new (multiprobe IVF) — the ceiling queries are exactly where a
    # band-bucket blowup would show as a superlinear ratio
    "q_dedup_simhash_pairs",
    "q_embed_ivf_multiprobe",
    "q_kmeans_assign",
    "q_embed_ivf_refined",
    "q_dedup_embed_cosine",
    # late round-7: the corpus rewrite — the only plan that shuffles the
    # FULL corpus text through a doc_id groupBy (2.7x on first measure)
    "q_dedup_block_scrub",
    "q_scd2_history",
    "q_dedup_prefix_filter",
    "q_funnel",
    "q_retention",
    "q_event_transitions",
    "q_dsir_weight",
    "q_resample_locf",
    "q_resample_interp",
    # closing round-7: the sketch/search/sampling family — the CMS
    # sketch's fixed-width combine and the two TakeOrderedAndProject
    # top-k plans should all scale sublinearly; the anomaly moment agg
    # is the shape most sensitive to a lost broadcast
    "q_heavy_hitters_cms",
    "q_bm25_search",
    "q_sample_weighted",
    "q_anomaly_zscore",
    # the index/overlap pair: posting-list build (segment-bounded
    # collect_list) and the per-source MinHash union sketch (shingle
    # explode into a 16-min combinable agg + BNLJ over the aggregate)
    "q_inverted_index",
    "q_corpus_overlap",
    # every-vector neighbor graph: the n x TARGET_CELL within-cell join
    # is the repo's largest deliberate workload — the ratio gate is what
    # proves the adaptive-K cells hold it linear
    "q_knn_graph",
    # export shuffle: one hash exchange + per-shard sort, no global sort
    "q_shuffle_shards",
    # bigram LM: two frequency-table builds + double token-key join —
    # the heaviest of the quality-gate family
    "q_lm_bigram",
    # portable HLL: fixed 256-register state per group, combinable —
    # should be flat; a superlinear ratio here means the register
    # pre-aggregation stopped combining map-side
    "q_distinct_hll",
    # PMI: the min-count HAVING must prune before the token joins — a
    # blowup here is the joined frame growing with the bigram tail
    "q_pmi_collocations",
    # basket self-join co-partitioned on (user, day): per-basket output
    # is |types|^2-bounded, so the ratio gate proves linearity
    "q_assoc_rules",
    # round-8: the late-round-7 snapshot trio. The bloom build is one
    # combinable BIT_OR onto <= BF_WORDS rows and the fact side is
    # scanned once — the ratio prices the probe-side expression chain;
    # drift is one combinable groupBy onto <= |types| * ~2k registers;
    # quantile_hdr DELIBERATELY carries the exact per-type sort the
    # docstring says you'd drop at scale — its ratio prices that sort
    "q_bloom_filter_join",
    "q_dist_drift",
    "q_quantile_hdr",
    # round-8: multiprobe kNN graph (nprobe recall dial, =5 since the
    # round-9 frontier — the ratio prices the 5x candidate fan-out
    # staying linear) and SemDeDup composed on top of it (edges +
    # threshold + O(log n) CC rounds)
    "q_dedup_semantic",
    # round-9: the materialized-graph SemDeDup split. Its probe time on
    # a warm cache is the CC increment alone (the production shape);
    # bench.py's untimed warm-up pass builds the cache, so the timed
    # medians measure exactly that increment
    "q_dedup_semantic_from_graph",
    # round-10: the SRP-composed near-random variant — the ratio prices
    # the signature pass (linear corpus scan) + band-bucket join
    # staying ceiling-bounded at 10x the corpus
    "q_knn_graph_lsh",
)


# Deliberately-quadratic fixture-scale references, excluded from the
# --all sweep BY NAME (and echoed in the output so the exclusion is
# never silent): their docstrings already state they are O(n²) recall
# baselines that must not run at scale — gating them would only
# re-flag the documented contract.
ALL_SWEEP_EXCLUDED = ("q_dedup_embed_cosine_bruteforce",)


def _all_registry_queries() -> tuple[str, ...]:
    """--all: probe EVERY registered query (round-10 verdict task 5 —
    the full-registry sweep; the last full run predates the r9-r11
    registrations) except ALL_SWEEP_EXCLUDED. Resolved in-process so
    the list can never drift from the registry."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from sparkstreamingflume_spark.plans import REGISTRY

    return tuple(sorted(set(REGISTRY) - set(ALL_SWEEP_EXCLUDED)))


def run_bench(sf_dir: str, extra: tuple[str, ...] = EXTRA_QUERIES) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_EXTRA=",".join(extra),
        # the probe's statistic is the WITHIN-RUN sf1/sf0.1 ratio, which
        # box noise hits both sides of — median-of-3 keeps the full
        # ~50-query x2-scale run under an hour on the round-8 box
        SPARK_GRAFT_BENCH_ITERS=os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"),
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        # the full-registry --all sweep (133 queries x warmup+3 iters,
        # heavy ANN/dedup tail at sf1) needs more than the headline
        # set's hour
        timeout=7200,
    ).stdout
    # bench prints exactly one JSON line (last non-empty line of stdout)
    return json.loads([ln for ln in out.splitlines() if ln.strip()][-1])


def main() -> None:
    if not os.path.isdir(SF1_DIR):
        sys.exit(f"{SF1_DIR} missing — run: python tools/make_sf1.py")
    extra = (
        _all_registry_queries() if "--all" in sys.argv else EXTRA_QUERIES
    )
    small = run_bench("/root/testdata/sf0.1", extra)
    big = run_bench(SF1_DIR, extra)
    ratio = {
        name: round(big["queries"][name] / max(small["queries"][name], 1e-3), 1)
        for name in sorted(small["queries"])
    }
    flagged = sorted(n for n, r in ratio.items() if r > GATE_RATIO)
    print(
        json.dumps(
            {
                "sf0.1": small["queries"],
                "sf1": big["queries"],
                "total_sf0.1": small["value"],
                "total_sf1": big["value"],
                # per-scale host-speed canary (bench.py's fixed-work
                # md5 microbench) — round-9 verdict task 5: every
                # timing artifact carries the box-speed reading, so a
                # cross-round comparison can normalize to total/canary
                # instead of arguing box state from prose. Noise
                # floor: same-box canary spread measured ~13%
                # (BASELINE.md trend row) — treat <20% moves of
                # total/canary as noise.
                "canary_sf0.1": small.get("canary_sec"),
                "canary_sf1": big.get("canary_sec"),
                "ratio": ratio,
                "flagged": flagged,
                "gate": GATE_RATIO,
                "excluded": (
                    list(ALL_SWEEP_EXCLUDED)
                    if "--all" in sys.argv
                    else []
                ),
            }
        )
    )
    if flagged:
        sys.exit(2)


if __name__ == "__main__":
    main()
