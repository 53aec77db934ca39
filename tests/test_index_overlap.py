"""Semantic pins for the inverted-index build and corpus-overlap sketch.

The oracle gate proves Spark == DuckDB; these tests pin the shared
construction against independent pure-Python references (a mirrored
drift in both dialects would pass the oracle but fail here) plus the
plan shapes the docstrings promise.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"


def h32_py(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def _write_docs(out, docs):
    """docs = [(doc_id, text, source)] — other tables copied from sf0.001."""
    import shutil

    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        shutil.copy(f"{SRC}/{t}.parquet", str(out / f"{t}.parquet"))
    tbl = pa.table(
        {
            "doc_id": pa.array([d for d, _, _ in docs], pa.int64()),
            "text": pa.array([t for _, t, _ in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "source": pa.array([s for _, _, s in docs], pa.string()),
            "n_chars": pa.array([len(t) for _, t, _ in docs], pa.int64()),
        }
    )
    pq.write_table(tbl, str(out / "documents.parquet"))
    return str(out)


# ---------------------------------------------------------------------------
# Corpus overlap (per-source MinHash)
# ---------------------------------------------------------------------------

# Three sources: "a" and "twin" are textually identical corpora (estimate
# must be exactly 1.0); "b" shares one doc's text with "a"; "c" is a
# disjoint vocabulary.
OVL_DOCS = [
    (0, "red green blue cyan magenta yellow", "a"),
    (1, "one two three four five six seven", "a"),
    (10, "red green blue cyan magenta yellow", "twin"),
    (11, "one two three four five six seven", "twin"),
    (20, "one two three four five six seven", "b"),
    (21, "alpha beta gamma delta epsilon zeta", "b"),
    (30, "lorem ipsum dolor sit amet consectetur", "c"),
]


def overlap_reference(docs):
    """Pure-Python per-source MinHash signatures + pairwise matches."""
    from sparkstreamingflume_spark.functions.text import MH_AC, MH_P, N_PERM

    def sig(shingle_set):
        return [
            min((a * h32_py(s) + c) % MH_P for s in shingle_set)
            for (a, c) in MH_AC
        ]

    shingles = {}
    for _, text, src in docs:
        toks = text.split(" ")
        if len(toks) < 3:
            continue
        shingles.setdefault(src, set()).update(
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        )
    sigs = {src: sig(sh) for src, sh in shingles.items()}
    # mergeability invariant of the construction itself: the signature of
    # a union is the component-wise min of the parts' signatures
    for s1 in shingles:
        for s2 in shingles:
            merged = sig(shingles[s1] | shingles[s2])
            assert merged == [
                min(x, y) for x, y in zip(sigs[s1], sigs[s2])
            ], "MinHash union-merge invariant broken in the reference"
    out = {}
    for s1 in sigs:
        for s2 in sigs:
            if s1 < s2:
                m = sum(1 for x, y in zip(sigs[s1], sigs[s2]) if x == y)
                out[(s1, s2)] = (m, m * (1_000_000 // N_PERM))
    return out


def test_corpus_overlap_matches_pure_python(spark, tmp_path):
    from sparkstreamingflume_spark.plans import REGISTRY

    sf = _write_docs(tmp_path, OVL_DOCS)
    got = {
        (r["source_a"], r["source_b"]): (r["n_match"], r["jaccard_est_ppm"])
        for r in REGISTRY["q_corpus_overlap"].build(spark, sf).collect()
    }
    assert got == overlap_reference(OVL_DOCS)
    # semantic anchors: identical corpora estimate exactly 1.0; the
    # disjoint-vocabulary source never reaches it
    assert got[("a", "twin")] == (16, 1_000_000)
    assert got[("a", "c")][0] < 16
    # all C(4,2) ordered pairs present
    assert len(got) == 6


def test_corpus_overlap_scan_is_shared(spark):
    """The expensive shingle explode + min-agg must be computed once and
    reused on the broadcast side (ReusedExchange), and the all-pairs step
    must be a broadcast nested loop over the aggregate, never a
    CartesianProduct."""
    from sparkstreamingflume_spark.plans import REGISTRY

    df = REGISTRY["q_corpus_overlap"].build(spark, "/root/testdata/sf0.001")
    df.collect()  # AQE: reuse is visible in the executed plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# Inverted index (segmented postings)
# ---------------------------------------------------------------------------

# doc 150 lands in segment 1 (IDX_SEG_W = 100); "common" spans both
# segments; "dup dup" pins per-doc dedup (one posting despite tf=2).
IDX_DOCS = [
    (0, "common dup dup apple", "s"),
    (1, "common banana", "s"),
    (150, "common apple", "s"),
]


def test_inverted_index_hand_computed(spark, tmp_path):
    from sparkstreamingflume_spark.plans import REGISTRY

    sf = _write_docs(tmp_path, IDX_DOCS)
    got = {
        (r["term"], r["seg"]): (r["seg_df"], r["df"], r["postings"])
        for r in REGISTRY["q_inverted_index"].build(spark, sf).collect()
    }
    assert got == {
        ("common", 0): (2, 3, "0,1"),
        ("common", 1): (1, 3, "150"),
        ("dup", 0): (1, 1, "0"),  # tf=2 in doc 0 but ONE posting
        ("apple", 0): (1, 2, "0"),
        ("apple", 1): (1, 2, "150"),
        ("banana", 0): (1, 1, "1"),
    }


def test_inverted_index_plan_is_two_exchanges(spark):
    """One groupBy(term, seg) shuffle for the postings, one vocab-sized
    shuffle for the term-level df window — the per-doc term dedup is
    map-side (array_distinct before the explode), so there is no
    distinct exchange."""
    from sparkstreamingflume_spark.plans import REGISTRY

    plan = (
        REGISTRY["q_inverted_index"]
        .build(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 2, plan
    assert "array_distinct" in plan


def test_inverted_index_segment_bounds_posting_rows(spark, tmp_path):
    """A stopword present in EVERY doc must never produce a posting row
    longer than the segment width — the scale contract that motivates
    segmentation."""
    from sparkstreamingflume_spark.plans import REGISTRY
    from sparkstreamingflume_spark.plans.extension_queries import IDX_SEG_W

    docs = [(i, "the filler%d" % i, "s") for i in range(0, 350)]
    sf = _write_docs(tmp_path, docs)
    rows = (
        REGISTRY["q_inverted_index"]
        .build(spark, sf)
        .filter("term = 'the'")
        .collect()
    )
    assert len(rows) == 4  # segments 0..3
    assert all(r["seg_df"] <= IDX_SEG_W for r in rows)
    assert all(len(r["postings"].split(",")) == r["seg_df"] for r in rows)
    assert all(r["df"] == 350 for r in rows)


# ---------------------------------------------------------------------------
# Deterministic export shuffle
# ---------------------------------------------------------------------------


def test_shuffle_shards_is_a_stable_permutation(spark):
    """(shard, pos) must be a valid permutation — every doc exactly
    once, per-shard positions contiguous from 1 — and bit-stable across
    runs (it is a pure function of doc_id; that reproducibility is the
    operator's reason to exist)."""
    from collections import Counter

    from sparkstreamingflume_spark.plans import REGISTRY
    from sparkstreamingflume_spark.plans.extension_queries import (
        N_SHUF_SHARDS,
    )
    from sparkstreamingflume_spark.session import load_table

    sf = "/root/testdata/sf0.001"
    q = REGISTRY["q_shuffle_shards"]
    rows = sorted(tuple(r) for r in q.build(spark, sf).collect())
    again = sorted(tuple(r) for r in q.build(spark, sf).collect())
    assert rows == again

    all_ids = {
        r["doc_id"]
        for r in load_table(spark, sf, "documents").select("doc_id").collect()
    }
    assert {r[0] for r in rows} == all_ids and len(rows) == len(all_ids)
    per_shard = Counter(r[1] for r in rows)
    assert set(per_shard) <= set(range(N_SHUF_SHARDS))
    for shard, n in per_shard.items():
        poss = sorted(r[2] for r in rows if r[1] == shard)
        assert poss == list(range(1, n + 1)), shard


# ---------------------------------------------------------------------------
# Bigram-LM gate
# ---------------------------------------------------------------------------

# 8 copies of the same sentence + one doc with the SAME unigrams in
# reversed (improbable) order — the case the unigram gate cannot see.
LM_DOCS = [(i, "alpha beta gamma delta", "s") for i in range(8)] + [
    (100, "delta gamma beta alpha", "s")
]


def lm_bigram_reference(docs):
    """Independent pure-Python rendering of the add-one bigram score."""
    uni, bgf = {}, {}
    for _, t, _ in docs:
        toks = t.split(" ")
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bgf[(a, b)] = bgf.get((a, b), 0) + 1
    v = len(uni)
    out = {}
    for d, t, _ in docs:
        toks = t.split(" ")
        if len(toks) < 2:
            continue
        ppms = [
            ((bgf[(a, b)] + 1) * 1_000_000) // (uni[a] + v)
            for a, b in zip(toks, toks[1:])
        ]
        out[d] = (len(ppms), sum(ppms) // len(ppms), min(ppms))
    return out


def test_lm_bigram_matches_reference_and_penalizes_word_order(
    spark, tmp_path
):
    from sparkstreamingflume_spark.plans import REGISTRY

    sf = _write_docs(tmp_path, LM_DOCS)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["mean_ppm"], r["min_ppm"])
        for r in REGISTRY["q_lm_bigram"].build(spark, sf).collect()
    }
    assert got == lm_bigram_reference(LM_DOCS)
    # identical unigram content, improbable order -> strictly lower
    # score than every normally-ordered copy (the unigram gate q_lm_score
    # would score them identically)
    assert got[100][1] < got[0][1]
    assert got[100][2] < got[0][2]
