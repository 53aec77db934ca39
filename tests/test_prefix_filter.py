"""Losslessness pin for q_dedup_prefix_filter vs pure-Python brute force.

The DuckDB oracle already certifies the prefix filter against the plain
all-postings join at fixture scale; this pins it against a THIRD,
engine-free implementation (the h32_py/shingles_py reference pins from
test_text_properties) on a seeded corpus engineered to put pair
similarities on BOTH sides of — and near — the 0.5 threshold, where a
wrong prefix length would drop qualifying pairs. Brute force enumerates
every pair: any pair the prefix join misses fails the set equality.
"""

from __future__ import annotations

import math
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sparkstreamingflume_spark.plans import REGISTRY
from sparkstreamingflume_spark.plans.extension_queries import (
    PF_JACCARD_MIN_PPM,
)
from tests.test_text_properties import h32_py, shingles_py

N_BASE = 40  # base docs; each gets 0-2 mutated near-copies


def _make_texts() -> dict[int, str]:
    rng = random.Random(20260814)
    texts, next_id = {}, 0
    for b in range(N_BASE):
        toks = [f"w{rng.randrange(400)}" for _ in range(40)]
        texts[next_id] = " ".join(toks)
        next_id += 1
        # near-copies at graded mutation strengths: 1-2 swaps keeps
        # jaccard ~0.7-0.9, 4-6 swaps straddles 0.5, 12 falls below
        for n_mut in rng.sample([1, 2, 4, 5, 6, 12], k=rng.randrange(3)):
            mut = list(toks)
            for p in rng.sample(range(len(mut)), k=n_mut):
                mut[p] = f"m{rng.randrange(400)}"
            texts[next_id] = " ".join(mut)
            next_id += 1
    return texts


def _brute_force(texts: dict[int, str]) -> set[tuple[int, int, int]]:
    # mirror the query: doubled corpus, distinct h32 shingle sets
    corpus = dict(texts)
    corpus.update({i + 1_000_000: t for i, t in texts.items()})
    hsets = {
        i: {h32_py(s) for s in shingles_py(t)} for i, t in corpus.items()
    }
    out = set()
    ids = sorted(hsets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            ha, hb = hsets[a], hsets[b]
            if not ha or not hb:
                continue
            n_common = len(ha & hb)
            jac = n_common * 1_000_000.0 / (len(ha) + len(hb) - n_common)
            if jac >= PF_JACCARD_MIN_PPM:
                out.add((a, b, math.floor(jac)))
    return out


def test_prefix_filter_is_lossless_vs_brute_force(spark, tmp_path):
    texts = _make_texts()
    ids = sorted(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([texts[i] for i in ids], pa.string()),
                "lang": pa.array(["en"] * len(ids), pa.string()),
                "source": pa.array(["pf"] * len(ids), pa.string()),
                "n_chars": pa.array(
                    [len(texts[i]) for i in ids], pa.int64()
                ),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = {
        (r["doc_a"], r["doc_b"], r["jaccard_ppm"])
        for r in REGISTRY["q_dedup_prefix_filter"]
        .build(spark, str(tmp_path))
        .collect()
    }
    expected = _brute_force(texts)
    # the corpus must actually exercise the interesting region: pairs
    # above threshold beyond the guaranteed twins, and near-misses below
    n_twin = len(texts)
    assert len(expected) > n_twin, "no non-twin qualifying pairs generated"
    assert got == expected
