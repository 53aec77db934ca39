"""Semantic pins for the sketch / search / weighted-sampling family.

The oracle gate proves Spark == DuckDB; these tests pin the SHARED
construction against independent pure-Python references (a mirrored
drift in both dialects would pass the oracle but fail here), plus the
physical-plan shapes the docstrings promise.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"


def h32_py(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


# ---------------------------------------------------------------------------
# Fixture corpus: tiny documents table with controlled tokens + weights
# ---------------------------------------------------------------------------

DOCS = [
    # (doc_id, text) — docs 0/1 carry the BM25 probe terms with different
    # tf/dl; 2 carries one term; 3-4 carry none; 5 is empty-ish.
    (0, "vector join filter vector join vector"),
    (1, "vector padding padding padding padding padding padding padding"),
    (2, "join alone in a long document full of other words entirely"),
    (3, "nothing relevant here at all"),
    (4, "completely unrelated text tokens"),
    (5, "x"),
]


@pytest.fixture(scope="module")
def corpus_sf(tmp_path_factory):
    import shutil

    out = tmp_path_factory.mktemp("sketch_sf")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        shutil.copy(f"{SRC}/{t}.parquet", str(out / f"{t}.parquet"))
    tbl = pa.table(
        {
            "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
            "text": pa.array([t for _, t in DOCS], pa.string()),
            "lang": pa.array(["en"] * len(DOCS), pa.string()),
            "source": pa.array(["s"] * len(DOCS), pa.string()),
            "n_chars": pa.array([len(t) for _, t in DOCS], pa.int64()),
        }
    )
    pq.write_table(tbl, str(out / "documents.parquet"))
    return str(out)


# ---------------------------------------------------------------------------
# Count-Min Sketch
# ---------------------------------------------------------------------------


def cms_reference(texts: list[tuple[int, str]], probe_max_doc: int):
    """Plain-Python CMS with the same salt scheme and dimensions."""
    from sparkstreamingflume_spark.plans.extension_queries import (
        CMS_D,
        CMS_W,
    )

    sketch = [[0] * CMS_W for _ in range(CMS_D)]
    exact: dict[str, int] = {}
    probe: set[str] = set()
    for doc_id, text in texts:
        for tok in text.split(" "):
            exact[tok] = exact.get(tok, 0) + 1
            for d in range(CMS_D):
                sketch[d][h32_py(f"cms{d}:{tok}") % CMS_W] += 1
            if doc_id < probe_max_doc:
                probe.add(tok)
    est = {
        t: min(sketch[d][h32_py(f"cms{d}:{t}") % CMS_W] for d in range(CMS_D))
        for t in probe
    }
    return est, exact


def test_cms_matches_pure_python_and_never_underestimates(spark, corpus_sf):
    from sparkstreamingflume_spark.plans import REGISTRY
    from sparkstreamingflume_spark.plans.extension_queries import (
        CMS_PROBE_DOCS,
    )

    rows = {
        r["tok"]: r["est"]
        for r in REGISTRY["q_heavy_hitters_cms"]
        .build(spark, corpus_sf)
        .collect()
    }
    est, exact = cms_reference(DOCS, CMS_PROBE_DOCS)
    assert rows == est
    # the defining CMS guarantee: one-sided error
    for tok, e in rows.items():
        assert e >= exact[tok], f"CMS underestimated {tok}"


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def bm25_reference(texts: list[tuple[int, str]]):
    """The exact integer BM25 rendering, independently in Python."""
    from sparkstreamingflume_spark.plans.extension_queries import BM25_TERMS

    doclen = {d: len(t.split(" ")) for d, t in texts}
    n_docs = len(doclen)
    s_tok = sum(doclen.values())
    tf: dict[tuple[int, str], int] = {}
    for d, t in texts:
        for tok in t.split(" "):
            if tok in BM25_TERMS:
                tf[(d, tok)] = tf.get((d, tok), 0) + 1
    df: dict[str, int] = {}
    for (_, tok) in tf:
        df[tok] = df.get(tok, 0) + 1
    scores: dict[int, int] = {}
    terms: dict[int, int] = {}
    for (d, tok), f in tf.items():
        dl = doclen[d]
        tf_part = (1_000_000 * 44 * f * s_tok) // (
            20 * s_tok * f + 6 * s_tok + 18 * dl * n_docs
        )
        c = (tf_part * (2 * n_docs - 2 * df[tok] + 1)) // (2 * df[tok] + 1)
        scores[d] = scores.get(d, 0) + c
        terms[d] = terms.get(d, 0) + 1
    return scores, terms


def test_bm25_matches_pure_python_reference(spark, corpus_sf):
    from sparkstreamingflume_spark.plans import REGISTRY

    got = [
        (r["doc_id"], r["n_terms"], r["bm25_ppm"])
        for r in REGISTRY["q_bm25_search"].build(spark, corpus_sf).collect()
    ]
    scores, terms = bm25_reference(DOCS)
    want = sorted(
        ((d, terms[d], s) for d, s in scores.items()),
        key=lambda r: (-r[2], r[0]),
    )
    assert got == want
    # ranking sanity on the constructed corpus: doc 0 (3 probe terms,
    # high tf, short) must outrank the single-term docs; term-free docs
    # must not appear at all.
    assert got[0][0] == 0
    assert {r[0] for r in got} == {0, 1, 2}


# ---------------------------------------------------------------------------
# Sequential Poisson weighted sampling
# ---------------------------------------------------------------------------


def test_weighted_sample_matches_reference_and_prefers_heavy(spark, tmp_path):
    import math
    import shutil

    from sparkstreamingflume_spark.plans import REGISTRY
    from sparkstreamingflume_spark.plans.extension_queries import SPS_N

    out = tmp_path / "sps_sf"
    out.mkdir()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        shutil.copy(f"{SRC}/{t}.parquet", str(out / f"{t}.parquet"))
    # 400 docs: even ids weight 1000, odd ids weight 10
    n = 400
    weights = [1000 if i % 2 == 0 else 10 for i in range(n)]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["t"] * n, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(["s"] * n, pa.string()),
            "n_chars": pa.array(weights, pa.int64()),
        }
    )
    pq.write_table(tbl, str(out / "documents.parquet"))

    got = [
        (r["doc_id"], r["n_chars"], r["pri_ppb"])
        for r in REGISTRY["q_sample_weighted"].build(spark, str(out)).collect()
    ]
    # independent reference: same priority arithmetic in plain Python
    pri = [
        (
            math.floor(
                (h32_py(f"sps:{i}") + 1) / weights[i] * 1_000_000_000
            ),
            i,
        )
        for i in range(n)
    ]
    pri.sort()
    want = [(i, weights[i], p) for p, i in pri[:SPS_N]]
    assert got == want
    # inclusion probability tracks weight: the 100x-heavier half must
    # dominate a 100-of-400 sample (expected ~99 of 100)
    heavy = sum(1 for d, _, _ in got if d % 2 == 0)
    assert heavy > 80


# ---------------------------------------------------------------------------
# z-score anomaly flags
# ---------------------------------------------------------------------------


def test_anomaly_zscore_matches_pure_python(spark, tmp_path):
    import datetime
    import shutil

    from sparkstreamingflume_spark.plans import REGISTRY

    out = tmp_path / "zs_sf"
    out.mkdir()
    for t in (
        "region nation customer supplier part orders lineitem documents "
        "embeddings"
    ).split():
        shutil.copy(f"{SRC}/{t}.parquet", str(out / f"{t}.parquet"))
    # one tight cluster + two planted outliers, plus a constant-valued
    # type (variance 0 -> excluded entirely)
    vals = [10.00 + 0.01 * i for i in range(50)] + [500.00, 0.05]
    rows = [("a", v) for v in vals] + [("const", 7.77)] * 5
    t0 = datetime.datetime(2024, 1, 1)
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([t0] * len(rows), pa.timestamp("us")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "value": pa.array([r[1] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(out / "events.parquet"))

    got = {
        r["event_id"]: (r["event_type"], r["cents"], r["dev_c"], r["z2_ppm"])
        for r in REGISTRY["q_anomaly_zscore"].build(spark, str(out)).collect()
    }

    # independent floored-moment reference
    import math

    cents = [math.floor(v * 100) for _, v in rows]
    groups: dict[str, list[int]] = {}
    for (etype, _), c in zip(rows, cents):
        groups.setdefault(etype, []).append(c)
    want = {}
    for etype, cs in groups.items():
        n, s, ss = len(cs), sum(cs), sum(c * c for c in cs)
        mean_c = s // n
        var_cc = (ss // n) - mean_c * mean_c
        if var_cc <= 0:
            continue
        for eid, ((et, _), c) in enumerate(zip(rows, cents)):
            if et != etype:
                continue
            dev = c - mean_c
            if 4 * dev * dev > 9 * var_cc:
                want[eid] = (etype, c, dev, (dev * dev * 1_000_000) // var_cc)
    assert got == want
    # the big planted outlier is flagged and the tight cluster is not;
    # the LOW outlier (0.05) is correctly MASKED — the 500.00 spike
    # inflates the type's variance so 0.05 sits at |z| ~ 0.3, the
    # classic masking behavior of a global z-test; the zero-variance
    # type contributes nothing
    assert {rows[e][1] for e in got} == {500.00}


# ---------------------------------------------------------------------------
# Physical-plan pins
# ---------------------------------------------------------------------------


def test_plan_shapes(spark):
    from sparkstreamingflume_spark.plans import REGISTRY

    sf = SRC
    # global top-N queries must compile to TakeOrderedAndProject (partial
    # per-partition top-N), not a rangepartitioning sort exchange
    for name in ("q_sample_weighted", "q_bm25_search"):
        p = (
            REGISTRY[name].build(spark, sf)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "TakeOrderedAndProject" in p, name
        assert "rangepartitioning" not in p, name
    # the anomaly join-back must broadcast the KB-sized stats frame
    p = (
        REGISTRY["q_anomaly_zscore"].build(spark, sf)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    # the CMS probe join must broadcast the sketch (fixed D*W rows)
    p = (
        REGISTRY["q_heavy_hitters_cms"].build(spark, sf)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in p
    # PMI's ranking must be a partial top-K, not a global sort
    p = (
        REGISTRY["q_pmi_collocations"].build(spark, sf)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in p
    assert "rangepartitioning" not in p
    # the HLL estimate/exact recombination and the assoc-rule support
    # join-backs are |types|-sized — broadcast, never sort-merge
    for name in ("q_distinct_hll", "q_assoc_rules"):
        p = (
            REGISTRY[name].build(spark, sf)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in p, name
        assert "SortMergeJoin" not in p, name


# ---------------------------------------------------------------------------
# Portable HLL
# ---------------------------------------------------------------------------


def test_distinct_hll_matches_pure_python(spark, tmp_path):
    """Registers, estimate and error column re-derived in plain Python
    (md5 + bit twiddling + integer divisions) — a drift mirrored into
    both SQL dialects would pass the oracle but fail this."""
    import datetime
    import shutil

    from sparkstreamingflume_spark.functions.hll import (
        HLL_ALPHA_NUM,
        HLL_M,
        HLL_SHIFT,
    )
    from sparkstreamingflume_spark.plans import REGISTRY

    out = tmp_path / "hll_sf"
    out.mkdir()
    for t in (
        "region nation customer supplier part orders lineitem documents "
        "embeddings"
    ).split():
        shutil.copy(f"{SRC}/{t}.parquet", str(out / f"{t}.parquet"))
    # 2 types x (users x days) grids of different true cardinality
    rows = []
    eid = 0
    for typ, n_users, n_days in (("a", 400, 5), ("b", 7, 3)):
        for u in range(n_users):
            for d in range(n_days):
                rows.append(
                    (
                        eid,
                        datetime.datetime(2024, 1, d + 1, 12, 0, 0),
                        u,
                        typ,
                        1.0,
                        "p",
                    )
                )
                eid += 1
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(out / "events.parquet"))

    # independent reference
    want = {}
    for typ in ("a", "b"):
        keys = {
            f"{u}/2024-01-{d + 1:02d}"
            for (_, ts, u, t, _, _) in rows
            for d in [ts.day - 1]
            if t == typ
        }
        regs: dict[int, int] = {}
        for k in keys:
            h = h32_py(f"hll:{k}")
            bucket, w = h % HLL_M, h >> 8
            rho = (w & -w).bit_length() if w else HLL_SHIFT
            regs[bucket] = max(regs.get(bucket, 0), rho)
        z = sum(1 << (HLL_SHIFT - r) for r in regs.values()) + (
            HLL_M - len(regs)
        ) * (1 << HLL_SHIFT)
        est = (HLL_ALPHA_NUM // z) // 1_000_000
        exact = len(keys)
        want[typ] = (exact, est, abs(est - exact) * 1_000_000 // exact)

    got = {
        r["event_type"]: (r["n_exact"], r["est_hll"], r["err_ppm"])
        for r in REGISTRY["q_distinct_hll"].build(spark, str(out)).collect()
    }
    assert got == want
    # the 2000-key grid sits in the raw regime (n >> 2.5 M) and must
    # estimate within the 3-sigma envelope
    assert want["a"][2] < 200_000


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------


def test_pmi_matches_pure_python_and_finds_planted_phrase(spark, tmp_path):
    import math
    import shutil

    from sparkstreamingflume_spark.plans import REGISTRY
    from sparkstreamingflume_spark.plans.extension_queries import (
        PMI_MIN_COUNT,
    )

    out = tmp_path / "pmi_sf"
    out.mkdir()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        shutil.copy(f"{SRC}/{t}.parquet", str(out / f"{t}.parquet"))
    # 'new york' always adjacent (8x) inside varied filler; 'of the'
    # frequent but independent
    # 'of the' IS adjacent 8x, but both words also occur apart (16x
    # each), halving p(xy)/(p(x)p(y)) relative to the exclusive pair
    texts = [f"new york of the a{i} of b{i} the c{i}" for i in range(8)]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["s"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(out / "documents.parquet"))

    # independent reference with the same fixed-order float chain
    uni: dict[str, int] = {}
    big: dict[str, int] = {}
    n_big = 0
    for t in texts:
        toks = t.split(" ")
        for tok in toks:
            uni[tok] = uni.get(tok, 0) + 1
        for a, b in zip(toks, toks[1:]):
            big[f"{a} {b}"] = big.get(f"{a} {b}", 0) + 1
            n_big += 1
    n_uni = sum(uni.values())
    want = []
    for bg, c_xy in big.items():
        if c_xy < PMI_MIN_COUNT:
            continue
        w1, w2 = bg.split(" ")
        pmi_k = math.floor(
            (1000.0 * c_xy * n_uni * n_uni)
            / (float(n_big) * uni[w1] * uni[w2])
        )
        want.append((bg, c_xy, uni[w1], uni[w2], pmi_k))
    want.sort(key=lambda r: (-r[4], r[0]))

    got = [
        (r["bigram"], r["c_xy"], r["c_x"], r["c_y"], r["pmi_k"])
        for r in REGISTRY["q_pmi_collocations"].build(spark, str(out)).collect()
    ]
    assert got == want[: len(got)]
    # the planted adjacent phrase outranks the frequent-but-independent
    # pair
    ranks = {bg: i for i, (bg, *_rest) in enumerate(got)}
    assert ranks["new york"] < ranks["of the"]


# ---------------------------------------------------------------------------
# Association rules
# ---------------------------------------------------------------------------


def test_assoc_rules_matches_pure_python(spark, tmp_path):
    import datetime
    import math
    import shutil

    from sparkstreamingflume_spark.plans import REGISTRY
    from sparkstreamingflume_spark.plans.extension_queries import (
        AR_MIN_SUPPORT,
    )

    out = tmp_path / "ar_sf"
    out.mkdir()
    for t in (
        "region nation customer supplier part orders lineitem documents "
        "embeddings"
    ).split():
        shutil.copy(f"{SRC}/{t}.parquet", str(out / f"{t}.parquet"))
    # 30 baskets: {p, q} always together; {p, r} in half; r alone in rest
    baskets = []
    for u in range(30):
        items = ["p", "q"] if u % 2 == 0 else (["p", "r"] if u % 4 == 1 else ["r"])
        baskets.append((u, items))
    for u in range(30, 60):
        items = ["p", "r"] if u % 2 == 0 else ["r"]
        baskets.append((u, items))
    rows = []
    eid = 0
    for u, items in baskets:
        for it in items:
            rows.append((eid, datetime.datetime(2024, 2, 1, 8, 0, 0), u, it))
            eid += 1
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["x"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(out / "events.parquet"))

    # independent reference
    n_b = len(baskets)
    sup: dict[str, int] = {}
    pair: dict[tuple[str, str], int] = {}
    for _, items in baskets:
        s = sorted(set(items))
        for it in s:
            sup[it] = sup.get(it, 0) + 1
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                pair[(s[i], s[j])] = pair.get((s[i], s[j]), 0) + 1
    want = []
    for (x, y), n_xy in pair.items():
        if n_xy < AR_MIN_SUPPORT:
            continue
        lift = math.floor(
            (1_000_000.0 * n_xy * n_b) / (float(sup[x]) * sup[y])
        )
        want.append(
            (
                x,
                y,
                n_xy,
                lift,
                n_xy * 1_000_000 // sup[x],
                n_xy * 1_000_000 // sup[y],
            )
        )
    want.sort(key=lambda r: (-r[3], r[0], r[1]))

    got = [
        tuple(r)
        for r in REGISTRY["q_assoc_rules"].build(spark, str(out)).collect()
    ]
    assert got == want
    # the always-together pair must out-lift the half-time pair
    lifts = {(x, y): l for x, y, _, l, _, _ in got}
    assert lifts[("p", "q")] > lifts[("p", "r")]
