"""Semantic pins for the portable Bloom filter (functions/bloom.py) and
the HDR log-linear histogram registers (functions/hdr.py).

The oracle gate proves Spark == DuckDB for q_bloom_filter_join,
q_quantile_hdr and q_dist_drift; these tests pin the SHARED
construction against independent pure-Python references — a drift
mirrored into both SQL dialects would pass the oracle but fail here.
Same discipline as tests/test_sketch_search.py for the CMS/HLL/BM25
family.
"""

from __future__ import annotations

import datetime
import hashlib
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"


def h32_py(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def _copy_base(out, skip):
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        if t not in skip:
            shutil.copy(f"{SRC}/{t}.parquet", str(out / f"{t}.parquet"))


def _write_events(out, rows):
    """rows: (event_id, ts, user_id, event_type, value, props)."""
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        ),
        str(out / "events.parquet"),
    )


# ---------------------------------------------------------------------------
# HDR bucketing: Spark SQL == DuckDB SQL == pure Python, value by value
# ---------------------------------------------------------------------------

# exact linear regime, every octave boundary +-1, deep interiors, and
# values big enough that a float log2 would have rounded differently
PIN_VALUES = sorted(
    {
        *range(1, 70),
        *(2**e + d for e in range(5, 63) for d in (-1, 0, 1)),
        *(2**e + 2 ** (e - 2) + 13 for e in range(7, 60, 5)),
        10**12 + 7,
        (1 << 62) + 12345,
    }
)


def test_hdr_bucketing_matches_pure_python_in_both_dialects(spark):
    import duckdb

    from sparkstreamingflume_spark.functions.hdr import (
        hdr_idx_mid_py,
        hdr_idx_mid_sql,
    )
    from sparkstreamingflume_spark.functions.hdr import _spark_sql

    want = {v: hdr_idx_mid_py(v) for v in PIN_VALUES}

    sdf = spark.createDataFrame([(v,) for v in PIN_VALUES], "v long")
    s_idx, s_mid = _spark_sql("v")
    got_spark = {
        r["v"]: (r["idx"], r["mid"])
        for r in sdf.selectExpr(
            "v", f"CAST({s_idx} AS BIGINT) AS idx",
            f"CAST({s_mid} AS BIGINT) AS mid",
        ).collect()
    }
    assert got_spark == want

    d_idx, d_mid = hdr_idx_mid_sql("v")
    vals = ", ".join(f"({v}::BIGINT)" for v in PIN_VALUES)
    got_duck = {
        v: (i, m)
        for v, i, m in duckdb.sql(
            f"SELECT v, {d_idx} AS idx, {d_mid} AS mid "
            f"FROM (VALUES {vals}) AS t(v)"
        ).fetchall()
    }
    assert got_duck == want

    # structural invariants of the recipe: idx monotone in v, mid lands
    # inside its bucket, relative half-width bounded by 1/64
    prev = -1
    for v in PIN_VALUES:
        idx, mid = want[v]
        assert idx >= prev
        prev = idx
        if v >= 32:
            s = v.bit_length() - 6
            lo = (v >> s) << s
            assert lo <= mid < lo + (1 << s)
            assert abs(mid - v) <= max(1, v >> 6)
        else:
            assert (idx, mid) == (v, v)


def test_hdr_rank_rule_matches_pure_python_in_both_dialects(spark):
    import duckdb

    from sparkstreamingflume_spark.functions.hdr import (
        HDR_QUANTILES_PPM,
        rank_expr,
        rank_py,
        rank_sql,
    )

    ns = [1, 2, 3, 19, 20, 21, 99, 100, 101, 999, 1000, 12345]
    for q in HDR_QUANTILES_PPM:
        want = {n: rank_py(n, q) for n in ns}
        got_spark = {
            r["n"]: r["k"]
            for r in spark.createDataFrame([(n,) for n in ns], "n long")
            .selectExpr("n", f"{rank_expr('n', q)} AS k")
            .collect()
        }
        assert got_spark == want, f"spark rank rule drift at q={q}"
        vals = ", ".join(f"({n}::BIGINT)" for n in ns)
        got_duck = dict(
            duckdb.sql(
                f"SELECT n, {rank_sql('n', q)} FROM (VALUES {vals}) t(n)"
            ).fetchall()
        )
        assert got_duck == want, f"duckdb rank rule drift at q={q}"
        # the rule is the ceil form: 1 <= k <= n, k/n >= q
        for n, k in want.items():
            assert 1 <= k <= n and k * 1_000_000 >= n * q


def test_quantile_hdr_planted_fixture(spark, tmp_path):
    """End-to-end pin of q_quantile_hdr: exact quantiles, register
    estimates and error columns re-derived in plain Python over a
    planted value set that spans the linear and log regimes."""
    from sparkstreamingflume_spark.functions.hdr import (
        HDR_QUANTILES_PPM,
        hdr_idx_mid_py,
        rank_py,
    )
    from sparkstreamingflume_spark.plans import REGISTRY

    out = tmp_path / "sf"
    out.mkdir()
    _copy_base(out, skip=("events",))
    # type a: 1..500 cents (1.0 step = 0.01 value); type b: heavy tail
    planted = {
        "a": [c for c in range(1, 501)],
        "b": [7] * 50 + [900] * 30 + [65537] * 19 + [10**9 + 3],
    }
    rows = []
    eid = 0
    for typ, cents in planted.items():
        for c in cents:
            rows.append(
                (
                    eid,
                    datetime.datetime(2024, 1, 1 + eid % 28, 12, 0, 0),
                    eid,
                    typ,
                    c / 100.0 + 0.001,  # floor(value*100) == c
                    "p",
                )
            )
            eid += 1
    _write_events(out, rows)

    want = {}
    for typ, cents in planted.items():
        cs = sorted(cents)
        n = len(cs)
        regs = {}
        for c in cs:
            idx, mid = hdr_idx_mid_py(c)
            regs.setdefault(idx, [mid, 0])
            regs[idx][1] += 1
        cols = [n]
        ests, exacts = [], []
        for q in HDR_QUANTILES_PPM:
            k = rank_py(n, q)
            exacts.append(cs[k - 1])
            cum = 0
            est = None
            for idx in sorted(regs):
                mid, cnt = regs[idx]
                cum += cnt
                if cum >= k:
                    est = mid
                    break
            ests.append(est)
        for ex, es in zip(exacts, ests):
            cols += [ex, es]
        cols += [
            abs(es - ex) * 1_000_000 // ex
            for ex, es in zip(exacts, ests)
        ]
        want[typ] = tuple(cols)

    got = {
        r["event_type"]: tuple(r[c] for c in r.asDict() if c != "event_type")
        for r in REGISTRY["q_quantile_hdr"].build(spark, str(out)).collect()
    }
    assert got == want
    # the documented error bound: half a bucket => <= ~1/64 relative
    for typ, cols in want.items():
        for err in cols[-3:]:
            assert err <= 16_000, (typ, cols)


def test_dist_drift_planted_fixture(spark, tmp_path):
    """End-to-end pin of q_dist_drift: TV distance re-derived in plain
    Python over planted half-period histograms; identical halves must
    read 0 and a full distribution swap must read ~1_000_000."""
    from sparkstreamingflume_spark.functions.hdr import hdr_idx_mid_py
    from sparkstreamingflume_spark.plans import REGISTRY

    out = tmp_path / "sf"
    out.mkdir()
    _copy_base(out, skip=("events",))
    # date range 2024-01-01 .. 2024-01-10; first half <= day 5
    # type "same": identical histograms both halves -> tv = 0
    # type "swap": disjoint buckets across halves -> tv = 1_000_000
    # type "mix": partial overlap, unequal n per half
    half_a = {"same": [10, 20, 30], "swap": [5] * 4, "mix": [40, 40, 100]}
    half_b = {"same": [10, 20, 30], "swap": [9000] * 6, "mix": [40, 7000]}
    rows = []
    eid = 0
    for typ in half_a:
        for c in half_a[typ]:
            rows.append(
                (eid, datetime.datetime(2024, 1, 1 + eid % 5, 8, 0, 0),
                 eid, typ, c / 100.0 + 0.001, "p")
            )
            eid += 1
    for typ in half_b:
        for c in half_b[typ]:
            rows.append(
                (eid, datetime.datetime(2024, 1, 6 + eid % 5, 8, 0, 0),
                 eid, typ, c / 100.0 + 0.001, "p")
            )
            eid += 1
    _write_events(out, rows)

    want = {}
    for typ in half_a:
        ha, hb = {}, {}
        for c in half_a[typ]:
            idx, _ = hdr_idx_mid_py(c)
            ha[idx] = ha.get(idx, 0) + 1
        for c in half_b[typ]:
            idx, _ = hdr_idx_mid_py(c)
            hb[idx] = hb.get(idx, 0) + 1
        na, nb = sum(ha.values()), sum(hb.values())
        tv = (
            sum(
                abs(
                    ha.get(i, 0) * 1_000_000 // na
                    - hb.get(i, 0) * 1_000_000 // nb
                )
                for i in set(ha) | set(hb)
            )
            // 2
        )
        want[typ] = (na, nb, tv)

    got = {
        r["event_type"]: (r["n_a"], r["n_b"], r["tv_ppm"])
        for r in REGISTRY["q_dist_drift"].build(spark, str(out)).collect()
    }
    assert got == want
    assert want["same"][2] == 0
    assert want["swap"][2] >= 999_000  # floored ppm can shave < 1000


def test_bloom_filter_join_planted_fixture(spark, tmp_path):
    """End-to-end pin of q_bloom_filter_join: the filter words, every
    membership verdict and the aggregate pass/fp/missed counts are
    re-derived in plain Python (md5 positions + bit masks) over planted
    customers/orders — including a planted NON-member custkey that the
    filter must reject and NULL custkeys that are non-members."""
    from sparkstreamingflume_spark.functions.bloom import (
        BF_BITS,
        BF_K,
        BF_WORD_BITS,
        bloom_py,
    )
    from sparkstreamingflume_spark.plans import REGISTRY
    from sparkstreamingflume_spark.plans.relational_queries import (
        BF_SEGMENT,
    )

    out = tmp_path / "sf"
    out.mkdir()
    _copy_base(out, skip=("customer", "orders"))
    members = list(range(1, 41))  # custkeys in the BUILDING segment
    others = list(range(1000, 1500))  # not in the segment
    cust = [(k, BF_SEGMENT) for k in members] + [
        (k, "OTHER") for k in others
    ]
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([k for k, _ in cust], pa.int64()),
                "c_name": pa.array([f"c{k}" for k, _ in cust], pa.string()),
                "c_nationkey": pa.array([0] * len(cust), pa.int32()),
                "c_acctbal": pa.array([0.0] * len(cust), pa.float64()),
                "c_mktsegment": pa.array(
                    [s for _, s in cust], pa.string()
                ),
            }
        ),
        str(out / "customer.parquet"),
    )
    # orders: every member twice, every other once, plus NULL custkeys
    ords = [(k, "1-URGENT") for k in members] + [
        (k, "2-HIGH") for k in members
    ] + [(k, "1-URGENT") for k in others] + [(None, "2-HIGH")] * 3
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(len(ords)), pa.int64()),
                "o_custkey": pa.array([k for k, _ in ords], pa.int64()),
                "o_orderstatus": pa.array(["O"] * len(ords), pa.string()),
                "o_totalprice": pa.array([1.0] * len(ords), pa.float64()),
                "o_orderdate": pa.array(
                    [datetime.datetime(2024, 1, 1)] * len(ords),
                    pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array(
                    [p for _, p in ords], pa.string()
                ),
            }
        ),
        str(out / "orders.parquet"),
    )

    words = bloom_py([str(k) for k in members])

    def member_py(k) -> bool:
        if k is None:
            return False
        for i in range(BF_K):
            pos = h32_py(f"bf{i}:{k}") % BF_BITS
            if not words[pos // BF_WORD_BITS] & (1 << (pos % BF_WORD_BITS)):
                return False
        return True

    member_set = {str(k) for k in members}
    want = {}
    for k, prio in ords:
        st = want.setdefault(prio, [0, 0, 0, 0, 0])
        bp = member_py(k)
        tm = k is not None and str(k) in member_set
        st[0] += 1
        st[1] += int(bp)
        st[2] += int(tm)
        st[3] += int(bp and not tm)
        st[4] += int(tm and not bp)
    for prio, st in want.items():
        neg = st[0] - st[2]
        want[prio] = tuple(st) + (
            st[3] * 1_000_000 // neg if neg > 0 else 0,
        )

    got = {
        r["o_orderpriority"]: (
            r["n_orders"], r["n_bloom_pass"], r["n_true"],
            r["n_false_pos"], r["n_missed"], r["fp_ppm"],
        )
        for r in REGISTRY["q_bloom_filter_join"]
        .build(spark, str(out))
        .collect()
    }
    assert got == want
    # no false negatives, ever; and the planted non-member tail is big
    # enough that the 2048-bit filter's fp machinery is exercised
    assert all(v[4] == 0 for v in want.values())
    assert sum(v[0] - v[2] for v in want.values()) >= 500
