"""Planted-fixture pin for q_dedup_semantic (SemDeDup composition).

The oracle gate certifies Spark == DuckDB on the driver fixtures; this
pin certifies BOTH against a hand-derived expectation on an engineered
corpus where every cluster decision is forced:

* transitivity: A-B and B-C are similar, A-C is not — one cluster via
  the bridge, min-id keeper;
* threshold gating: a pair engineered below the cosine threshold stays
  unclustered, one engineered above clusters;
* singletons (vectors similar to nothing) emit no rows.

Geometry: 12 unit vectors in 64-d. ids 0..7 sit on distinct axes, so
with n < 4000 the adaptive-K rule pins K=8 and ids 0..7 ARE the
centroids — each its own cell's anchor, mutually orthogonal (cos 0).
ids 8, 9 mix axis 0 with their own private axis at cos 0.4 to v0
(and 0.16 to each other — below the 0.35 threshold); ids 10, 11 mix
axes 1 / 2 at cos 0.34 (below) and 0.36 (above) respectively. Home
cells: 8, 9 -> cell 0; 10 -> cell 1; 11 -> cell 2. Every decisive
cosine sits >= 0.01 from the threshold, far beyond float32 rounding.
"""

from __future__ import annotations

import math
import shutil

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from sparkstreamingflume_spark.oracle import compare, duck_fetch, register_views
from sparkstreamingflume_spark.plans import REGISTRY
import pytest

# Driver-budget profile (pytest.ini): stream-twin/soak/sweep file —
# excluded from the default selection, always run by tools/run_shards.sh.
pytestmark = pytest.mark.slow

SRC = "/root/testdata/sf0.001"
DIM = 64


def _vec(parts):
    v = [0.0] * DIM
    for axis, w in parts:
        v[axis] = w
    return v


def _mix(main_axis, side_axis, c):
    """Unit vector with cosine exactly c to the main axis."""
    return _vec([(main_axis, c), (side_axis, math.sqrt(1 - c * c))])


def _planted_sf(tmp_path):
    out = tmp_path / "sf"
    out.mkdir()
    for t in (
        "region nation customer supplier part orders lineitem documents "
        "events"
    ).split():
        shutil.copy(f"{SRC}/{t}.parquet", str(out / f"{t}.parquet"))
    vecs = [_vec([(i, 1.0)]) for i in range(8)]  # 0..7: the centroids
    vecs.append(_mix(0, 8, 0.4))  # 8: cos 0.4 to v0
    vecs.append(_mix(0, 9, 0.4))  # 9: cos 0.4 to v0, 0.16 to v8
    vecs.append(_mix(1, 10, 0.34))  # 10: below the 0.35 threshold vs v1
    vecs.append(_mix(2, 11, 0.36))  # 11: above the threshold vs v2
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(
                    vecs, pa.list_(pa.float32())
                ),
                "label": pa.array([0] * len(vecs), pa.int32()),
            }
        ),
        str(out / "embeddings.parquet"),
    )
    return str(out)


def test_semantic_dedup_planted_clusters(spark, tmp_path):
    sf = _planted_sf(tmp_path)
    q = REGISTRY["q_dedup_semantic"]
    got = {
        r.vec_id: (r.cluster_id, r.is_keeper, r.cluster_size)
        for r in q.build(spark, sf).collect()
    }
    assert got == {
        # transitive cluster through v0 (v8-v9 cos 0.16 < threshold)
        0: (0, True, 3),
        8: (0, False, 3),
        9: (0, False, 3),
        # threshold: 0.36 clusters, 0.34 does not (v1/v10 absent)
        2: (2, True, 2),
        11: (2, False, 2),
    }

    # both engines agree on the planted corpus too
    con = duckdb.connect()
    try:
        register_views(con, sf)
        sdf = q.build(spark, sf)
        srows = [tuple(r) for r in sdf.collect()]
        ocols, orows = duck_fetch(con, q.oracle)
        problems = compare(sdf.columns, srows, ocols, orows)
        assert not problems, problems
    finally:
        con.close()


def test_from_graph_form_equals_inline(spark, tmp_path, monkeypatch):
    """q_dedup_semantic_from_graph (materialize once, run the CC
    increment from the parquet edges) must equal the inline form
    row-for-row on the driver fixture AND on the planted corpus; the
    second run must reuse the cache (no rewrite — the production
    claim that the graph is paid once per corpus snapshot)."""
    import os

    monkeypatch.setenv(
        "SPARK_GRAFT_GRAPH_DIR", str(tmp_path / "graph_cache")
    )
    from sparkstreamingflume_spark.plans.extension_queries import (
        materialize_knn_graph,
    )

    for sf in (SRC, _planted_sf(tmp_path)):
        inline = {
            tuple(r)
            for r in REGISTRY["q_dedup_semantic"].build(spark, sf).collect()
        }
        composed = {
            tuple(r)
            for r in REGISTRY["q_dedup_semantic_from_graph"]
            .build(spark, sf)
            .collect()
        }
        assert composed == inline
        # cache reuse: the parquet files are untouched by a second run
        path = materialize_knn_graph(spark, sf)
        mtimes = {
            f: os.path.getmtime(os.path.join(path, f))
            for f in os.listdir(path)
        }
        again = {
            tuple(r)
            for r in REGISTRY["q_dedup_semantic_from_graph"]
            .build(spark, sf)
            .collect()
        }
        assert again == inline
        assert mtimes == {
            f: os.path.getmtime(os.path.join(path, f))
            for f in os.listdir(path)
        }


def test_materialize_is_dial_keyed(spark, tmp_path, monkeypatch):
    """round-9 verdict "What's wrong #2": the cache key must derive
    from the ACTUAL dial arguments — two dials build two cache dirs
    with genuinely different graphs, and each dial's second call reuses
    its own dir (a custom operating point must never silently read the
    default graph, and vice versa)."""
    import os

    monkeypatch.setenv(
        "SPARK_GRAFT_GRAPH_DIR", str(tmp_path / "graph_cache")
    )
    from sparkstreamingflume_spark.plans.extension_queries import (
        KNN_GRAPH_SCHEMA,
        knn_graph,
        materialize_knn_graph,
    )

    sf = _planted_sf(tmp_path)
    p_default = materialize_knn_graph(spark, sf)
    p_wide = materialize_knn_graph(spark, sf, nprobe=8, k=2)
    assert p_default != p_wide
    assert os.path.exists(os.path.join(p_default, "_SUCCESS"))
    assert os.path.exists(os.path.join(p_wide, "_SUCCESS"))
    # each dir holds exactly its dial's graph
    want_wide = {
        tuple(r) for r in knn_graph(spark, sf, nprobe=8, k=2).collect()
    }
    got_wide = {
        tuple(r)
        for r in spark.read.schema(KNN_GRAPH_SCHEMA)
        .parquet(p_wide)
        .collect()
    }
    assert got_wide == want_wide
    assert all(r[3] <= 2 for r in got_wide)  # k=2 respected
    got_default = {
        tuple(r)
        for r in spark.read.schema(KNN_GRAPH_SCHEMA)
        .parquet(p_default)
        .collect()
    }
    assert got_default != got_wide
    # idempotent per dial: repeat calls return the same dir untouched
    mt = {f: os.path.getmtime(os.path.join(p_wide, f)) for f in os.listdir(p_wide)}
    assert materialize_knn_graph(spark, sf, nprobe=8, k=2) == p_wide
    assert mt == {
        f: os.path.getmtime(os.path.join(p_wide, f)) for f in os.listdir(p_wide)
    }


def test_knn_graph_planted_edges(spark, tmp_path):
    """The underlying graph on the same plant: v8's list contains v0
    with the engineered score; the v8-v9 pair IS scored (same home
    cell) but at 0.16, which is why only the threshold keeps it out of
    the semantic clusters — separating the graph's job (candidates)
    from the policy's (threshold)."""
    sf = _planted_sf(tmp_path)
    rows = REGISTRY["q_knn_graph"].build(spark, sf).collect()
    edges = {(r.q_id, r.nbr_id): r.cos_ppm for r in rows}
    assert 399_990 <= edges[(8, 0)] <= 400_010
    assert 159_990 <= edges[(8, 9)] <= 160_010
    assert 339_990 <= edges[(10, 1)] <= 340_010  # scored, below threshold
    assert 359_990 <= edges[(11, 2)] <= 360_010
