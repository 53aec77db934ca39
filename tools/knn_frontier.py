"""kNN-graph recall/cost frontier (round-9 verdict task 4).

Measures edge recall vs the uncelled exact graph and wall-clock cost
for the dials of ``knn_graph`` (plans/extension_queries.py):
query-side nprobe in {1, 2, 3, 5, 8}, symmetric index-side multiprobe
points — the residual recall lever where a true neighbor's HOME cell
is outside every probed cell but a shared NEAR cell exists — and
(round 10) SRP band-bucket composition points (``lsh_bands`` > 0, the
cell-count-independent arm for the near-random regime; the measured
q_knn_graph_lsh ship decision is in BASELINE.md).

The synthetic fixture embeddings are near-random (the worst case for
cell gating: true neighbors scatter uniformly across cells, so recall
here is a FLOOR; clustered corpora concentrate neighbors in adjacent
cells). To show the clustered-regime number too, the tool also builds
a planted-clusters fixture (CLUSTERED rows = Gaussian blobs around
random centers) and measures the same frontier on it.

Usage: python tools/knn_frontier.py [sf_dir] — prints one JSON line
per (fixture, nprobe, index_nprobe) point; paste the table into
BASELINE.md.
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, ".")

# (nprobe, index_nprobe, lsh_bands) — lsh_bands > 0 composes the SRP
# band-bucket candidate arm (round-10: the near-random-regime lever);
# band width corpus-adaptive in-plan since round 11 (the static-8
# silent-disable fix; see _srp_signatures). The separate liveness
# sweep below proves the arm stays candidate-generating at >=100k
# reps, where static 8 bits would prune most of the signature mass.
POINTS = [
    (1, 1, 0),
    (2, 1, 0),
    (3, 1, 0),
    (5, 1, 0),
    (8, 1, 0),
    (3, 2, 0),
    (3, 3, 0),
    (1, 1, 24),
    (3, 1, 16),
    (3, 1, 24),
    (5, 1, 16),
    (5, 1, 24),
]
# planted fixtures sized so adaptive K = n/500 = 40 cells >> max nprobe
# (the driver fixtures have only 8 cells, where nprobe=8 IS brute force
# and the cost curve is invisible)
N_PLANTED = 20_000
DIM = 64
N_BLOBS = 40


def _exact_graph(vecs: dict, k: int) -> dict:
    import numpy as np

    ids = np.array(sorted(vecs))
    mat = np.stack([vecs[i] for i in ids])
    norms = np.sqrt((mat * mat).sum(axis=1))
    sims = np.floor(
        (mat @ mat.T) * 1_000_000.0 / np.outer(norms, norms)
    ).astype("int64")
    # very negative but safely negatable (int64.min would wrap under
    # the -sims sort key and rank SELF first)
    np.fill_diagonal(sims, -(2**62))
    out = {}
    margin = min(len(ids) - 1, k + 32)  # headroom for ppm ties
    for qi, q in enumerate(ids):
        cand = np.argpartition(-sims[qi], margin - 1)[:margin]
        order = cand[np.lexsort((ids[cand], -sims[qi][cand]))][:k]
        out[int(q)] = {int(ids[i]) for i in order}
    return out


def _recall(got: dict, exact: dict, k: int) -> float:
    hits = sum(len(set(got.get(q, ())) & exact[q]) for q in exact)
    return hits / (len(exact) * k)


def _measure(spark, sf_dir: str, fixture: str) -> list[dict]:
    import numpy as np
    import pyarrow.parquet as pq

    from sparkstreamingflume_spark.plans.extension_queries import (
        KNN_K,
        knn_graph,
    )

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    vecs = {
        i: np.array(e, dtype=np.float64)
        for i, e in zip(tbl["vec_id"], tbl["embedding"])
        if e is not None and not any(x is None for x in e)
    }
    # mirror the engine's exact-dup collapse (copy-sets reduce to their
    # min-id representative BEFORE the graph) or recall is understated
    # on fixtures with duplicate vectors
    seen: dict = {}
    for i in sorted(vecs):
        seen.setdefault(vecs[i].tobytes(), i)
    vecs = {i: vecs[i] for i in seen.values()}
    exact = _exact_graph(vecs, KNN_K)
    rows = []
    base_sec = None
    # untimed warmup so the first point doesn't absorb JVM/codegen cost
    knn_graph(spark, sf_dir, nprobe=1).count()
    for nprobe, inprobe, lsh_bands in POINTS:
        t0 = time.time()
        got: dict = {}
        for r in knn_graph(
            spark,
            sf_dir,
            nprobe=nprobe,
            index_nprobe=inprobe,
            lsh_bands=lsh_bands,
        ).collect():
            got.setdefault(r.q_id, set()).add(r.nbr_id)
        sec = time.time() - t0
        if base_sec is None:
            base_sec = sec
        row = {
            "fixture": fixture,
            "nprobe": nprobe,
            "index_nprobe": inprobe,
            "lsh_bands": lsh_bands,
            "recall": round(_recall(got, exact, KNN_K), 3),
            "sec": round(sec, 2),
            "cost_x": round(sec / base_sec, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def _planted_dir(spark, clustered: bool) -> str:
    """Write an N_PLANTED-vector fixture (Gaussian blobs when
    ``clustered``, pure Gaussians otherwise) shaped like the driver
    table, under /tmp — sized so adaptive K = 40 cells and the cost
    curve reflects the cells << corpus regime."""
    import os
    import tempfile

    import numpy as np

    rng = np.random.default_rng(9 if clustered else 10)
    centers = rng.normal(size=(N_BLOBS, DIM))
    rows = []
    for i in range(N_PLANTED):
        if clustered:
            v = centers[i % N_BLOBS] + rng.normal(scale=0.35, size=DIM)
        else:
            v = rng.normal(size=DIM)
        rows.append((i, v.tolist()))
    d = tempfile.mkdtemp(prefix="knn_frontier_")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).write.parquet(os.path.join(d, "embeddings.parquet"))
    return d


def _liveness(spark, n: int) -> None:
    """The round-10 verdict task-2 frontier row: at ``n`` reps (>=100k,
    past the static-8-bit regime where expected bucket occupancy
    n/2^8 >> BUCKET_CEIL), report the in-plan adaptive band width and
    the surviving signature mass at the adaptive width vs pinned 8
    bits — proving the SRP arm still CONTRIBUTES candidates (bucket
    occupancy tracks ~TARGET_BUCKET < BUCKET_CEIL) instead of being
    silently ceiling-pruned. Synthetic xxhash64 directions (near-
    random, the arm's target regime); no recall column — the exact
    graph at this n is quadratic and the liveness contract is about
    candidate mass, not edge recall (measured at 20k above)."""
    import time

    from pyspark.sql import functions as F

    from sparkstreamingflume_spark.plans.extension_queries import (
        KNN_LSH_BANDS,
        _srp_signatures,
    )

    reps = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63),"
            " j -> CAST(xxhash64(id * 64 + j) % 1000001 AS DOUBLE))"
        ).alias("emb"),
    )
    total = n * KNN_LSH_BANDS
    for label, bits in (("adaptive", 0), ("static8", 8)):
        t0 = time.time()
        row = (
            _srp_signatures(reps, KNN_LSH_BANDS, bits)
            .agg(
                F.count("*").alias("mass"),
                F.max("band_sig").alias("max_sig"),
            )
            .collect()[0]
        )
        mass = int(row.mass or 0)
        out = {
            "fixture": f"liveness {n // 1000}k near-random",
            "lsh_bits": label,
            "nbits_used": (int(row.max_sig or 0)).bit_length(),
            "surviving_mass_frac": round(mass / total, 3),
            "sec": round(time.time() - t0, 2),
        }
        print(json.dumps(out), flush=True)


def _boundary(spark) -> None:
    """Round-11 verdict task 6: price the adaptive-bits transition.
    The full-registry probe's 10.2× q_knn_graph_lsh ratio is the
    documented BETWEEN-boundary bucket growth (at 20k sf1 reps the
    clamp still floors at 8 bits; occupancy — hence bucket-pair work —
    grows ~n² until the next bit). This measures the SRP candidate arm
    on BOTH sides of a clamp boundary (90k reps -> 10 bits, 120k ->
    11) plus the static-width counterfactual at the upper point:
    candidate pairs and wall-clock FLATTEN as nbits rises (each bit
    halves expected occupancy), where the pinned width quadruples
    them. Near-random xxhash64 directions, the arm's target regime."""
    import time

    from pyspark.sql import functions as F

    from sparkstreamingflume_spark.plans.extension_queries import (
        KNN_LSH_BANDS,
        _srp_candidates,
    )

    def reps(n: int):
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(0, 63),"
                " j -> CAST(xxhash64(id * 64 + j) % 1000001 AS DOUBLE))"
            ).alias("emb"),
        )

    for n, bits, label in (
        (90_000, 0, "adaptive (below boundary)"),
        (120_000, 0, "adaptive (above boundary)"),
        (120_000, 10, "static10 counterfactual"),
    ):
        t0 = time.time()
        cand = _srp_candidates(reps(n), KNN_LSH_BANDS, bits)
        n_pairs = cand.count()
        print(
            json.dumps(
                {
                    "fixture": f"boundary {n // 1000}k near-random",
                    "lsh_bits": label,
                    "nbits_used": (
                        bits
                        or ((max(n, 1) + 95) // 96 - 1).bit_length()
                    ),
                    "candidate_pairs": n_pairs,
                    "pairs_per_rep": round(n_pairs / n, 1),
                    "sec": round(time.time() - t0, 2),
                }
            ),
            flush=True,
        )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from sparkstreamingflume_spark.session import get_session

    spark = get_session("knn_frontier")
    if "--boundary" in sys.argv:
        _boundary(spark)
        return
    if "--liveness" in sys.argv:
        # two scale points: 120k derives 11 bits, 240k derives 12 —
        # the width really is monotone in n, not a one-off constant
        _liveness(spark, 120_000)
        _liveness(spark, 240_000)
        return
    _measure(spark, sf_dir, f"driver ({sf_dir.rsplit('/', 1)[-1]}, 8 cells)")
    _measure(
        spark, _planted_dir(spark, False), "near-random 20k (40 cells)"
    )
    _measure(
        spark, _planted_dir(spark, True), "clustered 20k (40 blobs/cells)"
    )
    _liveness(spark, 120_000)


if __name__ == "__main__":
    main()
