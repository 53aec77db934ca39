"""Adversarial bounded-pairs fixture for the DF_CEIL stop-shingle cutoff.

A boilerplate sentence injected into 20% of a corpus makes its shingles'
document frequency grow linearly with corpus size D, so without an upper
df cutoff the posting self-join emits O((0.2*D)^2) candidate rows — the
one inverted-index plan shape that does not survive a 100x scale-up
(AQE skew-splitting rebalances partitions but cannot reduce the
quadratic pair COUNT). The fixture corpora cannot exercise the ceiling
(max shingle df is 25 at sf0.1), so this synthetic corpus certifies:

1. the engagement point — boilerplate df <= DF_CEIL keeps its pairs,
   df > DF_CEIL drops them, so doubling the corpus DECREASES pair
   output instead of quadrupling it;
2. Spark and the DuckDB oracle still hash-match on a corpus where the
   ceiling IS active (the driver fixtures never reach it).
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sparkstreamingflume_spark.oracle import compare, duck_fetch
from sparkstreamingflume_spark.plans import REGISTRY
from sparkstreamingflume_spark.plans.extension_queries import DF_CEIL

# 7 tokens each -> 5 internal 3-gram shingles; no token overlap between
# the two sentences or with the per-doc unique filler words.
BOILER = "please subscribe to our newsletter for updates"  # in 20% of docs
RARE = "this rare footer appears in few documents"  # in 1% of docs


def _corpus(tmp_path, n_docs: int) -> str:
    """documents.parquet with BOILER in every 5th doc, RARE in every 100th."""
    out = tmp_path / f"adv{n_docs}"
    out.mkdir()
    ids, texts = [], []
    for i in range(n_docs):
        t = " ".join(f"w{i}x{j}" for j in range(12))  # unique filler
        if i % 5 == 0:
            t += " " + BOILER
        if i % 100 == 0:
            t += " " + RARE
        ids.append(i)
        texts.append(t)
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n_docs, pa.string()),
            "source": pa.array(["adv"] * n_docs, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(out / "documents.parquet"))
    return str(out)


@pytest.mark.parametrize("name", ["q_dedup_ngram_jaccard", "q_dedup_containment"])
def test_df_ceiling_bounds_boilerplate_pairs(spark, tmp_path, name):
    # D=400: boilerplate df = 80 <= DF_CEIL -> its C(80,2)=3160 pairs emit.
    # D=800: boilerplate df = 160 > DF_CEIL -> stop-shingles dropped; only
    # the 8 RARE docs (df=8) still pair: C(8,2)=28 rows. Without the
    # ceiling the doubled corpus would emit C(160,2)=12720 pairs (~4x).
    assert 80 <= DF_CEIL < 160, "fixture sized around the shipped ceiling"
    small, big = _corpus(tmp_path, 400), _corpus(tmp_path, 800)
    q = REGISTRY[name]
    assert q.build(spark, small).count() == 3160
    big_df = q.build(spark, big)
    big_rows = [tuple(r) for r in big_df.collect()]
    assert len(big_rows) == 28
    # the linear-bound statement: doubling D must not ~quadruple output
    assert len(big_rows) <= 2 * 3160

    # cross-engine certification on the ceiling-active corpus
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{big}/documents.parquet'"
        )
        ocols, orows = duck_fetch(con, q.oracle)
        problems = compare(big_df.columns, big_rows, ocols, orows)
        assert not problems, f"{name}: {problems}"
    finally:
        con.close()


def _hot_bucket_corpus(tmp_path, n_dups: int, n_unique: int = 40) -> str:
    """n_dups identical docs (one mega band-bucket) + n_unique distinct
    docs, of which pairs (even ids share a tail with odd ids... none —
    all unique). The identical docs share EVERY band, so each of the 4
    bucket keys holds n_dups members."""
    out = tmp_path / f"hot{n_dups}"
    out.mkdir()
    dup_text = "identical boilerplate page copied everywhere across the web"
    ids, texts = [], []
    for i in range(n_dups):
        ids.append(i)
        texts.append(dup_text)
    for i in range(n_unique):
        ids.append(10_000 + i)
        texts.append(" ".join(f"u{i}w{j}" for j in range(10)))
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(ids), pa.string()),
            "source": pa.array(["adv"] * len(ids), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(out / "documents.parquet"))
    return str(out)


# (name, n_dups_small, n_dups_big): q_dedup_simhash_wide doubles its
# corpus internally (doc_id + 1M twin per doc), so 50/100 source dups put
# 100/200 members in each quarter bucket — same engagement points as the
# undoubled families. Its doubled unique docs pair with their own twins
# (hamming 0), so assertions are restricted to the mega-cluster's ids.
_HOT_FAMILY = [
    ("q_dedup_minhash", 100, 200, 1),
    ("q_dedup_simhash_pairs", 100, 200, 1),
    ("q_dedup_simhash_wide", 50, 100, 2),
]


@pytest.mark.parametrize("name,n_small,n_big,mult", _HOT_FAMILY)
def test_bucket_ceiling_bounds_hot_pairs(spark, tmp_path, name, n_small, n_big, mult):
    """BUCKET_CEIL engagement, parametrized over every pair-enumerating
    LSH family: identical docs share EVERY band/half/quarter bucket, so
    n_dups <= ceiling emits all C(n,2) mega-cluster pairs while
    n_dups > ceiling emits ZERO pairs from the mega-bucket instead of
    C(n,2) — and the oracle, with the ceiling mirrored, still
    hash-matches on the ceiling-active corpus. The mega-cluster itself
    is NOT lost: q_dedup_exact groups the identical texts and
    q_dedup_clusters (bipartite, uncapped) still forms the single
    cluster without enumerating pairs."""
    from sparkstreamingflume_spark.plans.extension_queries import BUCKET_CEIL

    assert 100 <= BUCKET_CEIL < 200, "fixture sized around the ceiling"
    small, big = (
        _hot_bucket_corpus(tmp_path, n_small),
        _hot_bucket_corpus(tmp_path, n_big),
    )

    def _dup_pairs(rows):
        # pairs fully inside the mega-cluster (dup ids are < 10_000 and,
        # for the internally-doubled wide variant, their +1M twins)
        def is_dup(i):
            return i % 1_000_000 < 10_000

        return [r for r in rows if is_dup(r[0]) and is_dup(r[1])]

    q = REGISTRY[name]
    small_rows = [tuple(r) for r in q.build(spark, small).collect()]
    n_members = n_small * mult
    assert len(_dup_pairs(small_rows)) == n_members * (n_members - 1) // 2

    big_df = q.build(spark, big)
    big_rows = [tuple(r) for r in big_df.collect()]
    assert len(_dup_pairs(big_rows)) == 0  # mega-bucket dropped

    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{big}/documents.parquet'"
        )
        ocols, orows = duck_fetch(con, q.oracle)
        problems = compare(big_df.columns, big_rows, ocols, orows)
        assert not problems, problems
    finally:
        con.close()

    # the consumers that must still handle the mega-cluster:
    exact = REGISTRY["q_dedup_exact"].build(spark, big)
    dup_groups = [r for r in exact.collect() if r["n_copies"] >= n_big]
    assert dup_groups, "exact dedup lost the mega-cluster"
    clusters = REGISTRY["q_dedup_clusters"].build(spark, big).collect()
    mega = [r for r in clusters if r["cluster_id"] == 0]
    assert len(mega) == n_big, "bipartite clustering must keep mega-clusters"


def _hot_embedding_corpus(tmp_path, n_dups: int, dim: int = 64) -> str:
    """embeddings.parquet where vec_ids 0..9 are unique vectors (probe /
    centroid ids), 10..73 are the corpus rows q_dedup_embed_lsh uses as
    its 64 hyperplanes, and 1000..1000+n_dups-1 are IDENTICAL copies of
    one vector — which therefore share all 8 (band, band_sig) buckets,
    the embedding analog of the identical-text mega-cluster."""
    import random

    out = tmp_path / f"hotemb{n_dups}"
    out.mkdir()
    rng = random.Random(42)

    def vec():
        return [rng.uniform(-1.0, 1.0) for _ in range(dim)]

    ids, vecs = [], []
    for i in range(74):  # uniques + hyperplane rows
        ids.append(i)
        vecs.append(vec())
    dup = vec()
    for i in range(n_dups):
        ids.append(1000 + i)
        vecs.append(list(dup))
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([0] * len(ids), pa.int32()),
        }
    )
    pq.write_table(tbl, str(out / "embeddings.parquet"))
    return str(out)


def test_bucket_ceiling_bounds_embed_lsh_pairs(spark, tmp_path):
    """BUCKET_CEIL engagement for the SRP-LSH embedding family: 100
    identical vectors (every shared bucket holds ~100 <= ceiling) emit
    all C(100,2) cos=1.0 pairs; 200 identical vectors push all 8 of
    their buckets over the ceiling and emit ZERO pairs from the
    mega-bucket — with the oracle, ceiling mirrored, still
    hash-matching on the ceiling-active corpus. The mega-cluster stays
    recoverable exactly as in the text family: q_dedup_embed_exact
    groups the identical vectors (one combinable agg, no pairs), and
    q_dedup_embed_cosine — which collapses exact-duplicate values to
    one representative BEFORE cell pairing — emits zero intra-mass
    pairs instead of C(200,2) from one hot cell."""
    from sparkstreamingflume_spark.plans.extension_queries import BUCKET_CEIL

    assert 100 <= BUCKET_CEIL < 200, "fixture sized around the ceiling"
    small, big = (
        _hot_embedding_corpus(tmp_path, 100),
        _hot_embedding_corpus(tmp_path, 200),
    )

    def dup_pairs(rows):
        return [r for r in rows if r[0] >= 1000 and r[1] >= 1000]

    q = REGISTRY["q_dedup_embed_lsh"]
    small_rows = [tuple(r) for r in q.build(spark, small).collect()]
    assert len(dup_pairs(small_rows)) == 100 * 99 // 2

    big_df = q.build(spark, big)
    big_rows = [tuple(r) for r in big_df.collect()]
    assert len(dup_pairs(big_rows)) == 0  # mega-buckets dropped

    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM '{big}/embeddings.parquet'"
        )
        ocols, orows = duck_fetch(con, q.oracle)
        problems = compare(big_df.columns, big_rows, ocols, orows)
        assert not problems, problems
    finally:
        con.close()

    # safety net, text-family order: exact-vector grouping captures the
    # mass without pairs, and the cell-gated cosine path collapses the
    # copy-set to one representative instead of pairing a hot cell
    exact = REGISTRY["q_dedup_embed_exact"].build(spark, big).collect()
    mega = [r for r in exact if r["n_copies"] >= 200]
    assert len(mega) == 1 and mega[0]["keeper_vec_id"] == 1000
    cos = REGISTRY["q_dedup_embed_cosine"].build(spark, big)
    n_dup_cos = len(dup_pairs([tuple(r) for r in cos.collect()]))
    assert n_dup_cos == 0, n_dup_cos


def test_knn_graph_bounded_under_mass_duplication(spark, tmp_path):
    """q_knn_graph's exact-dup collapse is its mass-duplication defense:
    200 identical vectors collapse to ONE min-id representative before
    any cell pairing, so the copy-set contributes one neighbor list
    (never 200 lists of each other, never a 200²-pair hot cell), total
    output stays <= |reps| * K, and the oracle — which mirrors the
    collapse — still hash-matches on this corpus."""
    from sparkstreamingflume_spark.plans.extension_queries import KNN_K

    sf = _hot_embedding_corpus(tmp_path, 200)
    q = REGISTRY["q_knn_graph"]
    df = q.build(spark, sf)
    rows = [tuple(r) for r in df.collect()]

    copy_qids = {r[0] for r in rows if r[0] >= 1000}
    assert copy_qids == {1000}  # one rep speaks for the 200 copies
    copy_nbrs = {r[1] for r in rows if r[1] >= 1000}
    assert copy_nbrs <= {1000}  # and appears at most once per list
    n_reps = 74 + 1
    assert len(rows) <= n_reps * KNN_K

    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'"
        )
        ocols, orows = duck_fetch(con, q.oracle)
        problems = compare(df.columns, rows, ocols, orows)
        assert not problems, problems
    finally:
        con.close()
