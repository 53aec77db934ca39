"""Semantic pin for q_dedup_block_scrub (exact-substring corpus rewrite).

The driver fixture only exercises the degenerate doubled-corpus case
(every twin scrubs to its tail). This corpus is built so every scrub
behavior has a hand-computable expectation: keeper occupancy (first
(doc_id, block_index) occurrence survives, all later ones removed),
within-doc duplicate blocks, sub-block tails surviving the scrub,
short docs passing through untouched, and the removed-token ppm
arithmetic. The same corpus is then run through the driver's own
cross-engine compare so Spark and the DuckDB oracle agree on a corpus
where the scrub is ACTIVE in originals, not just in twins.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sparkstreamingflume_spark.oracle import compare, duck_fetch
from sparkstreamingflume_spark.plans import REGISTRY

S = " ".join(f"s{j}" for j in range(16))  # shared 16-token block
A = " ".join(f"a{j}" for j in range(16))
B = " ".join(f"b{j}" for j in range(16))
C = " ".join(f"c{j}" for j in range(10))  # short: below one block
D = " ".join(f"d{j}" for j in range(16))
T = " ".join(f"t{j}" for j in range(5))  # sub-block tail

TEXTS = {
    0: f"{S} {A}",  # owns the keeper occurrence of S
    1: f"{B} {S}",  # S removed (keeper is doc 0), B kept
    2: C,  # zero blocks: untouched passthrough
    3: f"{S} {T}",  # sole block removed, tail survives
    4: f"{D} {D}",  # within-doc duplicate: second copy removed
}


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("scrub")
    texts = [TEXTS[i] for i in sorted(TEXTS)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(sorted(TEXTS), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["pin"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(out / "documents.parquet"),
    )
    return str(out)


def test_scrub_semantics_pinned(spark, corpus):
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["q_dedup_block_scrub"].build(spark, corpus).collect()
    }
    # Originals: keeper occurrences survive, later occurrences are removed.
    assert rows[0]["clean_text"] == f"{S} {A}" and rows[0]["n_removed"] == 0
    assert rows[1]["clean_text"] == B
    assert (rows[1]["n_blocks"], rows[1]["n_removed"]) == (2, 1)
    assert rows[1]["removed_ppm"] == 500_000  # 16 of 32 tokens
    assert rows[2]["clean_text"] == C
    assert (rows[2]["n_blocks"], rows[2]["n_removed"]) == (0, 0)
    assert rows[3]["clean_text"] == T  # tail outlives its scrubbed block
    assert rows[3]["removed_ppm"] == 16 * 1_000_000 // 21
    assert rows[4]["clean_text"] == D  # within-doc dup: first copy kept
    assert (rows[4]["n_blocks"], rows[4]["n_removed"]) == (2, 1)
    # Twins (the doubled corpus): every block loses to its original's
    # keeper, so only sub-block content survives.
    assert rows[1_000_000]["clean_text"] == ""
    assert rows[1_000_000]["n_removed"] == 2
    assert rows[1_000_002]["clean_text"] == C  # blockless: still untouched
    assert rows[1_000_003]["clean_text"] == T
    # Token conservation: kept + removed blocks account for every block.
    for r in rows.values():
        assert 0 <= r["n_removed"] <= r["n_blocks"]
        assert 0 <= r["removed_ppm"] <= 1_000_000


def test_scrub_matches_oracle_when_active(spark, corpus):
    q = REGISTRY["q_dedup_block_scrub"]
    sdf = q.build(spark, corpus)
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{corpus}/documents.parquet'"
        )
        ocols, orows = duck_fetch(con, q.oracle)
    finally:
        con.close()
    problems = compare(
        sdf.columns, [tuple(r) for r in sdf.collect()], ocols, orows
    )
    assert not problems, problems


def test_scrub_under_mass_duplication(spark, tmp_path):
    """200 identical multi-block docs (the hot-bucket scenario that
    forces ceilings onto the pair-enumerating family): the scrub has no
    quadratic stage to cap — detection is one combinable agg and only
    doc 0 keeps content — and Spark must still hash-match the oracle
    with the scrub maximally active."""
    import duckdb

    text = f"{S} {A} {T}"  # two blocks + tail
    n = 200
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array([text] * n, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(["hot"] * n, pa.string()),
                "n_chars": pa.array([len(text)] * n, pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    q = REGISTRY["q_dedup_block_scrub"]
    sdf = q.build(spark, str(tmp_path))
    rows = {r["doc_id"]: r for r in sdf.collect()}
    assert len(rows) == 2 * n  # originals + twins
    assert rows[0]["clean_text"] == text and rows[0]["n_removed"] == 0
    # every other copy (originals 1..n-1 AND all twins) scrubs to tail
    losers = [r for i, r in rows.items() if i != 0]
    assert all(r["clean_text"] == T and r["n_removed"] == 2 for r in losers)
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
        )
        ocols, orows = duck_fetch(con, q.oracle)
    finally:
        con.close()
    problems = compare(
        sdf.columns, [tuple(r) for r in sdf.collect()], ocols, orows
    )
    assert not problems, problems
