"""Cross-engine parity on a NULL-infested document corpus.

The driver fixtures contain no NULL or empty text, so NULL-handling
divergence between Spark and DuckDB (three-valued IN, null window
groups, split(NULL) propagation) is invisible to the certification
gate. This runs EVERY oracle-backed query that reads ``documents``
against a corpus with NULL text, empty text, whitespace text, NULL
lang and NULL source, and applies the driver's own compare. Found one
real divergence when introduced: Spark's window grouped NULL content
hashes into one bucket (two NULL-text docs flagged as exact dups of
each other) where SQL's IN never matches NULL — q_dedup_incremental
now pins the "unknown content matches nothing, and is not kept" contract.
"""

from __future__ import annotations

import shutil

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sparkstreamingflume_spark.oracle import compare, duck_fetch, register_views
from sparkstreamingflume_spark.plans import REGISTRY

SRC = "/root/testdata/sf0.001"

TEXTS = [
    "normal doc with several tokens here",
    None,
    "",
    " ",
    "one",
    None,
    "another normal document for the corpus test run",
]

DOC_QUERIES = sorted(
    n for n, q in REGISTRY.items() if q.oracle and "documents" in q.oracle
)


@pytest.fixture(scope="module")
def null_sf(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("null_sf")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        shutil.copy(f"{SRC}/{t}.parquet", str(out / f"{t}.parquet"))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
            "text": pa.array(TEXTS, pa.string()),
            "lang": pa.array(
                ["en", None, "en", "de", None, "en", "de"], pa.string()
            ),
            "source": pa.array(
                ["a", "a", None, "b", "b", "b", None], pa.string()
            ),
            "n_chars": pa.array(
                [len(t) if t else 0 for t in TEXTS], pa.int64()
            ),
        }
    )
    pq.write_table(tbl, str(out / "documents.parquet"))
    return str(out)


@pytest.fixture(scope="module")
def duck(null_sf):
    con = duckdb.connect()
    register_views(con, null_sf)
    yield con
    con.close()


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_doc_query_matches_oracle_on_null_corpus(spark, duck, null_sf, name):
    q = REGISTRY[name]
    sdf = q.build(spark, null_sf)
    srows = [tuple(r) for r in sdf.collect()]
    ocols, orows = duck_fetch(duck, q.oracle)
    problems = compare(sdf.columns, srows, ocols, orows)
    assert not problems, f"{name}: {problems}"


# ---------------------------------------------------------------------------
# Events with NULL value / event_type / props. Event TIME and user_id stay
# non-null (they are the engine's keys: event-time semantics and windows
# are undefined without them — and the two engines even disagree on NULL
# ordering defaults, Spark NULLS FIRST vs DuckDB NULLS LAST, so a pipeline
# must drop or repair them at ingest). Built from sf0.01 so every
# event_type group keeps >= ~100 non-null values — the documented domain
# of the approx-aggregate rank-band verdicts. This suite caught two real
# bugs when introduced: q_pivot's oracle sent NULL types nowhere (NOT IN
# is never true for NULL) while Spark bucketed them into 'other', and
# q_sketch_rollup's rollup-vs-rollup equi-join silently dropped the NULL
# event_type group (NULL != NULL) — now an eqNullSafe join.
# ---------------------------------------------------------------------------

EV_SRC = "/root/testdata/sf0.01"

EVENT_QUERIES = sorted(
    n for n, q in REGISTRY.items() if q.oracle and "events" in q.oracle
)


@pytest.fixture(scope="module")
def null_ev_sf(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("null_ev_sf")
    for t in (
        "region nation customer supplier part orders lineitem documents "
        "embeddings"
    ).split():
        shutil.copy(f"{SRC}/{t}.parquet", str(out / f"{t}.parquet"))
    ev = pq.read_table(f"{EV_SRC}/events.parquet")
    n = ev.num_rows

    def with_nulls(col, step):
        arr = ev[col].to_pylist()
        for i in range(0, n, step):
            arr[i] = None
        return pa.array(arr, ev.schema.field(col).type)

    cols = {name: ev[name] for name in ev.column_names}
    cols["value"] = with_nulls("value", 7)
    cols["event_type"] = with_nulls("event_type", 11)
    cols["props"] = with_nulls("props", 13)
    # NULL ts added late round 7: window ORDER BY ts places NULLs FIRST
    # in Spark but LAST in DuckDB, so any time-ordered event query that
    # does not pin its NULL-ts contract diverges silently — the round-7
    # analytics family filters `ts IS NOT NULL` on both engines for
    # exactly this reason, and this fixture keeps everyone honest.
    cols["ts"] = with_nulls("ts", 17)
    pq.write_table(pa.table(cols), str(out / "events.parquet"))
    return str(out)


@pytest.fixture(scope="module")
def duck_ev(null_ev_sf):
    con = duckdb.connect()
    register_views(con, null_ev_sf)
    yield con
    con.close()


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_event_query_matches_oracle_on_null_corpus(
    spark, duck_ev, null_ev_sf, name
):
    q = REGISTRY[name]
    sdf = q.build(spark, null_ev_sf)
    srows = [tuple(r) for r in sdf.collect()]
    ocols, orows = duck_fetch(duck_ev, q.oracle)
    problems = compare(sdf.columns, srows, ocols, orows)
    assert not problems, f"{name}: {problems}"


# ---------------------------------------------------------------------------
# Embeddings with NULL vectors and NULL elements. Without the shared
# validity gate (_EMB_VALID_SQL / _emb_valid) the engines cannot even be
# compared on such data: DuckDB's list_dot_product raises
# InvalidInputException outright while Spark silently NULL-propagates the
# dot into dropped comparisons. Malformed vectors are filtered identically
# on both sides. Probe/centroid ids (vec_id < 20) stay valid so the
# queries' probe sets are non-trivial.
# ---------------------------------------------------------------------------

EMB_QUERIES = sorted(
    n for n, q in REGISTRY.items() if q.oracle and "embeddings" in q.oracle
)


@pytest.fixture(scope="module")
def null_emb_sf(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("null_emb_sf")
    for t in (
        "region nation customer supplier part orders lineitem documents "
        "events"
    ).split():
        shutil.copy(f"{SRC}/{t}.parquet", str(out / f"{t}.parquet"))
    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    arr = emb["embedding"].to_pylist()
    for i in range(20, len(arr), 17):
        arr[i] = None  # whole-vector NULL
    for i in range(21, len(arr), 23):
        if arr[i]:
            arr[i] = [None if j == 3 else x for j, x in enumerate(arr[i])]
    cols = {name: emb[name] for name in emb.column_names}
    cols["embedding"] = pa.array(arr, emb.schema.field("embedding").type)
    pq.write_table(pa.table(cols), str(out / "embeddings.parquet"))
    return str(out)


@pytest.fixture(scope="module")
def duck_emb(null_emb_sf):
    con = duckdb.connect()
    register_views(con, null_emb_sf)
    yield con
    con.close()


@pytest.mark.parametrize("name", EMB_QUERIES)
def test_embed_query_matches_oracle_on_null_corpus(
    spark, duck_emb, null_emb_sf, name
):
    q = REGISTRY[name]
    sdf = q.build(spark, null_emb_sf)
    srows = [tuple(r) for r in sdf.collect()]
    ocols, orows = duck_fetch(duck_emb, q.oracle)
    problems = compare(sdf.columns, srows, ocols, orows)
    assert not problems, f"{name}: {problems}"
    assert srows, f"{name}: empty result — null fixture degenerated"
