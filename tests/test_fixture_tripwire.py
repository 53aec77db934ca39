"""Fixture schema-drift tripwire.

The driver regenerates /root/testdata per round and has changed column
encodings twice already (r2: HUGEINT casts; r4: events.ts went from legacy
TIMESTAMP(NANOS)-as-long to plain timestamp[us], silently breaking every
events-backed query at analysis time). This test loads every table at every
shipped SF dir through the SAME ``load_table`` path the queries use and
asserts the post-load Spark dtypes, so the next driver-side regeneration
fails as ONE readable assert instead of 30 scattered runtime errors.
"""

from __future__ import annotations

import os

import pytest

SF_DIRS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1") if os.path.isdir(d)]

# expected Spark simpleString dtypes AFTER load_table normalization.
# events.ts must come out session-tz "timestamp" regardless of the parquet
# encoding: legacy nanos-as-long is truncated to micros and re-tagged, and
# a timestamp[us] (read as timestamp_ntz) is cast to timestamp — both
# normalizations happen inside load_table.
EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": ("timestamp", "timestamp_ntz"),
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": ("timestamp", "timestamp_ntz"),
    },
    "events": {
        "event_id": "bigint",
        # load_table NORMALIZES ts to session-tz TIMESTAMP whatever the
        # parquet encoding (legacy nanos-as-long or timestamp[us]) — the
        # query surface does unix_micros/window arithmetic on it.
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=[d.rsplit("/", 1)[-1] for d in SF_DIRS])
def test_fixture_schemas_match_expectations(spark, sf_dir):
    from sparkstreamingflume_spark.session import load_table

    problems = []
    for table, want_cols in EXPECTED.items():
        try:
            df = load_table(spark, sf_dir, table)
        except Exception as exc:  # noqa: BLE001 — report, don't crash the sweep
            problems.append(f"{sf_dir}/{table}: load_table raised {type(exc).__name__}: {exc}")
            continue
        got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        for col, want in want_cols.items():
            accepted = want if isinstance(want, tuple) else (want,)
            actual = got.get(col)
            if actual not in accepted:
                problems.append(
                    f"{sf_dir}/{table}.{col}: expected one of {accepted}, got {actual!r} "
                    f"— the driver likely regenerated fixtures with a new encoding; "
                    f"update load_table (session.py) and this tripwire together"
                )
        extra = set(got) - set(want_cols)
        missing = set(want_cols) - set(got)
        if extra or missing:
            problems.append(f"{sf_dir}/{table}: extra columns {sorted(extra)}, missing {sorted(missing)}")
    assert not problems, "FIXTURE SCHEMA DRIFT DETECTED:\n" + "\n".join(problems)


def test_events_legacy_nanos_encoding_still_loads(spark, tmp_path):
    """The other branch of load_table: a legacy nanos-as-long events file
    must still come out with a timestamp ts equal to the micros truncation."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sparkstreamingflume_spark.session import load_table

    nanos = 1_700_000_000_123_456_789  # exceeds 2^53: float division would corrupt it
    tbl = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([nanos], pa.int64()),
            "user_id": pa.array([7], pa.int64()),
            "event_type": pa.array(["click"], pa.string()),
            "value": pa.array([1.5], pa.float64()),
            "props": pa.array(["{}"], pa.string()),
        }
    )
    d = tmp_path / "legacy"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    df = load_table(spark, str(d), "events")
    assert df.schema["ts"].dataType.simpleString().startswith("timestamp")
    from pyspark.sql import functions as F

    [row] = df.select(F.unix_micros("ts").alias("us")).collect()
    # integer truncation to micros, not rounding
    assert row.us == nanos // 1000


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_fixture_embeddings_are_unroll_dim_wide(spark, sf_dir):
    """ADVICE r13 #3: the codegen-unrolled dot (_cos_ppm_unrolled) only
    fires for vectors exactly _UNROLL_DIM wide — any other width takes
    the exact-but-interpreted fold branch SILENTLY. If the driver ever
    regenerates fixtures with a different embedding width, the measured
    ~3x knn win would evaporate with no failure anywhere; this tripwire
    turns that into one readable assert (the unroll is still CORRECT at
    any width — this is a performance pin, not a semantics pin)."""
    from pyspark.sql import functions as F

    from sparkstreamingflume_spark.plans.extension_queries import (
        _UNROLL_DIM,
        _emb_valid,
    )
    from sparkstreamingflume_spark.session import load_table

    widths = (
        _emb_valid(load_table(spark, sf_dir, "embeddings"))
        .select(F.size("embedding").alias("w"))
        .distinct()
        .collect()
    )
    assert [r.w for r in widths] == [_UNROLL_DIM], (
        f"{sf_dir}: embedding widths {sorted(r.w for r in widths)} != "
        f"[{_UNROLL_DIM}] — every vector now takes _cos_ppm_unrolled's "
        "interpreted fold branch; re-measure the knn family and adjust "
        "_UNROLL_DIM (extension_queries.py) if the fixture width moved"
    )
