"""Generate a 10x scale probe dataset (sf1) from the driver's sf0.1 tables.

/root/testdata is read-only and tops out at sf0.1, but the round-3 verdict
asks for a 10x scale probe (superlinearity gate). This derives sf1 into
``.scaledata/sf1`` (gitignored) by REPLICATING sf0.1 ten times with
structure-preserving transforms, so per-replica semantics — join fan-outs,
dup-cluster sizes, jaccard distributions, session shapes — are exactly
sf0.1's while global cardinalities grow 10x:

* every key column shifts by ``replica * 10_000_000`` (far above any sf0.1
  key), consistently across tables, so FK joins match only within a replica;
* document TOKENS get a per-replica suffix — a bijection on the shingle
  space, so within-replica jaccard/minhash/simhash structure is preserved
  EXACTLY while cross-replica shingle overlap is zero (naive row copies
  would create 10-way exact-dup clusters and a quadratic pair blowup the
  real sf1 would not have);
* embeddings get a per-replica dimension ROTATION — an orthogonal
  transform, so within-replica cosines are exact and cross-replica
  same-vector cosine is that of two independent random vectors;
* dims (region, nation) and timestamps stay as-is (10x events per time
  window = 10x arrival rate, which is what scaling traffic means).

Usage: python tools/make_sf1.py [target_dir]   (default: .scaledata/sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
N_REPLICAS = 10
OFF = 10_000_000  # key shift per replica; sf0.1 keys max out at ~600k

EMBED_DIM = 64


def replica_sql(table: str, i: int) -> str:
    off = i * OFF
    src = f"'{SRC}/{table}.parquet'"
    shift = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    }
    if table in shift:
        repl = ", ".join(f"{c} + {off} AS {c}" for c in shift[table])
        return f"SELECT * REPLACE ({repl}) FROM {src}"
    if table == "documents":
        if i == 0:
            return f"SELECT * FROM {src}"
        # suffix every whitespace-separated token with _<i>: a bijection on
        # tokens (and so on shingles) — jaccard structure preserved exactly
        txt = f"replace(text, ' ', '_{i} ') || '_{i}'"
        return (
            f"SELECT doc_id + {off} AS doc_id, {txt} AS text, lang, source, "
            f"length({txt}) AS n_chars FROM {src}"
        )
    if table == "embeddings":
        rot = i % EMBED_DIM
        if rot == 0:
            emb = "embedding"
        else:
            emb = (
                f"list_concat(embedding[{rot + 1}:{EMBED_DIM}], "
                f"embedding[1:{rot}])::FLOAT[]"
            )
        return (
            f"SELECT vec_id + {off} AS vec_id, {emb} AS embedding, label "
            f"FROM {src}"
        )
    raise ValueError(table)


def build_events(target: str) -> None:
    """events carries TIMESTAMP(NANOS), which DuckDB would down-convert —
    replicate via pyarrow to keep the physical type byte-identical to the
    driver's files (load_table's nanosAsLong path must keep working)."""
    t = pq.read_table(f"{SRC}/events.parquet")
    parts = []
    for i in range(N_REPLICAS):
        off = i * OFF
        parts.append(
            t.set_column(
                t.schema.get_field_index("event_id"),
                "event_id",
                pc.add(t["event_id"], off),
            ).set_column(
                t.schema.get_field_index("user_id"),
                "user_id",
                pc.add(t["user_id"], off),
            )
        )
    pq.write_table(pa.concat_tables(parts), f"{target}/events.parquet")


def main() -> None:
    target = sys.argv[1] if len(sys.argv) > 1 else ".scaledata/sf1"
    os.makedirs(target, exist_ok=True)
    con = duckdb.connect()
    for table in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{table}.parquet') "
            f"TO '{target}/{table}.parquet' (FORMAT PARQUET)"
        )
    for table in ("customer", "supplier", "part", "orders", "lineitem",
                  "documents", "embeddings"):
        union = " UNION ALL ".join(
            replica_sql(table, i) for i in range(N_REPLICAS)
        )
        con.execute(
            f"COPY ({union}) TO '{target}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{target}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")
    build_events(target)
    print(f"events: {pq.read_metadata(f'{target}/events.parquet').num_rows} rows")
    print(f"sf1 written to {target}")


if __name__ == "__main__":
    main()
