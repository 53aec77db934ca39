"""Local replica of the driver's correctness gate.

Runs every registered query at sf0.01 (override: SPARK_GRAFT_VALIDATE_SF)
on Spark AND its DuckDB oracle, compares row count + (sorted) schema +
order-insensitive value hash.

The hash is TYPE-TAGGED (int / float / Decimal / bool hash differently)
and the oracle result is fetched through Arrow — exactly like the
driver — so e.g. an uncast DuckDB ``sum(BIGINT)`` (HUGEINT → Arrow
decimal128 → Decimal) fails here the same way it fails the driver gate
instead of str()-coercing to a false pass.
Usage: python tools/validate.py [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from decimal import Decimal

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, float):
        return f"f:{v!r}"
    if isinstance(v, Decimal):
        return f"d:{v}"
    return f"{type(v).__name__}:{v}"


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\x02")
    return h.hexdigest()[:16]


def main() -> None:
    from sparkstreamingflume_spark.plans import REGISTRY
    from sparkstreamingflume_spark.session import get_session

    import os

    sf_dir = os.environ.get("SPARK_GRAFT_VALIDATE_SF", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])
    spark = get_session("validate")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = 0
    for name, q in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.build(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if q.oracle is None:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            tbl = con.execute(q.oracle).arrow()
            ocols = list(tbl.column_names)
            orows = [tuple(d[c] for c in ocols) for d in tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        elif table_hash(scols, srows) != table_hash(ocols, orows):
            problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            if sorted(scols) == sorted(ocols) and srows and orows:
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ss = sorted("\x01".join(norm_cell(r[i]) for i in order_s) for r in srows)
                oo = sorted("\x01".join(norm_cell(r[i]) for i in order_o) for r in orows)
                for a, b in zip(ss, oo):
                    if a != b:
                        print(f"  spark : {a[:200]}")
                        print(f"  duckdb: {b[:200]}")
                        break
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
