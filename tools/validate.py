"""Local replica of the driver's correctness gate.

Runs every registered query — primary AND extra — at sf0.01 (override:
SPARK_GRAFT_VALIDATE_SF) on Spark and its DuckDB oracle, comparing row
count + sorted schema + order-insensitive TYPE-TAGGED value hash (see
sparkstreamingflume_spark/oracle.py; the oracle side is fetched through
Arrow exactly like the driver, so HUGEINT/DOUBLE drift fails here too).
Usage: python tools/validate.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, ".")


def main() -> None:
    from sparkstreamingflume_spark.oracle import compare, duck_fetch, register_views
    from sparkstreamingflume_spark.plans import REGISTRY
    from sparkstreamingflume_spark.session import get_session

    sf_dir = os.environ.get("SPARK_GRAFT_VALIDATE_SF", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])
    spark = get_session("validate")

    con = duckdb.connect()
    register_views(con, sf_dir)

    n_pass = n_fail = 0
    for name, q in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        tag = " (extra)" if q.extra else ""
        t0 = time.time()
        try:
            sdf = q.build(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}{tag}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if q.oracle is None:
            print(f"ok   {name}{tag}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            ocols, orows = duck_fetch(con, q.oracle)
        except Exception as e:
            print(f"FAIL {name}{tag}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = compare(scols, srows, ocols, orows)
        if problems:
            print(f"FAIL {name}{tag}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS {name}{tag} ({len(srows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
        # drop any frame a query persisted (q_dedup_candidates_verified's
        # candidate materialization) — otherwise each build() in this loop
        # registers a fresh InMemoryRelation that lives for the session
        spark.catalog.clearCache()

    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
