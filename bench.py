"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Timing excludes session startup; each query is materialized with the
no-op sink (full execution, zero driver-collect overhead). First run's
numbers are the BASELINE.md Table 2 reference; subsequent rounds must
stay within 2x.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from sparkstreamingflume_spark.plans import REGISTRY
    from sparkstreamingflume_spark.session import DEFAULT_SF_DIR, get_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_session("bench")

    names = sorted(n for n, q in REGISTRY.items() if q.bench)
    # Warm the JVM + file listing once so per-query numbers measure the
    # query, not first-touch costs.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    for name in names:
        q = REGISTRY[name]
        t0 = time.time()
        q.build(spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_clock_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
