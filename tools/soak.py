"""Streaming stability soak: rate-source CDR replay through the full
route → mask → enrich pipeline.

Measures what BASELINE.md Table 2 row 3 asks for: sustained micro-batch
processing where p99 batch duration stays under the trigger interval
(the reference's stability criterion — a 20 s batch must clear before
the next arrives, src/StreamingSocketProcess64.scala:83).

Usage: python tools/soak.py [rows_per_second] [seconds] [mode]
mode = type61 (single-type pipeline, default) | routed (mixed 61-66
lines through the one-pass metadata-driven router) | dual (routed +
two-partner fan-out enrichment, routed_pipeline_dual — 2x output rows).
Prints one JSON line with batch-duration percentiles and sustained rate.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    rows_per_sec = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    run_s = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    mode = sys.argv[3] if len(sys.argv) > 3 else "type61"

    from pyspark.sql import functions as F

    from sparkstreamingflume_spark.schemas import RECORD_TYPES
    from sparkstreamingflume_spark.session import get_session
    from sparkstreamingflume_spark.streaming import pipeline, sources

    spark = get_session("soak")

    rate = sources.rate(spark, rows_per_second=rows_per_sec)

    def make_line(prefix: str) -> F.Column:
        rt = RECORD_TYPES[prefix]
        filler = ",".join(f"f{j}" for j in range(2, rt.n_fields))
        return F.concat_ws(
            ",",
            F.concat(F.lit(prefix + "rec"), F.col("value")),
            F.date_format("timestamp", "yyyy-MM-dd HH:mm:ss"),
            F.lit(filler),
        )

    lookup = spark.createDataFrame(
        [
            (f"f{rt.lac_idx + 1},f{rt.ci_idx + 1}", "label")
            for rt in RECORD_TYPES.values()
        ],
        ["map_key", "map_value"],
    ).dropDuplicates(["map_key"])

    if mode in ("routed", "dual"):
        # round-robin over all six record types through the one-pass
        # router; pick prefix+filler via element_at FIRST so only one
        # line is materialized per row (array(make_line x6) would build
        # all six ~500-char strings per row — generator-bound soak)
        prefixes = sorted(RECORD_TYPES)
        idx = (F.col("value") % len(prefixes) + 1).cast("int")
        pfx = F.element_at(F.array(*[F.lit(p) for p in prefixes]), idx)
        filler = F.element_at(
            F.array(
                *[
                    F.lit(
                        ",".join(
                            f"f{j}" for j in range(2, RECORD_TYPES[p].n_fields)
                        )
                    )
                    for p in prefixes
                ]
            ),
            idx,
        )
        line = F.concat_ws(
            ",",
            F.concat(pfx, F.lit("rec"), F.col("value")),
            F.date_format("timestamp", "yyyy-MM-dd HH:mm:ss"),
            filler,
        )
        lines = rate.select(line.alias("value"))
        if mode == "dual":
            transformed = pipeline.routed_pipeline_dual(
                lines, {"yaxin": lookup, "yiyang": lookup}, how="left"
            )
        else:
            transformed = pipeline.routed_pipeline(lines, lookup, how="left")
    else:
        lines = rate.select(make_line("61").alias("value"))
        transformed = pipeline.process_type(
            lines, RECORD_TYPES["61"], lookup, how="left"
        )

    q = (
        transformed.writeStream.format("noop")
        .trigger(processingTime="2 seconds")
        .start()
    )
    time.sleep(run_s)
    progress = [
        json.loads(p if isinstance(p, str) else p.json) for p in q.recentProgress
    ]
    q.stop()

    fed = [p for p in progress if p.get("numInputRows", 0) > 0]
    # the rate source accumulates rows while the query spins up, so the
    # first batches are catch-up (numInputRows >> trigger*rate) — steady
    # state is what the stability criterion is about
    steady = fed[3:] if len(fed) > 4 else fed
    durs = [p["durationMs"]["triggerExecution"] / 1000.0 for p in steady]
    rates = [p["processedRowsPerSecond"] for p in steady]
    durs.sort()
    pct = lambda q_: durs[min(len(durs) - 1, int(q_ * len(durs)))] if durs else None
    print(
        json.dumps(
            {
                "metric": "streaming_soak",
                "mode": mode,
                "rows_per_second_target": rows_per_sec,
                "trigger_s": 2,
                "batches": len(durs),
                "batch_s_p50": pct(0.5),
                "batch_s_p99": pct(0.99),
                "processed_rows_per_s_mean": (
                    round(sum(rates) / len(rates)) if rates else None
                ),
                "stable": bool(durs) and pct(0.99) < 2.0,
            }
        )
    )


if __name__ == "__main__":
    main()
