#!/usr/bin/env python
"""Headline benchmark — BASELINE.md §2 protocol.

Runs the flagship pipeline plus representative corpus queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], 1 untimed warm-up + median of 3 timed runs
per query, full materialization through the noop sink (no driver
collect). Prints exactly ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship_gold_risk",      # window → range join → CASE → project
    "a7_summary",              # TPC-H Q1 shape: 2-key groupBy, 7 aggs
    "j3_equi_join_3way",       # broadcast dim + shuffle fact joins
    "j2_range_join_grid",      # bucketed theta join (the 100 TB form)
    "w1_latest_per_key",       # ranking window
    "w6_running_sum",          # frame window
    "x1_hash_dedup_key",       # sha256 content keys
    "x2_minhash_lsh",          # shingle → minhash → banded LSH join
    "x3_cosine_topk",          # brute-force vector top-k
    "x4_text_stats",           # tokenize/array analytics
    "tpch_q1",                 # SQL API: scan + 7-agg summary
    "tpch_q5",                 # SQL API: 5-way star join rollup
    "t5_stream_dedup",         # streaming watermark+dedup drain
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from eco_pulse_lakehouse_spark.session import get_session

    spark = get_session("eco-pulse-bench")

    import __spark_entry__ as entry

    qs = entry.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        materialize(fn(spark, sf_dir))  # warm-up (untimed)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_corpus_median_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
