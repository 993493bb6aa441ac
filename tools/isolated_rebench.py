"""Isolated clean-JVM re-measure of bench swings (the r08 protocol,
generalized for reuse each round).

The r06 ruling: sub-1.5x UNIFORM normalized swings across unrelated
queries are host noise (this hypervisor throttles 35-50% under
all-core load, non-uniformly on sub-second queries). Anything above
the band must be adjudicated on a clean JVM with interleaved host
probes and UNTOUCHED CONTROL queries timed in the same JVM: if the
suspects return to their old band (or inflate no more than the
controls do), the swing was mixed-run/host state; if a suspect stays
inflated while controls sit at their records, it's a real plan/code
regression.

Round 10 target set (VERDICT r09 item 2): the three >1.5x normalized
r08->r09 swings — none had code changes in r09:
  x4_rrf_fusion   2.133 -> 4.221 raw (1.71x normalized)
  x1_soft_dedup   0.395 -> 0.905 raw (1.98x normalized; sub-second —
                  the class the r07 notes say spikes 3x under a
                  degraded probe)
  w30_hw_seasonal 0.853 -> 1.611 raw (1.63x normalized)
Controls (no code changes either; r09 swings all inside the band):
  x4_bm25 (shares _BM25_CTES with rrf — if rrf lost the shared-CTE
  reuse, bm25 would NOT show it, isolating a plan defect), tpch_q1,
  tpch_q3, a7_summary.

Writes `isolated_rebench_r10` into BENCH_DETAIL.json (merge, never
overwrite — the sidecar holds other tools' sections).

Run:  python tools/isolated_rebench.py    (never alongside another
Spark JVM — memory: env-gates-and-testdata)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import (  # noqa: E402
    REF_PY_LOOP,
    host_speed_probe,
    materialize,
    stage_silver,
)

# (name, is_suspect, r08 shipped p50, r09 shipped p50) — raw seconds
# from the BENCH_r08/BENCH_r09 metric lines.
QUERIES = [
    ("x4_rrf_fusion", True, 2.133, 4.221),
    ("x1_soft_dedup", True, 0.395, 0.905),
    ("w30_hw_seasonal", True, 0.853, 1.611),
    ("x4_bm25", False, 1.908, 2.101),
    ("tpch_q1", False, 0.251, 0.312),
    ("tpch_q3", False, 0.816, 0.864),
    ("a7_summary", False, 0.357, 0.513),
]
# The recorded single-core probe means of those runs (their
# "py_loop_sec" fields), for normalizing the shipped records.
R08_PY_LOOP = 0.467
R09_PY_LOOP = 0.541
N_RUNS = 5
SECTION = "isolated_rebench_r10"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    probe_start = host_speed_probe()

    from eco_pulse_lakehouse_spark.session import get_session

    spark = get_session("eco-pulse-isolated-rebench")
    import __spark_entry__ as entry

    qs = entry.queries()
    sf_dir, _ = stage_silver(spark, sf_dir)

    from eco_pulse_lakehouse_spark.catalog import ensure_silver_database

    ensure_silver_database(spark, sf_dir)

    rows: dict[str, dict] = {}
    for name, suspect, r08_p50, r09_p50 in QUERIES:
        fn = qs[name]
        materialize(fn(spark, sf_dir))  # warm-up (untimed)
        runs = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        rows[name] = {
            "suspect": suspect,
            "p50": round(statistics.median(runs), 3),
            "min": round(min(runs), 3),
            "r08_p50": r08_p50,
            "r09_p50": r09_p50,
        }
    probe_mid = host_speed_probe()

    # second timed pass interleaved after the mid probe, so each
    # query gets measurements under two host states
    for name, *_ in QUERIES:
        fn = qs[name]
        runs = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        rows[name]["p50_pass2"] = round(statistics.median(runs), 3)
    probe_end = host_speed_probe()

    py_mean = statistics.mean(
        [
            probe_start["py_loop_sec"],
            probe_mid["py_loop_sec"],
            probe_end["py_loop_sec"],
        ]
    )
    host_ratio = py_mean / REF_PY_LOOP
    for name, row in rows.items():
        best_p50 = min(row["p50"], row["p50_pass2"])
        norm = best_p50 / host_ratio
        r08_norm = row["r08_p50"] / (R08_PY_LOOP / REF_PY_LOOP)
        r09_norm = row["r09_p50"] / (R09_PY_LOOP / REF_PY_LOOP)
        row["p50_norm"] = round(norm, 3)
        row["r08_p50_norm"] = round(r08_norm, 3)
        row["r09_p50_norm"] = round(r09_norm, 3)
        row["vs_r08_norm"] = round(norm / r08_norm, 2)
        row["vs_r09_norm"] = round(norm / r09_norm, 2)

    ctrl_inflation = max(
        row["vs_r08_norm"] for row in rows.values() if not row["suspect"]
    )
    for name, row in rows.items():
        if not row["suspect"]:
            row["verdict"] = "control"
        elif row["vs_r08_norm"] <= 1.25:
            row["verdict"] = (
                "back in r08 band — r09 swing was host/mixed-run noise"
            )
        elif row["vs_r08_norm"] <= ctrl_inflation * 1.25:
            row["verdict"] = (
                "inflation bounded by simultaneously-measured control "
                f"inflation ({ctrl_inflation}x) — host-state ruling"
            )
        else:
            row["verdict"] = "regression NOT noise — investigate plan/code"

    section = {
        "note": (
            "clean-JVM isolated re-run of the three >1.5x r08->r09 "
            f"normalized swings + 4 untouched controls ({N_RUNS} timed "
            "runs x 2 interleaved passes each after warm-up; best-pass "
            "p50, 3-probe mean normalization); suspect verdicts compare "
            "to the r08 record band, bounded by control inflation"
        ),
        "host_probe_start": probe_start,
        "host_probe_mid": probe_mid,
        "host_probe_end": probe_end,
        "py_loop_mean": round(py_mean, 3),
        "control_inflation_max": ctrl_inflation,
        "queries": rows,
    }
    path = os.path.join(REPO, "BENCH_DETAIL.json")
    try:
        existing = json.load(open(path))
    except (FileNotFoundError, json.JSONDecodeError):
        existing = {}
    existing[SECTION] = section
    with open(path, "w") as fh:
        json.dump(existing, fh, indent=1)
    print(json.dumps(section["queries"], indent=1))


if __name__ == "__main__":
    main()
