"""Isolated re-measure of the r07 bench regressions (VERDICT r07 item 3).

`a29_heavy_hitters` regressed 1.52x raw / 1.87x normalized between
rounds 6 and 7 with ZERO code changes to its source files — exceeding
the r06 "sub-1.5x uniform = host noise" ruling — and x4_bm25 /
skew1/4/5 / w30_hw_seasonal / flagship_sensor_health moved 1.2-1.4x
in the same run. The r07 hypothesis: the longer 46-query mixed bench
run (more JVM heap/codegen pressure by the time late queries run)
plus non-uniform sub-second host noise, not a plan regression.

This tool adjudicates that hypothesis the only way it can be
adjudicated: time EXACTLY the regressed set on a clean JVM with
interleaved host probes, then compare each query's normalized p50 to
its r06 band. Writes `isolated_rebench_r08` into BENCH_DETAIL.json
(merge, never overwrite — the sidecar holds other tools' sections).

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

# (name, r06 p50 from BENCH_r06.json's recorded metric line,
#        r07 p50 from the r07 BENCH_DETAIL spread)
REGRESSED = [
    ("a29_heavy_hitters", 1.41, 2.135),
    ("x4_bm25", 1.565, 2.053),
    ("skew1_salted_count", 0.374, 0.508),
    ("skew4_hot_key_count", 0.404, 0.56),
    ("skew5_hot_key_join", 0.328, 0.421),
    ("w30_hw_seasonal", 0.824, 1.102),
    ("flagship_sensor_health", 0.62, 0.795),
]
# r06 run's recorded single-core probe mean (BENCH_r06 metric line).
R06_PY_LOOP = 0.558
N_RUNS = 5


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
    for name, r06_p50, r07_p50 in REGRESSED:
        fn = qs[name]
        materialize(fn(spark, sf_dir))  # warm-up (untimed)
        runs = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        rows[name] = {
            "p50": round(statistics.median(runs), 3),
            "min": round(min(runs), 3),
            "r06_p50": r06_p50,
            "r07_p50": r07_p50,
        }
    probe_end = host_speed_probe()

    py_mean = (probe_start["py_loop_sec"] + probe_end["py_loop_sec"]) / 2
    host_ratio = py_mean / REF_PY_LOOP
    r06_ratio = R06_PY_LOOP / REF_PY_LOOP
    for name, row in rows.items():
        norm = row["p50"] / host_ratio
        r06_norm = row["r06_p50"] / r06_ratio
        row["p50_norm"] = round(norm, 3)
        row["r06_p50_norm"] = round(r06_norm, 3)
        rel = norm / r06_norm if r06_norm else float("inf")
        row["vs_r06_norm"] = round(rel, 2)
        row["verdict"] = (
            "back in r06 band (r07 swing = mixed-run noise)"
            if rel <= 1.25
            else "regression NOT noise — investigate plan/code"
        )

    section = {
        "note": (
            "clean-JVM isolated re-run of the r07 regressed set "
            f"({N_RUNS} timed runs each after warm-up); verdict "
            "compares py_loop-normalized p50 to the r06 band "
            "(<=1.25x = noise per the r06 ruling, applied to an "
            "ISOLATED run where mixed-run JVM pressure is absent)"
        ),
        "host_probe_start": probe_start,
        "host_probe_end": probe_end,
        "py_loop_mean": round(py_mean, 3),
        "queries": rows,
    }
    path = os.path.join(REPO, "BENCH_DETAIL.json")
    try:
        existing = json.load(open(path))
    except (FileNotFoundError, json.JSONDecodeError):
        existing = {}
    existing["isolated_rebench_r08"] = section
    with open(path, "w") as fh:
        json.dump(existing, fh, indent=1)
    print(json.dumps(section["queries"], indent=1))


if __name__ == "__main__":
    main()
