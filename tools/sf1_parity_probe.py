#!/usr/bin/env python
"""Value-exact oracle parity at the SYNTHESIZED 10x (sf1) scale for
a chosen entry subset — the first parity point beyond sf0.1.

The sf1 rehearsal (tools/sf1_rehearsal.py) measures scaling
EXPONENTS at /tmp/eco_pulse_sf1_v3 but never value-checks; the three
certified parity scales all sit at or below the bench scale. This
probe runs the full driver-style triple (rows + schema + value hash,
tests/parity.py compare) at sf1 for entries whose 10x oracle cost is
tractable — the DuckDB side re-executes the oracle SQL on the 10x
parquet, so closure-heavy families can take tens of minutes; pick
the subset deliberately and run with a timeout.

DuckDB views are built directory-aware (Spark writes fact tables as
part-file directories at sf1; read_parquet needs the glob form).

Run: python tools/sf1_parity_probe.py [entry ...]
     (default: a linear-oracle basket across the operator families)
Requires /tmp/eco_pulse_sf1_v3 to exist (run sf1_rehearsal.py first,
or any --only invocation — it stages the build markers).
Prints one JSON line; merges "sf1_parity_probe" into
BENCH_DETAIL.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SF1 = "/tmp/eco_pulse_sf1_v3"

# Measured limit (r13): the n-gram closure family's oracle (the
# shingle-pair CTE the x2 cluster entries share) did NOT finish in
# 60 min of DuckDB CPU at sf1 (sf0.1 cost was ~13 min, so 10x is
# super-linear on the oracle side even though the ENGINE side ran
# in 7.5 s — the certified sf0.1 triple stays the closure family's
# parity scale). Default basket = linear-oracle entries spanning
# the operator families: dedup keep-first, quality scoring, window
# latest-per-key, group-by, TPC-H pricing, hash split, text stats,
# top-k, DSIR weights, int8 quantized ANN.
DEFAULT_ENTRIES = [
    "x1_exact_dedup",
    "x4_quality_score",
    "w1_latest_per_key",
    "a4_groupby_count",
    "tpch_q1",
    "x6_hash_split",
    "x4_text_stats",
    "o3_topk_orders",
    "x6_dsir_weights",
    "x3_quantized_topk",
]


def sf1_con():
    import duckdb

    from eco_pulse_lakehouse_spark.catalog import TABLES, table_path

    con = duckdb.connect()
    for t in TABLES:
        p = table_path(SF1, t)
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})"
        )
    return con


def main() -> None:
    entries = sys.argv[1:] or DEFAULT_ENTRIES
    if not os.path.isdir(SF1):
        raise SystemExit(f"{SF1} missing — run tools/sf1_rehearsal.py first")

    from parity import compare

    from eco_pulse_lakehouse_spark import corpus
    from eco_pulse_lakehouse_spark.session import get_session

    spark = get_session("sf1-parity-probe", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    qs = corpus.queries()
    osql = corpus.oracle_sql()
    con = sf1_con()

    out = {}
    for name in entries:
        t0 = time.perf_counter()
        spark_pdf = qs[name](spark, SF1).toPandas()
        t_spark = time.perf_counter() - t0
        t0 = time.perf_counter()
        oracle_pdf = con.execute(osql[name]).df()
        t_oracle = time.perf_counter() - t0
        r = compare(name, spark_pdf, oracle_pdf)
        out[name] = {
            "ok": r.ok,
            "detail": r.detail,
            "spark_rows": int(len(spark_pdf)),
            "oracle_rows": int(len(oracle_pdf)),
            "spark_sec": round(t_spark, 2),
            "oracle_sec": round(t_oracle, 2),
        }
        print(name, json.dumps(out[name]), flush=True)
        # release pins between entries (the bench hygiene contract)
        try:
            from bench import release_cached_state

            release_cached_state(spark)
        except Exception:
            pass

    n_green = sum(1 for v in out.values() if v["ok"])
    section = {
        "sf_dir": SF1,
        "note": (
            "driver-style rows+schema+value-hash parity at the "
            "synthesized 10x scale (sf1_rehearsal build) — the first "
            "value-exact certification point above sf0.1"
        ),
        "entries": out,
        "green": n_green,
        "checked": len(out),
    }
    path = os.path.join(REPO, "BENCH_DETAIL.json")
    try:
        existing = json.load(open(path))
    except (FileNotFoundError, json.JSONDecodeError):
        existing = {}
    existing["sf1_parity_probe"] = section
    with open(path, "w") as fh:
        json.dump(existing, fh, indent=1)
    print(json.dumps({
        "metric": "sf1_parity_probe",
        "checked": len(out),
        "green": n_green,
    }))


if __name__ == "__main__":
    main()
