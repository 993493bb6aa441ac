#!/usr/bin/env python
"""IVF under the documented knob-scaling discipline (round 7).

The sf1 rehearsal measured `x3_ivf_topk` once at exponent 1.46 and
annotated it as a FIXED-KNOB artifact: the entry is self-ANN with
n_centroids pinned at 16, so 10× data means 10× queries × 10× list
size. This probe records what the operator does when the knob scales
the way its docstring prescribes — n_centroids ∝ √n, so expected
list size grows only √10× — and splits the one-time INDEX BUILD from
the per-batch QUERY cost the way the persisted lifecycle
(build_ivf_index / query_ivf_index) actually amortizes it:

  - build(sf0.1, c=16)  vs build(sf1, c=50):   expect ~linear-plus
    (assignment is n·c work, c grew √10) — paid once per corpus.
  - query(100 fixed queries, n_probe=2) at both scales: expect
    SUBLINEAR (candidates per query = n_probe · n/c grows only √10).

Writes BENCH_DETAIL.json["sf1_rehearsal"]["ivf_knob_scaling"].
Requires the rehearsal's 10× build under /tmp (run
tools/sf1_rehearsal.py first — its _BUILT markers are reused).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sf1_rehearsal import DST, stage_01  # noqa: E402  (same /tmp corpus)


def _time(fn, runs: int = 3) -> float:
    fn()  # warm
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return round(ts[len(ts) // 2], 3)


def main() -> None:
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from eco_pulse_lakehouse_spark.catalog import load_table
    from eco_pulse_lakehouse_spark.operators import similarity as xs
    from eco_pulse_lakehouse_spark.session import get_session

    spark = get_session("ivf-knob-probe")
    s01 = stage_01(spark)
    out: dict = {}
    for tag, sf_dir, cents in (("sf0.1", s01, 16), ("sf1", DST, 50)):
        e = load_table(spark, sf_dir, "embeddings")
        n = e.count()
        path = os.path.join(
            tempfile.gettempdir(), f"eco_pulse_ivfprobe_{uuid.uuid4().hex}"
        )
        build_sec = _time(
            lambda: xs.build_ivf_index(
                e, path, n_centroids=cents
            ),
            runs=1,
        )
        queries = e.filter(F.col("vec_id") < 100).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        )

        def _q():
            xs.query_ivf_index(
                spark, path, queries, k=10, n_probe=2
            ).write.format("noop").mode("overwrite").save()

        out[tag] = {
            "n_vectors": n,
            "n_centroids": cents,
            "expected_list_size": round(n / cents),
            "build_sec_once": build_sec,
            "query100_sec_median": _time(_q),
        }
    b0, b1 = out["sf0.1"]["build_sec_once"], out["sf1"]["build_sec_once"]
    q0, q1 = (
        out["sf0.1"]["query100_sec_median"],
        out["sf1"]["query100_sec_median"],
    )
    out["build_exponent"] = round(math.log(b1 / b0) / math.log(10), 2)
    out["query_exponent"] = round(math.log(q1 / q0) / math.log(10), 2)
    out["note"] = (
        "knob-scaled counterpart of the fixed-knob x3_ivf_topk "
        "rehearsal artifact: n_centroids grows ~sqrt(10)x with the "
        "corpus (16 -> 50), the persisted lifecycle splits the "
        "one-time n*c build from the per-batch query whose candidate "
        "set grows only n/c"
    )

    detail_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_DETAIL.json",
    )
    try:
        detail = json.load(open(detail_path))
    except FileNotFoundError:
        detail = {}
    except (json.JSONDecodeError, UnicodeDecodeError):
        os.replace(detail_path, detail_path + ".corrupt")
        print(
            f"WARNING: unparseable sidecar backed up to "
            f"{detail_path}.corrupt",
            flush=True,
        )
        detail = {}
    detail.setdefault("sf1_rehearsal", {})["ivf_knob_scaling"] = out
    json.dump(detail, open(detail_path, "w"), indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
