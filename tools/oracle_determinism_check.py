"""Cross-run determinism harness for every oracle (round 8).

Why this exists: DuckDB 1.0.0 (pinned in this image) evaluated the
first, fold-based draft of the x4_sp_unigram oracle
NONDETERMINISTICALLY at threads>1 — three consecutive runs returned
three different segmentations at sf0.001, stable at threads=1. That
draft nested list_transform/list_filter/list_aggregate recurrences
INSIDE a list_reduce body; the shipped oracle is a fully relational
unrolled DP instead. Minimal reproductions of the individual
constructs (body-nested lambdas, struct accumulator lists,
variable-length captured columns) did NOT reproduce the bug in
isolation, so the precise trigger is unknown — which is exactly why
this harness exists: it runs EVERY registered oracle twice in fresh
default-threaded connections and compares canonicalized result
hashes, so any latent evaluation nondeterminism surfaces as a named
mismatch instead of a random red driver row.

Round-8 result: 308/308 oracles identical across passes, 0 errors.

Run: python tools/oracle_determinism_check.py [sf_dir]
(DuckDB-only — safe to run alongside a Spark job.)
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def run_all(osql: dict[str, str], sf_dir: str) -> dict[str, str]:
    import duckdb

    out: dict[str, str] = {}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    for name, sql in osql.items():
        try:
            rows = con.execute(sql).fetchall()
            canon = sorted(repr(r) for r in rows)
            out[name] = hashlib.sha256(
                "\n".join(canon).encode()
            ).hexdigest()
        except Exception as ex:  # noqa: BLE001 — report, don't abort
            out[name] = f"ERR:{str(ex)[:120]}"
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as entry

    osql = entry.oracle_sql()
    a = run_all(osql, sf_dir)
    b = run_all(osql, sf_dir)
    diff = sorted(k for k in a if a[k] != b.get(k))
    errs = sorted(k for k in a if str(a[k]).startswith("ERR"))
    print(
        json.dumps(
            {
                "metric": "oracle_determinism",
                "sf_dir": sf_dir,
                "oracles": len(a),
                "cross_run_mismatches": diff,
                "errors": errs,
            }
        )
    )


if __name__ == "__main__":
    main()
