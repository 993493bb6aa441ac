"""One-off audit: flag corpus entries whose output schema contains a
top-level array/map column — the driver's pandas canonicalizer cannot
hash those (round-2 verdict: `unhashable type: 'list'`).

Run: python tools/audit_array_outputs.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as Ty

from eco_pulse_lakehouse_spark import corpus
from eco_pulse_lakehouse_spark.session import get_session


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session()
    qs = corpus.queries()
    oracles = corpus.oracle_sql()
    bad, errs = [], []
    for name, fn in qs.items():
        if name not in oracles:
            continue  # rows-only: the driver never canonicalizes these
        try:
            df = fn(spark, sf_dir)
        except Exception:
            errs.append((name, traceback.format_exc(limit=1)))
            continue
        offending = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (Ty.ArrayType, Ty.MapType))
        ]
        if offending:
            bad.append((name, offending))
            print(f"ARRAY {name}: {offending}", flush=True)
    print("----")
    for name, tb in errs:
        print(f"ERR {name}\n{tb}")
    print(f"checked={sum(1 for n in qs if n in oracles)} "
          f"array_valued={len(bad)} errors={len(errs)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
