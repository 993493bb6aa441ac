#!/usr/bin/env python
"""Re-sweep NAMED entries through tools/sf01_parity_sweep.py at the
three certified scale factors: drop their rows from each
PARITY_SWEEP_<sf>.json (the sweep resumes and recomputes only missing
entries), then invoke the sweep per SF.

Usage: python tools/resweep_touched.py entry [entry ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SFS = ["0.001", "0.01", "0.1"]


def main() -> None:
    names = sys.argv[1:]
    if not names:
        sys.exit("usage: resweep_touched.py entry [entry ...]")
    for sf in SFS:
        report = os.path.join(REPO, f"PARITY_SWEEP_{sf}.json")
        if os.path.exists(report):
            out = json.load(open(report))
            removed = [n for n in names if out.pop(n, None) is not None]
            json.dump(out, open(report, "w"), indent=1)
            print(f"sf{sf}: dropped {removed}", flush=True)
        rc = subprocess.call(
            [sys.executable, os.path.join(REPO, "tools", "sf01_parity_sweep.py"),
             f"/root/testdata/sf{sf}"],
            cwd=REPO,
        )
        if rc != 0:
            sys.exit(f"sweep at sf{sf} failed rc={rc}")
        got = json.load(open(report))
        bad = {n: got[n] for n in names if n in got and not got[n]["ok"]}
        if bad:
            sys.exit(f"sf{sf} FAIL: {json.dumps(bad)[:500]}")
        print(f"sf{sf}: {[n for n in names if n in got]} green", flush=True)


if __name__ == "__main__":
    main()
