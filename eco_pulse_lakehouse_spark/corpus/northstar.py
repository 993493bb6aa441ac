"""North-star corpus — X1-X5 (filled in incrementally)."""

from __future__ import annotations

from eco_pulse_lakehouse_spark.corpus._registry import make_registry

QUERIES, ORACLES, q = make_registry()
