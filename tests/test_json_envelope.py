"""S2 envelope-parse semantics pinned to the reference: PERMISSIVE
from_json turns malformed payloads into all-NULL structs (no
dead-letter path in the as-built system — SURVEY.md §1.3), and extra
producer fields are silently projected away by the declared schema
(weather messages carry 6 fields the schema drops — SURVEY.md §1.2).
"""

from __future__ import annotations

from eco_pulse_lakehouse_spark.streaming.pipeline import parse_json_envelope


def test_malformed_json_becomes_all_null_row(spark):
    raw = spark.createDataFrame(
        [
            ('{"lat": 40.0, "lon": -3.0, "confidence": "h"}',),
            ("{not valid json",),
            ("",),
        ],
        "value STRING",
    )
    out = parse_json_envelope(
        raw, "value", "lat DOUBLE, lon DOUBLE, confidence STRING"
    ).collect()
    assert len(out) == 3  # rows preserved, not dropped
    assert (out[0].lat, out[0].confidence) == (40.0, "h")
    assert out[1] == out[1].__class__(lat=None, lon=None, confidence=None)
    assert out[2].lat is None


def test_extra_fields_are_projected_away(spark):
    raw = spark.createDataFrame(
        [('{"lat": 1.0, "lon": 2.0, "pressure": 1013, "clouds": 40}',)],
        "value STRING",
    )
    out = parse_json_envelope(raw, "value", "lat DOUBLE, lon DOUBLE")
    assert out.columns == ["lat", "lon"]
    assert out.first().lat == 1.0
