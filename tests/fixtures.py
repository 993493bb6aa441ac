"""Domain fixtures pinned to the reference's schemas and value domains
(FIXTURES.md; fire_risk_processor.py:25-45, nasa_producer.py:37-44,
weather_producer.py:67-76). Deterministic — no RNG: boundary values
are placed explicitly so every CASE branch and threshold edge is
exercised (SURVEY.md §7.4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

FIRE_SCHEMA = (
    "source STRING, region STRING, lat DOUBLE, lon DOUBLE, "
    "temp_k DOUBLE, confidence STRING, timestamp DOUBLE"
)

WEATHER_SCHEMA = (
    "source STRING, location_id STRING, lat DOUBLE, lon DOUBLE, "
    "wind_speed DOUBLE, wind_deg DOUBLE, humidity DOUBLE, "
    "temperature DOUBLE, timestamp DOUBLE"
)

T0 = 1_700_000_000.0  # fixed epoch base


def fire_events(spark: SparkSession) -> DataFrame:
    """Fires placed at known offsets from station (40.0, -3.0):
    distances 0.0, 5.0, 19.99, 20.0 (boundary: excluded by `< 20`),
    25.0; confidences h/n/l."""
    rows = [
        ("NASA_VIIRS", "peninsula", 40.0, -3.0, 330.0, "h", T0 + 10),
        ("NASA_VIIRS", "peninsula", 45.0, -3.0, 320.0, "h", T0 + 20),   # d=5
        ("NASA_VIIRS", "peninsula", 40.0, 16.99, 310.0, "h", T0 + 30),  # d=19.99
        ("NASA_VIIRS", "peninsula", 60.0, -3.0, 305.0, "h", T0 + 40),   # d=20 → OUT
        ("NASA_VIIRS", "canarias", 40.0, 22.0, 350.0, "n", T0 + 50),    # d=25 → OUT
        ("NASA_VIIRS", "canarias", 41.0, -3.0, 340.0, "n", T0 + 60),    # d=1
        ("NASA_VIIRS", "canarias", 40.0, -4.0, 300.0, "l", T0 + 70),    # d=1
    ]
    return spark.createDataFrame(rows, FIRE_SCHEMA)


def weather_events(spark: SparkSession) -> DataFrame:
    """One station at (40, -3) with 3 readings (latest wins: the
    T0+300 row carries the boundary measures wind=30, temp=303.15,
    humidity=30 → EXTREME for h-fires), plus a far station."""
    rows = [
        ("OpenWeather", "Madrid_Centro", 40.0, -3.0, 10.0, 90.0, 50.0, 290.0, T0 + 100),
        ("OpenWeather", "Madrid_Centro", 40.0, -3.0, 20.0, 90.0, 40.0, 280.0, T0 + 200),
        ("OpenWeather", "Madrid_Centro", 40.0, -3.0, 30.0, 90.0, 30.0, 303.15, T0 + 300),
        ("OpenWeather", "Lejano_Oeste", 0.0, -80.0, 55.0, 10.0, 10.0, 310.0, T0 + 100),
    ]
    return spark.createDataFrame(rows, WEATHER_SCHEMA)
