"""EXIF converter columns (functions/exif.py) vs the reference's observed
behavior (cellebrite/parser.py:33-77): datetime reshaping, US-locale parse,
sexagesimal GPS with hemisphere sign, and the null paths."""

import pytest
from pyspark.sql import functions as F

from owl_n4j_spark.functions.exif import (
    exif_dt_to_iso,
    exif_gps_to_decimal,
    us_dt_to_iso,
)


def _one(spark, col_fn, *vals):
    df = spark.createDataFrame([vals], ", ".join(
        f"c{i} string" for i in range(len(vals))))
    cols = [F.col(f"c{i}") for i in range(len(vals))]
    return df.select(col_fn(*cols).alias("r")).collect()[0]["r"]


@pytest.mark.parametrize("raw, want", [
    ("2021:07:29 15:06:15", "2021-07-29T15:06:15"),
    ("2021:07:29 15:06:15.123", "2021-07-29T15:06:15"),  # subsec ignored
    ("2021:07:29", "2021-07-29"),                        # date-only
    ("  2021:07:29 15:06:15 ", "2021-07-29T15:06:15"),   # trimmed
    ("short", None),
    ("", None),
    (None, None),
])
def test_exif_dt(spark, raw, want):
    assert _one(spark, exif_dt_to_iso, raw) == want


@pytest.mark.parametrize("raw, want", [
    ("7/29/2021 3:06:15 PM", "2021-07-29T15:06:15"),
    ("12/01/2021 11:59:59 AM", "2021-12-01T11:59:59"),
    ("7/29/2021 12:00:00 AM", "2021-07-29T00:00:00"),
    ("not a date", None),
    (None, None),
])
def test_us_dt(spark, raw, want):
    assert _one(spark, us_dt_to_iso, raw) == want


@pytest.mark.parametrize("coord, ref, want", [
    ("38, 59, 20", "N", 38 + 59 / 60 + 20 / 3600),
    ("38, 59, 20", "S", -(38 + 59 / 60 + 20 / 3600)),
    ("77, 0, 32.4", "W", -(77 + 32.4 / 3600)),
    ("77, 0, 32.4", None, 77 + 32.4 / 3600),   # no ref -> positive
    ("38, 59", "N", None),                     # < 3 parts
    ("38, 59, xx", "N", None),                 # bad part
    ("38, 59, 20, yy", "N", None),             # bad EXTRA part also nulls
    ("", "N", None),
    (None, "N", None),
])
def test_gps(spark, coord, ref, want):
    got = _one(spark, exif_gps_to_decimal, coord, ref)
    if want is None:
        assert got is None
    else:
        assert got == pytest.approx(want, abs=1e-9)


def test_normalize_exif_metadata_end_to_end(spark):
    from owl_n4j_spark.operators.multimodal import normalize_exif_metadata
    meta = spark.createDataFrame(
        [("m-1", "2021:07:29 15:06:15", "7/29/2021 3:06:15 PM",
          "38, 59, 20", "N", "77, 0, 32.4", "W"),
         ("m-2", "bad", None, "38, 59", "N", None, None)],
        "media_id string, exif_dt string, capture_time_us string, "
        "gps_lat string, gps_lat_ref string, gps_lon string, gps_lon_ref string")
    rows = {r["media_id"]: r for r in normalize_exif_metadata(meta).collect()}
    r1 = rows["m-1"]
    assert r1["taken_at"] == "2021-07-29T15:06:15"
    assert r1["captured_at"] == "2021-07-29T15:06:15"
    assert round(r1["lat"], 6) == round(38 + 59 / 60 + 20 / 3600, 6)
    assert round(r1["lon"], 6) == -round(77 + 32.4 / 3600, 6)
    r2 = rows["m-2"]
    assert r2["taken_at"] is None and r2["lat"] is None and r2["lon"] is None
