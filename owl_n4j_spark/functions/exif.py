"""EXIF metadata converters (SURVEY S3/F11) as pure column expressions.

Re-derives (from observed behavior, not code copy) the reference's media
metadata converters — /root/reference/ingestion/scripts/cellebrite/parser.py:
``_exif_dt_to_iso`` (:33-51), ``_us_dt_to_iso`` (:53-60),
``_exif_gps_to_decimal`` (:63-77) — as column expressions so metadata
normalization for a media table runs inside whole-stage codegen, never a
per-row UDF. All converters are null-tolerant: malformed input yields NULL
(the reference returns None), keeping the quarantine accounting downstream.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def exif_dt_to_iso(c: Column) -> Column:
    """'2021:07:29 15:06:15' -> '2021-07-29T15:06:15'; date-only inputs
    ('2021:07:29') pass through as '2021-07-29'; < 10 chars -> NULL.
    Fractional/subsecond suffixes beyond char 19 are ignored."""
    s = F.trim(c)
    date_part = F.translate(F.substring(s, 1, 10), ":", "-")
    return (
        F.when(s.isNull() | (F.length(s) < 10), F.lit(None).cast("string"))
        .when(F.length(s) >= 19,
              F.concat(date_part, F.lit("T"), F.substring(s, 12, 8)))
        .otherwise(date_part)
    )


def us_dt_to_iso(c: Column) -> Column:
    """US-locale '7/29/2021 3:06:15 PM' -> '2021-07-29T15:06:15';
    unparseable -> NULL (the EXIFCaptureTime format)."""
    ts = F.try_to_timestamp(F.trim(c), F.lit("M/d/yyyy h:mm:ss a"))
    return F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss")


def exif_gps_to_decimal(coord: Column, ref: Column) -> Column:
    """Sexagesimal '38, 59, 20' + ref 'N'/'S'/'E'/'W' -> signed decimal
    degrees. NULL when fewer than 3 comma parts or ANY part is non-numeric
    (the reference parses every part before slicing, so a bad 4th part
    also nulls the value)."""
    arr = F.transform(F.split(coord, ","),
                      lambda x: F.trim(x).try_cast("double"))
    bad = F.exists(arr, lambda x: x.isNull())
    dec = (F.element_at(arr, 1)
           + F.element_at(arr, 2) / 60.0
           + F.element_at(arr, 3) / 3600.0)
    signed = F.when(F.upper(F.trim(ref)).isin("S", "W"), -dec).otherwise(dec)
    return F.when(coord.isNull() | (F.size(arr) < 3) | bad,
                  F.lit(None).cast("double")).otherwise(signed)
