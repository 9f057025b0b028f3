"""Multi-format transcript sources (SURVEY S4).

The reference ingests documents/evidence from many formats through
per-format handlers that all converge on one internal shape
(/root/reference/ingestion/scripts/document_processing.py dispatch;
cellebrite XML -> models -> writer). The Spark analog: every supported
format is read through the native DataFrameReader (so pushdown/pruning and
the streaming file source keep working) and normalized to the ONE
transcript contract the pipeline consumes:

    (conv_id string, turn_idx int, role string, text string,
     tool string, ts timestamp)

Unknown columns are dropped, missing optional columns become NULL, required
columns raise — loudly at plan time, not deep inside extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPT_COLS: dict[str, str] = {
    "conv_id": "string",
    "turn_idx": "int",
    "role": "string",
    "text": "string",
    "tool": "string",
    "ts": "timestamp",
}
_REQUIRED = ("conv_id", "turn_idx", "text")

# For self-describing formats (parquet/orc/json) Spark infers the schema;
# csv gets the contract schema up front so types don't arrive as strings.
_CSV_SCHEMA = ", ".join(f"{c} {t}" for c, t in TRANSCRIPT_COLS.items())


def read_transcripts(spark: SparkSession, path: str,
                     fmt: str = "parquet") -> DataFrame:
    """Read transcripts from ``path`` in any supported format and coerce to
    the transcript contract. fmt: parquet | json (jsonlines) | csv | orc."""
    fmt = fmt.lower()
    if fmt == "parquet":
        raw = spark.read.parquet(path)
    elif fmt in ("json", "jsonl"):
        raw = spark.read.json(path)
    elif fmt == "csv":
        raw = spark.read.csv(path, header=True, schema=_CSV_SCHEMA)
    elif fmt == "orc":
        raw = spark.read.orc(path)
    else:
        raise ValueError(f"unsupported transcript format: {fmt!r}")
    return normalize_to_contract(raw)


def normalize_to_contract(raw: DataFrame) -> DataFrame:
    """Project any column superset/subset onto the transcript contract:
    cast known columns, add missing optional ones as NULL, drop extras,
    and fail fast if a required column is absent."""
    present = set(raw.columns)
    missing_required = [c for c in _REQUIRED if c not in present]
    if missing_required:
        raise ValueError(
            f"transcript source is missing required columns: {missing_required}")
    cols = []
    for name, typ in TRANSCRIPT_COLS.items():
        if name in present:
            cols.append(F.col(name).cast(typ).alias(name))
        else:
            cols.append(F.lit(None).cast(typ).alias(name))
    return raw.select(*cols)
