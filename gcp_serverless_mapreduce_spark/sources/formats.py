"""Text-based source formats (JSON lines, CSV) — the landing-zone
ingestion surface next to the parquet fixtures and the Gutenberg text
source (sources/text.py).

The reference reads exactly one format (``.txt`` objects —
storage/client.go:80); a general engine also ingests the interchange
formats pipelines actually land: schema-explicit (a stream/text source
cannot infer without an extra pass), with explicit timestamp formats so
MICROSECOND precision survives the text roundtrip (Spark's JSON/CSV
default prints milliseconds — a silent 1000x precision loss).

Scale notes: both readers split files and push column pruning; CSV/JSON
parsing is CPU-heavy relative to parquet, which is why the roundtrip
queries prove LOSSLESSNESS (the correctness property) while the engine's
hot path stays columnar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Six 'S' digits: microsecond-precision fraction on write AND read.
TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def write_then_read(df: DataFrame, fmt: str, path: str) -> DataFrame:
    """Write ``df`` through a text format and read it back with the SAME
    explicit schema + timestamp format — the lossless landing-zone
    roundtrip.  ``mode=overwrite`` keeps the scratch path idempotent."""
    writer = df.write.mode("overwrite").option("timestampFormat", TS_FMT)
    reader = df.sparkSession.read.schema(df.schema).option(
        "timestampFormat", TS_FMT)
    if fmt == "json":
        writer.json(path)
        return reader.json(path)
    if fmt == "csv":
        writer.option("header", True).csv(path)
        return reader.option("header", True).csv(path)
    if fmt == "orc":
        # columnar binary: types carry natively, no timestampFormat needed
        df.write.mode("overwrite").orc(path)
        return df.sparkSession.read.schema(df.schema).orc(path)
    raise ValueError(f"unsupported format: {fmt}")


N_CORRUPT = 7

# Deterministic malformed JSON-lines: truncated object, bare text, bad
# quoting — the garbage a real landing zone actually receives.
# NB chosen against Spark's LENIENT defaults: allowSingleQuotes is ON
# (a single-quoted object would parse as a good all-null row) and a bare
# top-level `[]` yields zero rows rather than a corrupt one — every line
# here is malformed under any option set.
CORRUPT_LINES = [
    '{"event_id": 1, "ts": ',
    "not json at all",
    '{"event_id": "unterminated string',
    '{"a":',
    ",",
    '{"event_id": 2 "missing_comma": true}',
    "}{",
]
assert len(CORRUPT_LINES) == N_CORRUPT


def write_with_corruption_then_read(df: DataFrame, path: str) -> DataFrame:
    """The JSON landing-zone roundtrip with ``N_CORRUPT`` malformed lines
    injected, read back in PERMISSIVE mode with a ``_corrupt_record``
    column — bad lines are ROUTED, not dropped (badRecordsPath semantics
    without a side channel) and never poison the batch.

    At 100 TB this is the difference between one bad upstream file
    failing the whole ingestion job (FAILFAST), silently vanishing rows
    (DROPMALFORMED), and an auditable quarantine column (PERMISSIVE) the
    pipeline can count, alert on, and re-drive.
    """
    import os

    from pyspark.sql import functions as F  # noqa: F401
    from pyspark.sql.types import StringType, StructType

    df.write.mode("overwrite").option("timestampFormat", TS_FMT).json(path)
    with open(os.path.join(path, "corrupt-part.json"), "w",
              encoding="utf-8") as fh:
        fh.write("\n".join(CORRUPT_LINES) + "\n")
    schema = StructType(df.schema.fields[:]).add("_corrupt_record",
                                                 StringType())
    return (df.sparkSession.read.schema(schema)
            .option("timestampFormat", TS_FMT)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(path))
