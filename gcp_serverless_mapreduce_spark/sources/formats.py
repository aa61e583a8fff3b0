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
