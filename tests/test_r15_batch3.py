"""Bit-equality pin for the r15 batch-3 Hilbert-key Arrow kernel.

The ``F.aggregate`` per-level fold is CodegenFallback (interpreted per
row); batch 3 replaces it with a vectorized numpy int64 kernel.  The fold
is pure integer arithmetic, so the kernel must equal the expression twin
EXACTLY on every input — including negatives (two's-complement masking)
and oversized values (16-bit wrap) — and preserve NULL propagation.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from gcp_serverless_mapreduce_spark.operators import layout


def test_hilbert_kernel_bit_equal_to_expr_twin(spark):
    rows = [Row(i=i, x=x, y=y) for i, (x, y) in enumerate([
        (0, 0), (1, 0), (0, 1), (65535, 65535), (65536, 2),  # wrap
        (123456789, 987654321),                               # oversized
        (-1, 5), (-65536, -1),                                # negative
        (None, 3), (7, None), (None, None),                   # NULLs
        (32768, 32767), (12345, 54321),
    ])]
    df = spark.createDataFrame(rows, "i long, x long, y long")
    new = {r["i"]: r["h"]
           for r in df.select("i", layout.hilbert_key(
               F.col("x"), F.col("y")).alias("h")).collect()}
    old = {r["i"]: r["h"]
           for r in df.select("i", layout.hilbert_key_expr(
               F.col("x"), F.col("y")).alias("h")).collect()}
    assert new == old
