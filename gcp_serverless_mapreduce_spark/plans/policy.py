"""Partition-count policy — the scale knob the reference hard-codes.

The reference fixes N=5 reducers at deploy time (redis/initClient.go:13,
env NO_OF_REDUCERS) and 50 KB map partitions (pubsub/types.go:6).  Neither
survives a scale-up: the right numbers are functions of input size and
cluster width.  This module computes them; AQE then coalesces/splits at
runtime from this upper bound (session.RUNTIME_CONFS turns AQE on).

Rules of thumb encoded below (standard Spark sizing):
- shuffle partitions ≈ shuffle bytes / 128 MiB, clamped to [2 × cores,
  32768]; too few → spill + stragglers, too many → scheduler overhead
  and tiny files.
- AQE advisory partition size stays at the default 64 MiB so runtime
  coalescing has room under the static bound.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

MIB = 1 << 20
TARGET_SHUFFLE_PARTITION_BYTES = 128 * MIB
MAX_PARTITIONS = 32768


def shuffle_partitions_for(shuffle_bytes: int, cores: int,
                           target_bytes: int = TARGET_SHUFFLE_PARTITION_BYTES,
                           ) -> int:
    """Static upper bound for spark.sql.shuffle.partitions given an
    expected shuffle volume; AQE coalesces below it at runtime."""
    by_size = (shuffle_bytes + target_bytes - 1) // target_bytes
    return int(max(2 * cores, min(MAX_PARTITIONS, by_size)))


def configure_for_input(spark: SparkSession, input_bytes: int,
                        shuffle_fraction: float = 0.5) -> int:
    """Set the shuffle-partition bound from the input size (assuming the
    shuffle carries ``shuffle_fraction`` of the input after map-side
    filtering/combining — 0.5 is conservative for the suite's pipelines,
    whose per-doc dedup and partial aggs shrink data before any exchange).
    Returns the chosen bound."""
    cores = spark.sparkContext.defaultParallelism
    n = shuffle_partitions_for(int(input_bytes * shuffle_fraction), cores)
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    return n
