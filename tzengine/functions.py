"""Relational helpers: skew-aware aggregation + tiling analytics.

Hot cells (dense urban tiles) make ``cell_id`` a skewed groupBy key at
scale. The probe itself never shuffles (broadcast index), so skew only
appears in analytics/output aggregations — handled here with explicit
two-phase salting (SURVEY §4.3), with AQE skew-join as the backstop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame, keys: list[str], salt_buckets: int = 16, salt_src: str | None = None
) -> DataFrame:
    """Two-phase count: phase 1 groups by (keys, salt) — splitting a hot
    key across ``salt_buckets`` reducers — phase 2 sums the partials.
    The salt is a DETERMINISTIC hash of ``salt_src`` (or all key columns
    of the row via xxhash64), never rand(): restart-stable.

    Equivalent to ``df.groupBy(keys).count()`` in result; different (skew-
    proof) in shuffle shape."""
    if salt_src is not None:
        salt_col = F.pmod(F.xxhash64(F.col(salt_src)), F.lit(salt_buckets))
    else:
        # partition-id salt: splits hot keys across reducers; the SUM in
        # phase 2 makes the result independent of the salt values, so
        # restart determinism of the OUTPUT is preserved either way
        salt_col = F.pmod(F.spark_partition_id(), F.lit(salt_buckets))
    phase1 = (
        df.withColumn("__salt", salt_col)
        .groupBy(*keys, "__salt")
        .agg(F.count("*").alias("__partial"))
    )
    return phase1.groupBy(*keys).agg(F.sum("__partial").alias("n"))


def hot_cell_histogram(assigned: DataFrame, top: int = 20) -> DataFrame:
    """Per-cell row counts (salted), descending — the skew diagnostic that
    feeds salting/AQE decisions. ``assigned`` is assign_timezones output."""
    return (
        salted_count(assigned, ["cell_id"], salt_src="image_id")
        .orderBy(F.col("n").desc(), F.col("cell_id"))
        .limit(top)
    )


def pipeline_violations(assigned: DataFrame) -> DataFrame:
    """Per-partition out-of-region violation counts in pipeline mode
    (SURVEY Q3: strict mode raises, pipeline mode nulls + counts).
    One row per Spark partition: (partition_id, n_rows, n_violations).

    Violations are counted from the probe's ``in_region`` flag, NOT from
    ``tzid IS NULL``: tzid is also null for in-region points no zone
    covers (valid rows on a non-full-coverage zone set)."""
    return (
        assigned.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum((~F.col("in_region")).cast("long")).alias("n_violations"),
        )
        .withColumnRenamed("__pid", "partition_id")
    )


def zone_shard_sizes(assigned: DataFrame) -> DataFrame:
    """Rows per output shard — balance check for the deterministic
    image→cell→zone-shard assignment."""
    return assigned.groupBy("zone_shard").agg(F.count("*").alias("n"))
