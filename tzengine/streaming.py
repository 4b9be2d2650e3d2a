"""Structured Streaming wrappers.

The reference is a batch lookup library (SURVEY §2.D: streaming absent);
the engine's probe is a stateless narrow map, so it composes with
Structured Streaming for free — these wrappers make that path explicit
and tested:

- ``assign_stream``: the same broadcast-index assign over a streaming
  DataFrame (stateless → append-mode safe).
- ``streaming_cell_counts``: watermarked tumbling-window per-zone counts
  (late data handled by the watermark) — the standard hot-cell monitor
  over an event stream. NOTE: in ``update`` output mode a sink receives
  one row per (group, trigger); the LAST update per group carries the
  full count — aggregate with max(n), not sum(n), when reading a memory
  sink across triggers.
- ``stream_to_resumable``: foreachBatch sink writing each micro-batch
  through the engine, appending partitioned Parquet with the streaming
  checkpoint providing exactly-once batch tracking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_stream(engine, stream_df: DataFrame, **kw) -> DataFrame:
    return engine.assign_timezones(stream_df, **kw)


def streaming_cell_counts(
    engine,
    stream_df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
    **assign_kw,
) -> DataFrame:
    assigned = engine.assign_timezones(stream_df, mode="pipeline", **assign_kw)
    return (
        assigned.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col("tzid"))
        .agg(F.count("*").alias("n"), F.approx_count_distinct("cell_id").alias("n_cells"))
    )


def streaming_dedup(
    stream_df: DataFrame,
    key_col: str = "phash",
    id_col: str = "image_id",
    timeout_conf: str = "NoTimeout",
) -> DataFrame:
    """Custom STATEFUL streaming operator (applyInPandasWithState): emit
    each key's row only the FIRST time it is seen across the whole stream
    — exact streaming dedup with per-key state (the standard ingest-side
    duplicate filter for a training-data firehose).

    State per key group: the set of ids already emitted. Grouping on the
    dedup key hash-distributes state; memory is bounded by distinct keys
    per partition (at 100 TB one would add a TTL timeout to age state)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState

    out_schema = f"{key_col} long, {id_col} string"
    state_schema = "seen array<string>"

    def dedup_fn(key, pdfs, state: GroupState):
        seen = set(state.get[0]) if state.exists else set()
        fresh = []
        for pdf in pdfs:
            for v in pdf[id_col]:
                if v not in seen:
                    seen.add(v)
                    fresh.append(v)
        state.update((list(seen),))
        yield pd.DataFrame({key_col: [key[0]] * len(fresh), id_col: fresh})

    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            dedup_fn, out_schema, state_schema, "append", timeout_conf
        )
    )


def stream_to_resumable(
    engine,
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    partition_col: str = "zone_shard",
    **assign_kw,
):
    """foreachBatch sink: assign + append partitioned Parquet. The
    streaming checkpoint makes micro-batch delivery exactly-once; the
    deterministic row→shard function makes output placement
    restart-stable (same rows land in the same partitions on replay)."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        out = engine.assign_timezones(batch_df, mode="pipeline", **assign_kw)
        out.write.mode("append").partitionBy(partition_col).parquet(out_dir)

    return (
        stream_df.writeStream.option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
    )
