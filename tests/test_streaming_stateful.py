"""Stateful streaming dedup: state persists across micro-batches."""

import pytest

from pyspark.sql import functions as F

from tzengine import streaming


def test_streaming_dedup_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "src")
    # two files -> two micro-batches (maxFilesPerTrigger=1); ids overlap
    spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "phash long, image_id string"
    ).coalesce(1).write.parquet(src + "/f1")
    spark.createDataFrame(
        [(1, "a"), (1, "d"), (2, "c"), (3, "e")], "phash long, image_id string"
    ).coalesce(1).write.parquet(src + "/f2")
    # consolidate under one dir for the file source
    import shutil, os, glob

    os.makedirs(src + "/all")
    for i, f in enumerate(sorted(glob.glob(src + "/f*/part-*.parquet"))):
        shutil.copy(f, src + f"/all/{i:02d}.parquet")

    schema = "phash long, image_id string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/all")
    )
    out = streaming.streaming_dedup(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("select * from dedup_out").collect()
    finally:
        q.stop()
    got = sorted((r.phash, r.image_id) for r in rows)
    # duplicates ("a" under key 1, "c" under key 2) emitted exactly once
    assert got == [(1, "a"), (1, "b"), (1, "d"), (2, "c"), (3, "e")]
