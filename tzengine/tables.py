"""Iceberg-style resumable table writes: manifest → per-partition commits
→ snapshot.

North-rule requirement: "resumable from checkpoint with per-partition
lineage + metrics". No Iceberg runtime jars exist in this environment, so
the commit protocol is implemented explicitly over partitioned Parquet,
keeping an Iceberg-compatible layout (partition dirs + JSON metadata):

    out_dir/
      _manifest.json            run description: run_id, partition spec,
                                unit list, engine version, input lineage
      _commits/commit_<v>.json  one per completed partition: rows, bytes,
                                wall time, lineage (run_id + input)
      _snapshot.json            written when every unit committed
      <col>=<v>/part-*.parquet  the data

Work units are the values of a DETERMINISTIC partition column (e.g.
``zone_shard``, itself a pure function of the row — engine._splitmix64),
so the same input always produces the same unit set and the same rows in
each unit regardless of cluster size, restarts, or input partitioning.

Resume: units with a commit file are skipped entirely (their data is
final); pending units are (re)written via a staging directory and
promoted with an atomic rename, so a crash mid-write never leaves a
half-visible partition.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import __version__


class AbortForTest(Exception):
    """Raised by the fault-injection hook in tests (kill-and-resume)."""


def _commit_path(out_dir: str, value) -> str:
    return os.path.join(out_dir, "_commits", f"commit_{value}.json")


def committed_units(out_dir: str) -> set:
    cdir = os.path.join(out_dir, "_commits")
    if not os.path.isdir(cdir):
        return set()
    out = set()
    for fn in os.listdir(cdir):
        if fn.startswith("commit_") and fn.endswith(".json"):
            out.add(fn[len("commit_") : -len(".json")])
    return out


def write_resumable(
    df: DataFrame,
    out_dir: str,
    partition_col: str = "zone_shard",
    batch_size: int = 16,
    input_lineage: dict | None = None,
    fail_after_batches: int | None = None,
) -> dict:
    """Write ``df`` partitioned by ``partition_col`` with per-partition
    commits. Returns the snapshot dict. Idempotent: re-running after a
    crash completes only the missing units.

    ``fail_after_batches`` is a test-only fault-injection hook.
    """
    spark = df.sparkSession
    os.makedirs(os.path.join(out_dir, "_commits"), exist_ok=True)

    # unit discovery: distinct partition values (deterministic column)
    units = sorted(
        str(r[0]) for r in df.select(partition_col).distinct().collect()
    )
    manifest_file = os.path.join(out_dir, "_manifest.json")
    if os.path.exists(manifest_file):
        manifest = json.load(open(manifest_file))
        if manifest["units"] != units or manifest["partition_col"] != partition_col:
            raise ValueError(
                "manifest mismatch: resuming with different input or "
                "partition spec than the original run"
            )
    else:
        manifest = {
            "run_id": uuid.uuid4().hex,
            "engine_version": __version__,
            "partition_col": partition_col,
            "units": units,
            "input": input_lineage or {},
            "created_unix": time.time(),
        }
        with open(manifest_file + ".tmp", "w") as f:
            json.dump(manifest, f, indent=2)
        os.replace(manifest_file + ".tmp", manifest_file)

    done = committed_units(out_dir)
    pending = [u for u in units if u not in done]

    batches = [pending[i : i + batch_size] for i in range(0, len(pending), batch_size)]
    for bi, batch in enumerate(batches):
        if fail_after_batches is not None and bi >= fail_after_batches:
            raise AbortForTest(f"injected failure before batch {bi}")
        t0 = time.time()
        staging = os.path.join(out_dir, f"_staging_{manifest['run_id']}_{bi}")
        sub = df.filter(F.col(partition_col).cast("string").isin(batch))
        sub.write.mode("overwrite").partitionBy(partition_col).parquet(staging)
        # per-partition metrics in the same pass shape (cheap agg job)
        metrics = {
            str(r["u"]): (r["rows"],)
            for r in sub.groupBy(F.col(partition_col).cast("string").alias("u"))
            .agg(F.count("*").alias("rows"))
            .collect()
        }
        elapsed = time.time() - t0
        for u in batch:
            src = os.path.join(staging, f"{partition_col}={u}")
            dst = os.path.join(out_dir, f"{partition_col}={u}")
            if not os.path.isdir(src):
                continue  # unit had 0 rows in this filter (shouldn't happen)
            if os.path.isdir(dst):
                shutil.rmtree(dst)  # leftover from a crashed, uncommitted try
            os.replace(src, dst)  # atomic promote
            nbytes = sum(
                os.path.getsize(os.path.join(dst, f))
                for f in os.listdir(dst)
                if f.endswith(".parquet")
            )
            commit = {
                "unit": u,
                "run_id": manifest["run_id"],
                "engine_version": __version__,
                "rows": int(metrics.get(u, (0,))[0]),
                "bytes": nbytes,
                "batch_wall_sec": elapsed,
                "lineage": manifest["input"],
                "committed_unix": time.time(),
            }
            cpath = _commit_path(out_dir, u)
            with open(cpath + ".tmp", "w") as f:
                json.dump(commit, f, indent=2)
            os.replace(cpath + ".tmp", cpath)
        shutil.rmtree(staging, ignore_errors=True)

    # snapshot when complete (Iceberg-snapshot analogue)
    done = committed_units(out_dir)
    snapshot = {
        "run_id": manifest["run_id"],
        "complete": set(units) <= done,
        "units": len(units),
        "committed": len(done),
        "total_rows": sum(
            json.load(open(_commit_path(out_dir, u)))["rows"] for u in done
        ),
    }
    if snapshot["complete"]:
        snap_file = os.path.join(out_dir, "_snapshot.json")
        with open(snap_file + ".tmp", "w") as f:
            json.dump(snapshot, f, indent=2)
        os.replace(snap_file + ".tmp", snap_file)
    return snapshot


def read_table(spark, out_dir: str) -> DataFrame:
    """Read back only COMMITTED partitions (uncommitted stragglers are
    invisible, like reading an Iceberg snapshot)."""
    snap = os.path.join(out_dir, "_snapshot.json")
    manifest = json.load(open(os.path.join(out_dir, "_manifest.json")))
    col = manifest["partition_col"]
    done = committed_units(out_dir)
    paths = [
        os.path.join(out_dir, f"{col}={u}")
        for u in sorted(done)
        if os.path.isdir(os.path.join(out_dir, f"{col}={u}"))
    ]
    if not paths:
        raise ValueError(f"no committed partitions under {out_dir}")
    return (
        spark.read.option("basePath", out_dir).parquet(*paths)
    )
