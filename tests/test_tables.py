"""Resumable-write protocol: commits, kill-and-resume, determinism."""

import json
import os

import pytest

from pyspark.sql import functions as F

from tzengine import tables
from tzengine.engine import TzEngine
from tzengine.fixtures import geo_images_df
from tzengine.zones import synthetic_world


@pytest.fixture(scope="module")
def assigned(spark):
    eng = TzEngine.for_everywhere(spark, synthetic_world(), world_version="synth1")
    df = geo_images_df(spark, 400, with_bytes=False, partitions=4)
    return eng.assign_timezones(df).select(
        "image_id", "lat", "lon", "tzid", "cell_id", "zone_shard"
    )


def test_full_write_and_readback(spark, assigned, tmp_path):
    out = str(tmp_path / "t1")
    snap = tables.write_resumable(assigned, out, input_lineage={"rows": 400})
    assert snap["complete"] and snap["total_rows"] == 400
    back = tables.read_table(spark, out)
    assert back.count() == 400
    # per-partition commit files carry lineage + metrics
    commits = os.listdir(os.path.join(out, "_commits"))
    assert len(commits) == snap["units"]
    c = json.load(open(os.path.join(out, "_commits", commits[0])))
    assert c["rows"] > 0 and c["lineage"] == {"rows": 400}
    assert os.path.exists(os.path.join(out, "_snapshot.json"))


def test_kill_and_resume_identical(spark, assigned, tmp_path):
    out_a = str(tmp_path / "killed")
    out_b = str(tmp_path / "clean")

    # run A: crash after 1 batch, then resume to completion
    with pytest.raises(tables.AbortForTest):
        tables.write_resumable(assigned, out_a, batch_size=8, fail_after_batches=1)
    partial = tables.committed_units(out_a)
    assert 0 < len(partial) <= 8
    snap_a = tables.write_resumable(assigned, out_a, batch_size=8)
    assert snap_a["complete"]

    # run B: single clean run
    snap_b = tables.write_resumable(assigned, out_b, batch_size=64)
    assert snap_b["total_rows"] == snap_a["total_rows"] == 400

    # byte-level determinism of CONTENT: identical rows per partition
    a = tables.read_table(spark, out_a).orderBy("image_id").collect()
    b = tables.read_table(spark, out_b).orderBy("image_id").collect()
    assert a == b
    # tile assignment identical across the two runs (north_star)
    assert [r.zone_shard for r in a] == [r.zone_shard for r in b]


def test_resume_skips_committed_units(spark, assigned, tmp_path, capsys):
    out = str(tmp_path / "skip")
    tables.write_resumable(assigned, out)
    # tamper: delete one commit → only that unit is rewritten
    commits_dir = os.path.join(out, "_commits")
    victim = sorted(os.listdir(commits_dir))[0]
    os.remove(os.path.join(commits_dir, victim))
    before = tables.committed_units(out)
    snap = tables.write_resumable(assigned, out)
    assert snap["complete"]
    assert tables.committed_units(out) == before | {victim[len("commit_"):-len(".json")]}


def test_manifest_mismatch_rejected(spark, assigned, tmp_path):
    out = str(tmp_path / "mm")
    tables.write_resumable(assigned, out)
    other = assigned.filter(F.col("zone_shard") < 10)
    with pytest.raises(ValueError, match="manifest mismatch"):
        tables.write_resumable(other, out)


def test_uncommitted_partitions_invisible(spark, assigned, tmp_path):
    out = str(tmp_path / "inv")
    with pytest.raises(tables.AbortForTest):
        tables.write_resumable(assigned, out, batch_size=8, fail_after_batches=1)
    back = tables.read_table(spark, out)
    committed_rows = back.count()
    assert 0 < committed_rows < 400  # only committed units readable
