"""End-to-end Spark tests: broadcast-index join vs the oracle, distributed
compile parity, artifact round-trip + version gate, determinism."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from tzengine.engine import TzEngine
from tzengine.oracle import OracleMap
from tzengine.zones import pieces_to_df, synthetic_world


@pytest.fixture(scope="module")
def world():
    return synthetic_world()


@pytest.fixture(scope="module")
def engine(spark, world):
    return TzEngine.for_everywhere(spark, world, world_version="synth1")


@pytest.fixture(scope="module")
def points_df(spark):
    rng = np.random.default_rng(42)
    n = 2000
    lats = rng.uniform(0.0, 10.0, n)
    lons = rng.uniform(0.0, 10.0, n)
    # sprinkle exact boundary / overlap / hole points (FIXTURES.md T1 mix)
    lats[:5], lons[:5] = 4.5, 4.5  # overlap
    lats[5:10], lons[5:10] = 1.8, 1.4  # hole
    lats[10:15], lons[10:15] = 1.0, 1.0  # corner
    rows = [(f"img{i:06d}", float(lats[i]), float(lons[i])) for i in range(n)]
    return spark.createDataFrame(rows, "image_id string, lat double, lon double")


def test_assign_matches_oracle(engine, world, points_df):
    oracle = OracleMap(world, -90, -180, 90, 180)
    got = engine.assign_timezones(points_df, mode="strict").collect()
    assert len(got) == points_df.count()
    mism = 0
    for r in got:
        want = oracle.get_overlapping_time_zones(r.lat, r.lon)
        if list(r.tzids) != want or r.tzid != (want[0] if want else None):
            mism += 1
    assert mism == 0  # exact zone-match rate = 100% (BASELINE.json metric)


def test_assign_arrow_impl_parity(engine, points_df):
    """impl="arrow" (mapInArrow, VERDICT r4 #4) must be row-for-row
    identical to the default pandas_udf impl — including passthrough of
    extra input columns, Q1-only mode, and pipeline-mode invalid rows."""
    a = engine.assign_timezones(points_df, mode="strict").orderBy(
        "image_id").collect()
    b = engine.assign_timezones(
        points_df, mode="strict", impl="arrow").orderBy("image_id").collect()
    assert a == b
    # Q1-only path
    a1 = engine.assign_timezones(
        points_df, include_all=False).orderBy("image_id").collect()
    b1 = engine.assign_timezones(
        points_df, include_all=False, impl="arrow"
    ).orderBy("image_id").collect()
    assert a1 == b1
    # no shuffle in the arrow plan either
    plan = (
        engine.assign_timezones(points_df, impl="arrow")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown impl"):
        engine.assign_timezones(points_df, impl="rdd")
    with _pytest.raises(ValueError, match="reserved"):
        engine.assign_timezones(
            points_df.withColumn("__tz_valid", points_df.lat), impl="arrow"
        )


def test_assign_auto_impl_selection(engine, points_df, spark):
    """The "auto" rule (round 6): the scalar arrow_udf impl wins at every
    passthrough width (it is column-count-independent; measured 2x over
    mapInArrow even with zero extra columns), so auto always resolves to
    it — EXCEPT an input already carrying the scalar impl's reserved
    '__tz' temp column, which keeps resolving to mapInArrow so a
    previously-valid input never starts raising."""
    from tzengine.engine import TzEngine

    pick = TzEngine._pick_probe_impl
    narrow = points_df.select("lat", "lon")
    assert pick(narrow, "lat", "lon") == "pandas"
    one_long = narrow.withColumn("k", narrow.lat.cast("long"))
    assert pick(one_long, "lat", "lon") == "pandas"
    assert pick(points_df, "lat", "lon") == "pandas"  # string column
    tz_col = narrow.withColumn("__tz", narrow.lat * 2)
    assert pick(tz_col, "lat", "lon") == "arrow"
    # auto output == forced outputs on a narrow input
    a = engine.assign_timezones(narrow).orderBy("lat", "lon").collect()
    b = engine.assign_timezones(
        narrow, impl="arrow").orderBy("lat", "lon").collect()
    assert a == b


def test_assign_plan_is_shuffle_free(engine, points_df):
    # the probe is a broadcast join: no Exchange in the physical plan
    out = engine.assign_timezones(points_df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan or "Python" in plan


def test_deterministic_across_runs(engine, points_df):
    a = engine.assign_timezones(points_df).orderBy("image_id").collect()
    b = engine.assign_timezones(points_df).orderBy("image_id").collect()
    assert a == b
    # cell/shard assignment is a pure function of the row (north_star)
    assert all(r.cell_id == s.cell_id and r.zone_shard == s.zone_shard
               for r, s in zip(a, b))


def test_distributed_compile_parity(spark, world, points_df, engine):
    zones_df = pieces_to_df(spark, world)
    dist_engine = TzEngine.for_everywhere(
        spark, zones_df, world_version="synth1", distributed=True
    )
    a = engine.assign_timezones(points_df).orderBy("image_id").collect()
    b = dist_engine.assign_timezones(points_df).orderBy("image_id").collect()
    assert a == b


def test_zones_accessor_rank_order(engine):
    rows = engine.zones().orderBy("area_rank").collect()
    assert [r.zone_id for r in rows] == [
        "Zone/Enclave", "Zone/SquareIsland", "Zone/Small", "Zone/Multi",
        "Zone/Multi", "Zone/Host", "Zone/Big", "Zone/Filler",
    ]
    areas = [r.area_deg2 for r in rows]
    assert areas == sorted(areas)


def test_artifact_roundtrip_and_version_gate(spark, engine, points_df, tmp_path):
    path = str(tmp_path / "tzindex")
    engine.save_artifact(path)
    loaded = TzEngine.from_artifact(spark, path)
    assert loaded.map_version == engine.map_version
    a = engine.assign_timezones(points_df).orderBy("image_id").collect()
    b = loaded.assign_timezones(points_df).orderBy("image_id").collect()
    assert a == b

    # corrupt the version marker → fail fast (reference I3 contract)
    import json, os
    meta_file = os.path.join(path, "_index_meta.json")
    meta = json.load(open(meta_file))
    meta["version"] = "999:synth1"
    json.dump(meta, open(meta_file, "w"))
    with pytest.raises(ValueError, match="Incompatible map archive"):
        TzEngine.from_artifact(spark, path)


def test_strict_mode_out_of_region_raises(spark, world):
    scoped = TzEngine.for_region(spark, world, 4, 4, 5, 5, world_version="synth1")
    df = spark.createDataFrame([(5.5, 4.5)], "lat double, lon double")
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    with pytest.raises((Py4JJavaError, PythonException), match="outside the initialized area"):
        scoped.assign_timezones(df, mode="strict").collect()
    # pipeline mode: null tzid instead
    row = scoped.assign_timezones(df, mode="pipeline").collect()[0]
    assert row.tzid is None


def test_distance_and_knn_ops(engine, spark):
    df = spark.createDataFrame(
        [(float(np.float32(1.5)), float(np.float32(1.999)))], "lat double, lon double"
    )
    out = engine.assign_timezones(df)
    out = engine.distance_from_boundary(out)
    row = out.collect()[0]
    assert row.tzid == "Zone/SquareIsland"
    assert row.boundary_dist_m == pytest.approx(111.286, abs=0.001)

    knn = engine.knn_zones(spark.createDataFrame([(4.5, 6.5)], "lat double, lon double"), k=3)
    # Filler contains the point (0 m); Big is 0.5 deg away; Small 1.5 deg
    assert knn.collect()[0].nearest_tzids == ["Zone/Filler", "Zone/Big", "Zone/Small"]


def test_artifact_io_error(spark, tmp_path):
    # reference I2: unreadable archive → "Unable to read time zone data
    # resource file" (meta present, data missing)
    import json, os
    path = str(tmp_path / "broken")
    os.makedirs(path)
    json.dump({"version": "1:synth1", "init_region": [0, 0, 1, 1]},
              open(os.path.join(path, "_index_meta.json"), "w"))
    with pytest.raises(RuntimeError, match="Unable to read time zone data"):
        TzEngine.from_artifact(spark, path)


def test_pipeline_violations_counter(spark, world):
    from tzengine.functions import pipeline_violations

    scoped = TzEngine.for_region(spark, world, 4, 4, 5, 5, world_version="synth1")
    df = spark.createDataFrame(
        [(4.5, 4.5), (9.0, 9.0), (4.2, 4.8), (0.0, 0.0)], "lat double, lon double"
    ).coalesce(2)
    out = scoped.assign_timezones(df, mode="pipeline")
    stats = pipeline_violations(out).collect()
    assert sum(r.n_rows for r in stats) == 4
    assert sum(r.n_violations for r in stats) == 2


def test_uncovered_in_region_point_is_not_a_violation(spark, world):
    from tzengine.functions import pipeline_violations

    # region extends past the zone world (lat/lon 0..10): (11,11) is
    # in-region but covered by no zone -> tzid null, in_region true,
    # NOT a violation; (13,13) is out-of-region -> violation
    eng = TzEngine.for_region(spark, world, 0, 0, 12, 12, world_version="synth1")
    df = spark.createDataFrame(
        [(5.0, 5.0), (11.0, 11.0), (13.0, 13.0)], "lat double, lon double"
    ).coalesce(1)
    out = eng.assign_timezones(df, mode="pipeline").collect()
    by_lat = {r.lat: r for r in out}
    assert by_lat[5.0].tzid is not None and by_lat[5.0].in_region
    assert by_lat[11.0].tzid is None and by_lat[11.0].in_region
    assert by_lat[13.0].tzid is None and not by_lat[13.0].in_region
    stats = pipeline_violations(
        eng.assign_timezones(
            spark.createDataFrame(
                [(5.0, 5.0), (11.0, 11.0), (13.0, 13.0)],
                "lat double, lon double",
            ).coalesce(1),
            mode="pipeline",
        )
    ).collect()
    assert sum(r.n_violations for r in stats) == 1


def test_include_all_false_q1_only_path(spark, world):
    eng = TzEngine.for_everywhere(spark, world, world_version="synth1")
    df = spark.createDataFrame(
        [(4.5, 4.5), (0.5, 0.5), (3.5, 5.5)], "lat double, lon double"
    )
    full = eng.assign_timezones(df, mode="strict").orderBy("lat").collect()
    q1 = eng.assign_timezones(df, mode="strict", include_all=False).orderBy(
        "lat"
    ).collect()
    assert "tzids" not in q1[0].asDict()
    assert [r.tzid for r in q1] == [r.tzid for r in full]
    assert [r.cell_id for r in q1] == [r.cell_id for r in full]
    assert [r.zone_shard for r in q1] == [r.zone_shard for r in full]


def test_planar_distance_metric(spark, world):
    import numpy as np
    from tzengine import geom

    eng = TzEngine.for_everywhere(spark, world, world_version="synth1")
    df = spark.createDataFrame(
        [(4.5, 4.5), (0.5, 0.5)], "lat double, lon double"
    )
    out = eng.assign_timezones(df, mode="strict")
    planar = {r.lat: r.d for r in eng.distance_from_boundary(
        out, mode="strict", metric="planar_deg", out_col="d").collect()}
    meters = {r.lat: r.d for r in eng.distance_from_boundary(
        out, mode="strict", out_col="d").collect()}
    # (4.5,4.5) in Zone/Small (4..5): planar 0.5 deg exactly
    assert planar[4.5] == 0.5
    # geodesic = one of the four equidistant planar-nearest candidates
    # (argmin tie picks a segment; lat- vs lon-edge geodesics differ)
    cands = [
        float(geom.geodesic_distance_wgs84(4.5, 4.5, la, lo)[0])
        for la, lo in [(4.0, 4.5), (5.0, 4.5), (4.5, 4.0), (4.5, 5.0)]
    ]
    assert any(meters[4.5] == pytest.approx(c, rel=1e-9) for c in cands)


def test_cell_of_expr_matches_numpy_cell_of(spark):
    # the JVM-side Morton encode (engine.cell_of_expr) must be value-
    # identical to cells.cell_of — same double quantization (CAST
    # truncates toward zero like astype(int64)), same interleave —
    # including the closed upper edges and both hemispheres
    import numpy as np
    from tzengine import cells
    from tzengine.engine import cell_of_expr
    from pyspark.sql import functions as F

    lats = np.array([-90.0, -89.999, -45.5, -1e-9, 0.0, 0.703125, 37.77,
                     59.2, 89.999, 90.0])
    lons = np.array([-180.0, -179.9, -122.42, -1e-9, 0.0, 1.40625, 13.4,
                     121.47, 179.9, 180.0])
    rows = [(float(la), float(lo)) for la in lats for lo in lons]
    df = spark.createDataFrame(rows, "lat double, lon double")
    for res in (0, 1, 7, 13):
        got = [
            r.c
            for r in df.select(
                cell_of_expr("lat", "lon", res).alias("c")
            ).collect()
        ]
        la = np.array([r[0] for r in rows])
        lo = np.array([r[1] for r in rows])
        exp = cells.cell_of(lo, la, res).astype(np.int64).tolist()
        assert got == exp, res


def test_zones_accessor_int32_offset_overflow_guard(engine):
    """Arrow list<> offsets are int32; past 2^31 vertices .astype would
    silently WRAP (ADVICE r3 #3) — zones() must fail fast instead."""
    import dataclasses

    import numpy as np
    import pytest

    big_idx = dataclasses.replace(
        engine.idx,
        vert_offsets=np.array([0, np.iinfo(np.int32).max + 1], dtype=np.int64),
    )
    big_engine = type(engine)(engine.spark, big_idx)
    with pytest.raises(ValueError, match="int32 list-offset"):
        big_engine.zones()


def test_jvm_validity_expr_matches_kernel_semantics(spark, world):
    """Round 6: the scalar probe no longer ships the valid flag — the
    engine re-derives it JVM-side from the region bounds. The parsed
    expression must reproduce numpy's comparison semantics on every
    edge: NaN coordinates (SQL ranks NaN above all values where numpy
    compares False — guarded by isnan), NULL coordinates (must read
    invalid like the NaN they become across the Arrow boundary —
    guarded by coalesce), exact region-border points (inclusive), and
    one-ULP-outside points (rejected)."""
    eng = TzEngine.for_region(
        spark, world, 0.0, 0.0, 10.0, 10.0, world_version="synth1"
    )
    ulp_out = float(np.nextafter(10.0, 11.0))
    rows = [
        (5.0, 5.0, True),            # interior
        (0.0, 0.0, True),            # region corner, inclusive
        (10.0, 10.0, True),          # opposite corner, inclusive
        (ulp_out, 5.0, False),       # one ULP outside
        (5.0, ulp_out, False),
        (float("nan"), 5.0, False),  # NaN lat
        (5.0, float("nan"), False),  # NaN lon
        (None, 5.0, False),          # NULL lat
        (5.0, None, False),          # NULL lon
        (11.0, 5.0, False),          # plainly outside
    ]
    df = spark.createDataFrame(
        [(la, lo) for la, lo, _ in rows], "lat double, lon double"
    )
    for include_all in (True, False):
        got = eng.assign_timezones(
            df, mode="pipeline", include_all=include_all
        ).collect()
        for (la, lo, want), r in zip(rows, got):
            assert r.in_region == want, (la, lo, include_all, r)
            if not want:
                assert r.tzid is None and r.cell_id is None, (la, lo, r)


def test_split_probe_udf_pruning_and_collapse(spark, world):
    """Round 6: tzid and tzids ride separate scalar UDFs so column
    pruning can drop the rank-list kernel for tzid-only consumers; a
    consumer selecting both must still pay ONE ArrowEvalPython node
    (Spark collapses same-level Python UDFs, so lat/lon cross once)."""
    eng = TzEngine.for_everywhere(spark, world, world_version="synth1")
    df = spark.range(100).selectExpr(
        "cast(id % 100 as double) / 10 as lat",
        "cast(id % 97 as double) / 10 as lon",
    )
    out = eng.assign_timezones(df, mode="strict")

    def plan(d):
        return d._jdf.queryExecution().executedPlan().toString()

    p_tzid = plan(out.groupBy("tzid").count())
    assert "_probe_first" in p_tzid and "_probe_all" not in p_tzid
    p_both = plan(out.select("tzid", "tzids"))
    assert "_probe_first" in p_both and "_probe_all" in p_both
    # one ArrowEvalPython node carrying both UDFs (node named once in
    # the tree; both UDFs listed in its arguments)
    import re

    nodes = re.findall(r"ArrowEvalPython \[([^]]*)\]", p_both)
    assert len(nodes) == 1 and "_probe_first" in nodes[0] and "_probe_all" in nodes[0]
    p_tzids = plan(out.select("tzids"))
    assert "_probe_all" in p_tzids and "_probe_first" not in p_tzids
