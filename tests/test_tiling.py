"""Raster ↔ vector tiling round-trip consistency (north_star)."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from tzengine import cells, geom, index, tiling
from tzengine.zones import synthetic_world

RES = 8


@pytest.fixture(scope="module")
def raster(spark):
    return tiling.rasterize_zones(spark, synthetic_world(), res=RES).cache()


def test_raster_mask_correctness(raster):
    world = {(p.zone_id, p.polygon_id): p.rings for p in synthetic_world()}
    rows = raster.collect()
    assert rows
    for r in rows[:500]:
        rings = world[(r.zone_id, r.polygon_id)]
        b = cells.cell_bounds(np.uint64(r.cell_id))[0]
        center = np.array([[(b[0] + b[2]) / 2, (b[1] + b[3]) / 2]])
        if r.kind == "full":
            assert geom.contains_inclusive(center, rings)[0], r
            seg_a, seg_b = geom._segments(rings)
            assert not geom.segments_intersect_box(
                seg_a, seg_b, b[0], b[1], b[2], b[3]
            ), r


def test_full_cells_match_pure_numpy(raster):
    # distributed raster == driver-side numpy raster, piece by piece
    for p in synthetic_world()[:3]:
        ids, kinds = tiling.raster_mask_for_rings(p.rings, RES)
        want_full = {int(c) for c, k in zip(ids, kinds) if k == 1}
        got_full = {
            r.cell_id
            for r in raster.filter(
                (F.col("zone_id") == p.zone_id)
                & (F.col("polygon_id") == p.polygon_id)
                & (F.col("kind") == "full")
            ).collect()
        }
        assert got_full == want_full


def test_vectorize_then_expand_roundtrip(spark, raster):
    vector = tiling.vectorize_coverage(raster)
    # vector must be strictly smaller (quads merged) for the big zones
    n_full_raster = raster.filter("kind = 'full'").count()
    n_full_vector = vector.filter("kind = 'full'").count()
    assert 0 < n_full_vector < n_full_raster
    # expanding the vector back to RES reproduces the raster exactly
    back = tiling.expand_to_res(vector.filter("kind = 'full'"), RES)
    got = {
        (r.zone_id, r.polygon_id, r.cell_id) for r in back.collect()
    }
    want = {
        (r.zone_id, r.polygon_id, r.cell_id)
        for r in raster.filter("kind = 'full'").collect()
    }
    assert got == want


def test_roundtrip_consistent_with_covering_index(raster):
    # interior cells of the compiled covering index, expanded to RES,
    # are a subset of the raster's full mask (both say "uniformly inside")
    idx = index.compile_index(
        synthetic_world(), -90, -180, 90, 180, world_version="synth1"
    )
    filler = idx.zone_ids.index("Zone/Filler")
    raster_full = {
        r.cell_id
        for r in raster.filter(
            (F.col("zone_id") == "Zone/Filler") & (F.col("kind") == "full")
        ).collect()
    }
    for res_level, (uniq, offsets, ent_ids) in idx.levels.items():
        if res_level > RES:
            continue
        for i, c in enumerate(uniq):
            for e_pos in range(offsets[i], offsets[i + 1]):
                e = ent_ids[e_pos]
                if idx.ent_rank[e] == filler and idx.ent_interior[e]:
                    b = cells.cell_bounds(np.uint64(c))[0]
                    # every RES-descendant of an interior cell is full
                    sub = cells.cells_covering_bbox(
                        b[0] + 1e-9, b[1] + 1e-9, b[2] - 1e-9, b[3] - 1e-9, RES
                    )
                    assert set(sub.astype(np.int64).tolist()) <= raster_full
