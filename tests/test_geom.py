"""Geometry-kernel golden tests.

Structural ports of the reference's UtilTest.java:60-81 (containsInclusive
truth table) and TimeZoneTest.java:16-61 (getDistanceFromBoundary goldens)
onto the numpy kernel. Coordinates go through float32 exactly like the
reference (Java `float` literals widened to double).
"""

import numpy as np
import pytest

from tzengine import geom


def square_with_island_rings():
    """UtilTest.java:17-58 fixture: outer square (lat 1..2, lon 1..2),
    CCW hole in the upper-left quadrant, CW island inside the hole.
    Rings as (lon, lat) float32-widened arrays."""

    def ring(latlon):
        arr = geom.f32(np.array(latlon, dtype=np.float64))
        return arr[:, ::-1].copy()  # (lat,lon) -> (lon,lat)

    outer = ring([[2, 1], [2, 2], [1, 2], [1, 1]])
    hole = ring([[1.9, 1.1], [1.5, 1.1], [1.5, 1.5], [1.9, 1.5]])
    island = ring([[1.7, 1.2], [1.7, 1.3], [1.6, 1.3], [1.6, 1.2]])
    return [outer, hole, island]


RINGS = square_with_island_rings()


def pt(lat, lon):
    """A query point the way the Java tests make one: float literals."""
    return np.array([[float(np.float32(lon)), float(np.float32(lat))]])


# --- UtilTest.java:60-81 truth table -------------------------------------

CONTAINS_CASES = [
    (1.65, 1.0, True, "on outer left side"),
    (1.65, 1.1, True, "on hole left side"),
    (1.65, 1.2, True, "on island left side"),
    (1.0, 1.0, True, "outer lower-left corner"),
    (1.5, 1.5, True, "hole corner"),
    (1.6, 1.3, True, "island corner"),
    (1.3, 1.3, True, "interior of main area"),
    (1.65, 1.25, True, "interior of island"),
    (10.0, 10.0, False, "far outside"),
    (1.8, 1.4, False, "inside hole"),
]


@pytest.mark.parametrize("lat,lon,expected,label", CONTAINS_CASES)
def test_contains_inclusive(lat, lon, expected, label):
    got = geom.contains_inclusive(pt(lat, lon), RINGS)[0]
    assert bool(got) == expected, label


def test_contains_inclusive_vectorized_batch():
    pts = np.vstack([pt(lat, lon) for lat, lon, _, _ in CONTAINS_CASES])
    got = geom.contains_inclusive(pts, RINGS)
    want = np.array([e for _, _, e, _ in CONTAINS_CASES])
    assert np.array_equal(got, want)


# --- TimeZoneTest.java:16-61 distance goldens -----------------------------

DIST_CASES = [
    (2.0, 2.0, 0.0, 1e-9),
    (1.5, 2.0, 0.0, 1e-9),
    (1.5, 1.5, 0.0, 1e-9),
    (1.7, 1.5, 0.0, 1e-9),
    (1.7, 1.2, 0.0, 1e-9),
    (1.7, 1.25, 0.0, 1e-9),
    (1.5, 1.999, 111.286, 0.001),
    (1.5, 1.99, 1112.86, 0.1),
    (1.5, 1.9, 11128.0, 1.0),
    (1.8, 1.999, 111.270, 0.001),
    (1.001, 1.5, 110.579, 0.001),
    (1.01, 1.5, 1105.79, 0.1),
    (1.1, 1.5, 11057.9, 1.0),
    (1.25, 1.4, 27643.67, 0.01),
    (1.30, 1.4, 22114.97, 0.03),
    (1.20, 1.4, 22114.97, 0.03),
    (1.65, 1.501, 111.278, 0.001),
    (1.65, 1.201, 111.265, 0.001),
    (1.601, 1.25, 110.567, 0.001),
    (1.65, 1.25, 5563.676, 0.001),
]


@pytest.mark.parametrize("lat,lon,expected,tol", DIST_CASES)
def test_distance_from_boundary(lat, lon, expected, tol):
    p = pt(lat, lon)
    assert geom.contains_inclusive(p, RINGS)[0], "golden points are inside"
    got = geom.distance_from_boundary(p, RINGS)[0]
    assert got == pytest.approx(expected, abs=tol)


def test_distance_outside_points_guard():
    # TimeZoneTest.java:19-24 — outside / in-hole points are rejected by
    # the caller-level guard (TimeZone.kt:43); kernel reports not-contained.
    assert not geom.contains_inclusive(pt(10, 10), RINGS)[0]
    assert not geom.contains_inclusive(pt(1.8, 1.4), RINGS)[0]


# --- area semantics (TimeZoneMap.kt:217 sort key) --------------------------


def test_polygon_area2d_hole_island():
    # outer 1.0 deg^2, hole 0.4*0.4=0.16, island 0.1*0.1=0.01
    area = geom.polygon_area2d(RINGS)
    assert area == pytest.approx(1.0 - 0.16 + 0.01, abs=1e-6)


def test_ring_orientation_signs():
    outer = RINGS[0]  # CW in (lon,lat)
    assert geom.ring_signed_area(outer) < 0
    hole = RINGS[1]  # CCW
    assert geom.ring_signed_area(hole) > 0


# --- clip ------------------------------------------------------------------


def test_clip_ring_passthrough_and_cut():
    outer = RINGS[0]
    clipped = geom.clip_ring_to_box(outer, 0.0, 0.0, 3.0, 3.0)
    assert geom.polygon_area2d([clipped]) == pytest.approx(1.0, abs=1e-9)
    half = geom.clip_ring_to_box(outer, 1.5, 0.0, 3.0, 3.0)
    assert geom.polygon_area2d([half]) == pytest.approx(0.5, abs=1e-6)
    gone = geom.clip_ring_to_box(outer, 5.0, 5.0, 6.0, 6.0)
    assert len(gone) == 0


def test_clip_boundary_becomes_real_boundary():
    # TimeZone.kt:26-28 / TimeZoneMapTest.java:332-348: after clipping, the
    # clip edge counts as zone boundary for distance queries.
    outer = RINGS[0]
    clipped = geom.clip_ring_to_box(outer, 1.0, 1.0, 1.5, 3.0)
    d = geom.distance_from_boundary(np.array([[1.499, 1.2]]), [clipped])[0]
    # ~0.001 deg of longitude at lat 1.2 ≈ 111.29 m
    assert d == pytest.approx(111.29, abs=0.5)


def test_segments_intersect_box():
    seg_a, seg_b = geom._segments([RINGS[0]])
    assert geom.segments_intersect_box(seg_a, seg_b, 0.9, 0.9, 1.1, 1.1)
    assert not geom.segments_intersect_box(seg_a, seg_b, 1.2, 1.2, 1.4, 1.4)
    assert geom.segments_intersect_box(seg_a, seg_b, 0.0, 0.0, 5.0, 0.99) is False
    # box crossing the bottom edge
    assert geom.segments_intersect_box(seg_a, seg_b, 1.2, 0.5, 1.4, 1.5)


# --- B4 self-intersection repair (esri OperatorSimplify analogue) ----------


def test_split_bowtie_into_lobes():
    import numpy as np
    from tzengine import geom

    bow = np.array([[0, 0], [2, 2], [2, 0], [0, 2]], dtype=float)
    loops = geom.split_self_intersections(bow)
    assert len(loops) == 2
    areas = sorted(abs(geom.ring_signed_area(l)) for l in loops)
    assert areas == [1.0, 1.0]  # two unit triangles
    # containment over the repaired loops: both lobes inside, waist point
    # (the crossing) on the boundary, outside stays outside
    assert geom.contains_inclusive(np.array([[0.5, 1.0]]), loops)[0]
    assert geom.contains_inclusive(np.array([[1.5, 1.0]]), loops)[0]
    assert not geom.contains_inclusive(np.array([[1.0, 1.8]]), loops)[0]


def test_split_spike_removed():
    import numpy as np
    from tzengine import geom

    spike = np.array(
        [[0, 0], [4, 0], [4, 4], [2, 4], [2, 6], [2, 4], [0, 4]], dtype=float
    )
    loops = geom.split_self_intersections(spike)
    assert len(loops) == 1
    # spike tip erased: no vertex appears twice (the [2,6] backtrack and
    # one duplicated [2,4] are gone; a collinear midpoint may remain)
    uniq = {tuple(v) for v in loops[0]}
    assert len(uniq) == len(loops[0]) and (2.0, 6.0) not in uniq
    assert abs(geom.ring_signed_area(loops[0])) == 16.0


def test_split_simple_ring_unchanged():
    import numpy as np
    from tzengine import geom

    sq = np.array([[0, 0], [0, 3], [3, 3], [3, 0]], dtype=float)
    loops = geom.split_self_intersections(sq)
    assert len(loops) == 1 and np.array_equal(loops[0], sq)


def test_split_vertex_pinch_figure_eight():
    # a figure-eight pinched at a repeated VERTEX (endpoint/endpoint
    # contact, no segment crossing) must split into its two lobes —
    # ADVICE r2 #2: the crossing inserter excludes endpoint contacts, so
    # the walk must pop on repeated original vertices too
    import numpy as np
    from tzengine import geom

    eight = np.array(
        [[0, 0], [2, 0], [2, 2], [0, 2], [0, 0], [-2, 0], [-2, -2], [0, -2]],
        dtype=float,
    )
    loops = geom.split_self_intersections(eight)
    assert len(loops) == 2
    areas = sorted(abs(geom.ring_signed_area(l)) for l in loops)
    assert areas == [4.0, 4.0]
    # every emitted loop is simple (the docstring promise)
    for l in loops:
        assert not geom._any_ring_crossing(l)
        assert len({tuple(v) for v in l}) == len(l)


def test_split_opposite_winding_pinch_orients_per_lobe():
    # lobes winding oppositely: after the pinch split each lobe is
    # normalized INDIVIDUALLY (the combined signed area of the unsplit
    # eight is ~0 and would mis-orient one lobe)
    import numpy as np
    from tzengine import geom
    from tzengine.geojson import _normalize_ring

    eight = [
        [0, 0], [2, 0], [2, 2], [0, 2],   # CCW lobe
        [0, 0], [0, -2], [2, -2], [2, 0e0],
    ]
    eight = [[float(x), float(y)] for x, y in eight]
    out = _normalize_ring(eight + [eight[0]], want_cw=True)
    assert len(out) == 2
    for loop in out:
        assert geom.ring_signed_area(loop) < 0  # all enforced CW


def test_simplicity_prescreen_skips_quadratic_search(monkeypatch):
    # ADVICE r2 #1: simple rings must NOT run the O(n^2) crossing search
    import numpy as np
    from tzengine import geom

    called = []
    real = geom._seg_intersections

    def spy(ring):
        called.append(len(ring))
        return real(ring)

    monkeypatch.setattr(geom, "_seg_intersections", spy)
    th = np.linspace(0, 2 * np.pi, 5000, endpoint=False)
    big_simple = np.stack([np.cos(th), np.sin(th)], axis=1)
    loops = geom.split_self_intersections(big_simple)
    assert len(loops) == 1 and len(loops[0]) == 5000
    assert called == []  # prescreen said simple -> full search skipped

    bow = np.array([[0, 0], [2, 2], [2, 0], [0, 2]], dtype=float)
    assert len(geom.split_self_intersections(bow)) == 2
    assert called == [4]  # crossing detected -> full repair ran


def test_b4_shared_edge_degenerate_ring():
    # B4 parity stress (VERDICT r2 #9): a ring that doubles back along a
    # SHARED EDGE (two sub-rects joined by a zero-width corridor run
    # twice). esri OperatorSimplify erases the zero-area corridor and
    # keeps the two lobes; the engine must produce simple loops whose
    # total area equals the true covered area, with the corridor gone.
    import numpy as np
    from tzengine import geom

    # square [0,2]x[0,2] + square [4,6]x[0,2] joined by edge y=1, x 2->4
    # traversed out and back (zero width)
    ring = np.array(
        [
            [0, 0], [2, 0], [2, 1], [4, 1],       # corridor out
            [4, 0], [6, 0], [6, 2], [4, 2],
            [4, 1], [2, 1],                        # corridor back (same edge)
            [2, 2], [0, 2],
        ],
        dtype=float,
    )
    loops = geom.split_self_intersections(ring)
    for l in loops:
        assert len({tuple(v) for v in l}) == len(l)
    total = sum(abs(geom.ring_signed_area(l)) for l in loops)
    assert total == 8.0  # two 2x2 lobes, corridor contributes nothing
    # corridor midpoint is not interior
    assert not geom.points_in_rings_evenodd(
        np.array([[3.0, 1.0 + 1e-9]]), *geom._segments(loops)
    )[0]


def test_b4_ring_overlaps_ring_even_odd_semantics():
    # B4 parity stress: RING-OVERLAPS-RING (a second ring of the same
    # polygon sticking partly outside the first — degenerate input esri
    # OperatorSimplify would rebuild into OGC-valid rings). Each ring is
    # individually simple, so the per-ring repair passes both through
    # unchanged, and containment follows the even-odd rule over the
    # combined segment set: single-covered regions are IN, the doubly-
    # covered lens is OUT. This matches the alternate-fill reading of
    # the degenerate input; the intentional divergence from esri (which
    # would union overlapping OUTER rings) is documented in COVERAGE.md.
    import numpy as np
    from tzengine import geom

    outer = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=float)
    over = np.array([[2, 1], [6, 1], [6, 3], [2, 3]], dtype=float)
    assert len(geom.split_self_intersections(outer)) == 1
    assert len(geom.split_self_intersections(over)) == 1
    segs = geom._segments([outer, over])
    # outer-only region: inside
    assert geom.points_in_rings_evenodd(np.array([[1.0, 2.0]]), *segs)[0]
    # overlap lens (covered by both rings): even-odd -> outside
    assert not geom.points_in_rings_evenodd(np.array([[3.0, 2.0]]), *segs)[0]
    # second-ring-only region: inside
    assert geom.points_in_rings_evenodd(np.array([[5.0, 2.0]]), *segs)[0]


def test_points_in_rings_evenodd_grouped_matches_dense_fuzz():
    """The unique-y row-grouped even-odd path (round 6) must agree
    bit-for-bit with the dense per-point kernel, including y values that
    exactly equal segment endpoints (straddle tie-breaks) and duplicate
    x crossings."""
    import numpy as np

    from tzengine import geom

    rng = np.random.default_rng(7)
    for trial in range(60):
        m = int(rng.integers(4, 60))
        ang = np.sort(rng.uniform(0, 2 * np.pi, m))
        r = rng.uniform(0.5, 3.0, m)
        ring = np.stack([np.cos(ang) * r, np.sin(ang) * r], axis=1)
        ring = np.vstack([ring, ring[:1]])
        sa, sb = geom._segments([ring])
        gx = rng.uniform(-4, 4, 16)
        gy = np.concatenate(
            [rng.uniform(-4, 4, 6), rng.choice(sa[:, 1], 4)]
        )
        pts = np.stack(np.meshgrid(gx, gy), axis=-1).reshape(-1, 2)
        got = geom.points_in_rings_evenodd(pts, sa, sb)
        # dense reference, computed inline (the production dense branch
        # is gated away for grid inputs)
        py = pts[:, 1][:, None]
        strad = (sa[:, 1][None, :] > py) != (sb[:, 1][None, :] > py)
        rows, cols = np.nonzero(strad)
        x_at = sa[cols, 0] + (pts[rows, 1] - sa[cols, 1]) * (
            sb[cols, 0] - sa[cols, 0]
        ) / (sb[cols, 1] - sa[cols, 1])
        ref = (
            np.bincount(
                rows[pts[rows, 0] < x_at], minlength=len(pts)
            ) & 1
        ).astype(bool)
        np.testing.assert_array_equal(got, ref, err_msg=f"trial {trial}")


def test_segments_box_pairs_matches_dense_matrix_fuzz():
    """The sparse grid-prescreened covering kernel must produce EXACTLY
    the pairs of np.nonzero(segments_box_matrix(...)), row-major, on a
    uniform aligned grid — including degenerate (point) segments and
    segments lying exactly on cell boundaries."""
    import numpy as np

    from tzengine import geom

    rng = np.random.default_rng(123)
    for trial in range(40):
        S = int(rng.integers(1, 150))
        a = rng.uniform(-12, 12, (S, 2))
        b = a + rng.normal(0, 1.2, (S, 2))
        if trial % 4 == 0:
            b[:: 3] = a[:: 3]  # degenerate point segments
        if trial % 5 == 0:
            a[:, 0] = np.round(a[:, 0])  # endpoints exactly on grid lines
        w = float(rng.uniform(0.7, 4.0))
        ix = rng.integers(0, 9, 50)
        iy = rng.integers(0, 9, 50)
        key = ix * 100 + iy
        _, u = np.unique(key, return_index=True)
        ix, iy = ix[u], iy[u]
        boxes = np.stack(
            [-12 + ix * w, -12 + iy * w, -12 + (ix + 1) * w, -12 + (iy + 1) * w],
            axis=1,
        )
        r0, c0 = np.nonzero(geom.segments_box_matrix(a, b, boxes))
        r1, c1 = geom.segments_box_pairs(a, b, boxes)
        np.testing.assert_array_equal(r0, r1, err_msg=f"trial {trial} rows")
        np.testing.assert_array_equal(c0, c1, err_msg=f"trial {trial} cols")

    # non-uniform boxes take the dense fallback and still match
    boxes = np.array([[0.0, 0.0, 1.0, 1.0], [2.0, 0.0, 5.0, 4.0]])
    a = np.array([[0.5, 0.5], [3.0, -1.0]])
    b = np.array([[0.5, 2.0], [3.0, 5.0]])
    r0, c0 = np.nonzero(geom.segments_box_matrix(a, b, boxes))
    r1, c1 = geom.segments_box_pairs(a, b, boxes)
    np.testing.assert_array_equal(r0, r1)
    np.testing.assert_array_equal(c0, c1)

    # ADVICE r4 #1 counterexample: UNIFORM-SIZE but NOT grid-aligned
    # boxes — both round to the same (bix, biy) key, and the pre-fix
    # sparse path matched only the first (a segment crossing only the
    # second box returned no pairs). Must take the dense fallback.
    boxes = np.array([[0.0, 0.0, 1.0, 1.0], [0.3, 0.0, 1.3, 1.0]])
    a = np.array([[1.2, -0.5]])
    b = np.array([[1.2, 1.5]])  # crosses only the second box
    r0, c0 = np.nonzero(geom.segments_box_matrix(a, b, boxes))
    r1, c1 = geom.segments_box_pairs(a, b, boxes)
    np.testing.assert_array_equal(r0, r1)
    np.testing.assert_array_equal(c0, c1)
    assert len(r1) == 1 and r1[0] == 1  # the incidence is actually found

    # aligned grid but DUPLICATE cells (same key twice) must also fall
    # back — the searchsorted join can only return one box per key
    boxes = np.array([[0.0, 0.0, 1.0, 1.0], [0.0, 0.0, 1.0, 1.0]])
    a = np.array([[0.5, -0.5]])
    b = np.array([[0.5, 1.5]])
    r0, c0 = np.nonzero(geom.segments_box_matrix(a, b, boxes))
    r1, c1 = geom.segments_box_pairs(a, b, boxes)
    np.testing.assert_array_equal(r0, r1)
    np.testing.assert_array_equal(c0, c1)
    assert len(r1) == 2


def test_vincenty_per_row_freeze_is_batch_independent():
    """Round 4 determinism fix: the geodesic distance must be a pure
    function of the row — splitting a batch must not change any value
    (the old batch-level convergence break made the last ~1e-13 of
    lambda depend on the slowest row in the batch)."""
    import numpy as np

    from tzengine import geom

    rng = np.random.default_rng(44)
    n = 500
    lat1 = rng.uniform(-80, 80, n)
    lon1 = rng.uniform(-179, 179, n)
    lat2 = lat1 + rng.normal(0, 2.0, n)
    lon2 = lon1 + rng.normal(0, 2.0, n)
    full = geom.geodesic_distance_wgs84(lat1, lon1, lat2, lon2, freeze=True)
    # the strongest partitioning: every row evaluated as a SINGLETON
    # batch (rows that converge in a batch's final iteration are exactly
    # where the old break leaked body(lambda_penultimate) — 215/500 of
    # these rows differed under the first freeze attempt)
    singles = np.array([
        geom.geodesic_distance_wgs84(
            lat1[i:i + 1], lon1[i:i + 1], lat2[i:i + 1], lon2[i:i + 1],
            freeze=True,
        )[0]
        for i in range(n)
    ])
    np.testing.assert_array_equal(full, singles)
    # and an uneven split
    parts = np.concatenate([
        geom.geodesic_distance_wgs84(
            lat1[:77], lon1[:77], lat2[:77], lon2[:77], freeze=True),
        geom.geodesic_distance_wgs84(
            lat1[77:], lon1[77:], lat2[77:], lon2[77:], freeze=True),
    ])
    np.testing.assert_array_equal(full, parts)
    # fixed-iteration variant (the DEFAULT since round 5): also pure,
    # trivially batch-independent, and ~identical to the frozen one
    fixed = geom.geodesic_distance_wgs84(lat1, lon1, lat2, lon2)
    np.testing.assert_allclose(fixed, full, rtol=0, atol=1e-5)
    fixed_singles = np.array([
        geom.geodesic_distance_wgs84(
            lat1[i:i + 1], lon1[i:i + 1], lat2[i:i + 1], lon2[i:i + 1]
        )[0]
        for i in range(0, n, 25)
    ])
    np.testing.assert_array_equal(fixed[::25], fixed_singles)


def test_geodesic_metric_aliases_and_default():
    """Round 5 (VERDICT r4 #3): metric="geodesic" IS the fixed-iteration
    Vincenty ("geodesic_fixed" aliases it); "geodesic_freeze" opts into
    the adaptive variant; both agree to well under a micrometer."""
    import numpy as np

    from tzengine import index as indexmod, probe
    from tzengine.zones import synthetic_world

    idx = indexmod.compile_index(synthetic_world(), -90, -180, 90, 180, "s1")
    rng = np.random.default_rng(7)
    lats = rng.uniform(0.2, 9.7, 64)
    lons = rng.uniform(0.2, 9.7, 64)
    offsets, ranks, _valid = probe.probe_ranks(idx, lats, lons, mode="pipeline")
    zids = [
        idx.zone_ids[ranks[offsets[i]]] if offsets[i + 1] > offsets[i] else None
        for i in range(len(lats))
    ]
    d_def = probe.distance_from_boundary_batch(
        idx, zids, lats, lons, mode="pipeline")
    d_fixed = probe.distance_from_boundary_batch(
        idx, zids, lats, lons, mode="pipeline", metric="geodesic_fixed")
    d_frz = probe.distance_from_boundary_batch(
        idx, zids, lats, lons, mode="pipeline", metric="geodesic_freeze")
    np.testing.assert_array_equal(d_def, d_fixed)  # alias = bit-identical
    np.testing.assert_allclose(d_frz, d_def, rtol=0, atol=1e-5)
    import pytest

    with pytest.raises(ValueError, match="unknown metric"):
        probe.distance_from_boundary_batch(
            idx, zids, lats, lons, mode="pipeline", metric="vincenty")
