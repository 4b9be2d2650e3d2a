"""Zone-set model + builder ETL (reference §2.A semantics, Spark-first).

A *zone piece* is one polygon of one zone: ``(zone_id, polygon_id, rings)``
— the reference splits MultiPolygon features into one entry per polygon
(builder/.../Main.kt:89,93) and flattens each serialized polygon's rings
into a single multi-path geometry (Util.kt:15-25). Rings are (V,2)
float64 arrays in (lon, lat) order whose values sit on the float32 grid
(Serialization.kt:12 storage type).

The zones *table* schema (SURVEY.md §1.3):

    zone_id   string
    polygon_id int        -- stable ordinal within the zone (tie-break)
    ordinal   int         -- global ingest ordinal (area-sort tie-break)
    rings     array<array<struct<lat float, lon float>>>
    min_lat/min_lon/max_lat/max_lon float   -- bbox, drives pruning (O1)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import geom


@dataclass
class ZonePiece:
    zone_id: str
    polygon_id: int
    ordinal: int  # global ingest order — the stable-sort tie-break (I11)
    rings: list[np.ndarray] = field(default_factory=list)  # (V,2) lon,lat

    @property
    def bbox(self) -> tuple[float, float, float, float]:
        """(min_lon, min_lat, max_lon, max_lat)."""
        return geom.rings_bbox(self.rings)

    @property
    def area2d(self) -> float:
        return geom.polygon_area2d(self.rings)


def make_piece(
    zone_id: str, polygon_id: int, ordinal: int, rings_latlon: list[list[tuple]]
) -> ZonePiece:
    """Build a piece from (lat, lon) vertex lists, applying the reference's
    double→float32→double round-trip (builder/.../Main.kt:41-42)."""
    rings = []
    for ring in rings_latlon:
        arr = geom.f32(np.asarray(ring, dtype=np.float64))
        rings.append(arr[:, ::-1].copy())  # (lat,lon) -> (lon,lat)
    return ZonePiece(zone_id, polygon_id, ordinal, rings)


def _rect(lat0, lon0, lat1, lon1):
    """Clockwise rectangle ring in (lat, lon) pairs (outer-ring convention,
    UtilTest.java:33-40)."""
    return [(lat1, lon0), (lat1, lon1), (lat0, lon1), (lat0, lon0)]


def square_with_island_rings_latlon():
    """The UtilTest.java:17-58 fixture in (lat, lon) form."""
    return [
        _rect(1, 1, 2, 2),
        # hole (CCW)
        [(1.9, 1.1), (1.5, 1.1), (1.5, 1.5), (1.9, 1.5)],
        # island (CW)
        [(1.7, 1.2), (1.7, 1.3), (1.6, 1.3), (1.6, 1.2)],
    ]


def synthetic_world() -> list[ZonePiece]:
    """Deterministic full-coverage zone world over lat∈[0,10], lon∈[0,10]
    (FIXTURES.md T4). Structure ports the TimeZoneMapTest scenarios:
    holes/islands, overlapping pair (Xinjiang case), MultiPolygon split,
    enclave-in-host, and an everything-covering filler (oceans stand-in)."""
    pieces = [
        make_piece("Zone/SquareIsland", 0, 0, square_with_island_rings_latlon()),
        make_piece("Zone/Small", 0, 1, [_rect(4, 4, 5, 5)]),
        make_piece("Zone/Big", 0, 2, [_rect(3, 3, 6, 6)]),
        make_piece("Zone/Multi", 0, 3, [_rect(7, 1, 8, 2)]),
        make_piece("Zone/Multi", 1, 4, [_rect(7, 3, 8, 4)]),
        make_piece("Zone/Enclave", 0, 5, [_rect(8.2, 6.2, 8.4, 6.4)]),
        make_piece("Zone/Host", 0, 6, [_rect(8, 6, 9, 7)]),
        make_piece("Zone/Filler", 0, 7, [_rect(0, 0, 10, 10)]),
    ]
    return pieces


WORLD_VERSION = "synth1"


# --- Spark table round-trip -------------------------------------------------

ZONES_SCHEMA_DDL = (
    "zone_id string, polygon_id int, ordinal int, "
    "rings array<array<struct<lat: float, lon: float>>>, "
    "min_lat float, min_lon float, max_lat float, max_lon float"
)


def pieces_to_rows(pieces: list[ZonePiece]) -> list[tuple]:
    rows = []
    for p in pieces:
        rings = [
            [(float(np.float32(v[1])), float(np.float32(v[0]))) for v in r]
            for r in p.rings
        ]
        lo_lon, lo_lat, hi_lon, hi_lat = p.bbox
        rows.append(
            (
                p.zone_id,
                p.polygon_id,
                p.ordinal,
                rings,
                float(np.float32(lo_lat)),
                float(np.float32(lo_lon)),
                float(np.float32(hi_lat)),
                float(np.float32(hi_lon)),
            )
        )
    return rows


def pieces_to_df(spark, pieces: list[ZonePiece]):
    """Zones table as a Spark DataFrame (bbox columns → Parquet min/max
    stats give the reference's deserialize-free pruning, SURVEY §2.A B8).

    Arrow-native construction: ring vertices go into one concatenated
    float32 buffer with CSR list offsets — zero per-vertex Python — so a
    1M-vertex coastline world builds in milliseconds instead of the
    seconds the nested-tuple row path took (the per-value float32 casts
    are exact: make_piece already snapped every vertex to the f32 grid).
    Result is row-identical to the historical pieces_to_rows path
    (asserted in tests)."""
    import pyarrow as pa

    if not pieces:
        return spark.createDataFrame([], schema=ZONES_SCHEMA_DDL)

    all_rings = [r for p in pieces for r in p.rings]
    ring_counts = np.array([len(p.rings) for p in pieces], dtype=np.int64)
    vert_counts = np.array([len(r) for r in all_rings], dtype=np.int64)
    verts = (
        np.concatenate(all_rings) if all_rings else np.zeros((0, 2))
    )  # (V, 2) as (lon, lat)
    struct_arr = pa.StructArray.from_arrays(
        [
            pa.array(verts[:, 1].astype(np.float32)),
            pa.array(verts[:, 0].astype(np.float32)),
        ],
        ["lat", "lon"],
    )
    voffs = np.zeros(len(all_rings) + 1, dtype=np.int64)
    np.cumsum(vert_counts, out=voffs[1:])
    roffs = np.zeros(len(pieces) + 1, dtype=np.int64)
    np.cumsum(ring_counts, out=roffs[1:])
    if voffs[-1] > np.iinfo(np.int32).max:
        raise ValueError(
            f"pieces_to_df: {int(voffs[-1])} vertices exceed Arrow int32 "
            "list-offset range (2^31-1); split the zone table"
        )
    ring_list = pa.ListArray.from_arrays(
        pa.array(voffs.astype(np.int32)), struct_arr
    )
    rings_col = pa.ListArray.from_arrays(
        pa.array(roffs.astype(np.int32)), ring_list
    )
    bb = np.array([p.bbox for p in pieces], dtype=np.float64)
    table = pa.table(
        {
            "zone_id": pa.array([p.zone_id for p in pieces], pa.string()),
            "polygon_id": pa.array(
                np.array([p.polygon_id for p in pieces], dtype=np.int32)
            ),
            "ordinal": pa.array(
                np.array([p.ordinal for p in pieces], dtype=np.int32)
            ),
            "rings": rings_col,
            "min_lat": pa.array(bb[:, 1].astype(np.float32)),
            "min_lon": pa.array(bb[:, 0].astype(np.float32)),
            "max_lat": pa.array(bb[:, 3].astype(np.float32)),
            "max_lon": pa.array(bb[:, 2].astype(np.float32)),
        }
    )
    return spark.createDataFrame(table)


def rows_to_pieces(rows) -> list[ZonePiece]:
    """Inverse of pieces_to_rows for driver-side compile. Accepts Row
    objects with fields (zone_id, polygon_id, ordinal, rings)."""
    pieces = []
    for r in rows:
        rings = [
            np.array([(v.lon, v.lat) for v in ring], dtype=np.float64)
            for ring in r.rings
        ]
        pieces.append(ZonePiece(r.zone_id, r.polygon_id, r.ordinal, rings))
    return pieces
