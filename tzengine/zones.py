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
    stats give the reference's deserialize-free pruning, SURVEY §2.A B8)."""
    return spark.createDataFrame(pieces_to_rows(pieces), schema=ZONES_SCHEMA_DDL)


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
