"""Pure-Python reference-semantics oracle (no cell index).

Mirrors the reference pipeline literally, step by step (TimeZoneMap.kt:
156-243 and 56-85): float32 vertices → bbox prune → pre-clip area sort
with stable ingest-order ties → envelope clip → linear scan with
boundary-inclusive PIP, smallest-area-first. Used by the e2e tests to
validate that the engine's broadcast cell index changes NOTHING about
results — only speed.
"""

from __future__ import annotations

import numpy as np

from . import geom
from .index import validate_region
from .probe import OUTSIDE_MSG
from .zones import ZonePiece


class OracleMap:
    def __init__(
        self,
        pieces: list[ZonePiece],
        min_lat: float,
        min_lon: float,
        max_lat: float,
        max_lon: float,
    ):
        validate_region(min_lat, min_lon, max_lat, max_lon)
        self.init_region = (min_lat, min_lon, max_lat, max_lon)

        kept = []
        for p in pieces:
            lo_lon, lo_lat, hi_lon, hi_lat = p.bbox
            if (
                hi_lat < min_lat
                or lo_lat > max_lat
                or hi_lon < min_lon
                or lo_lon > max_lon
            ):
                continue
            kept.append(p)
        kept.sort(key=lambda p: (p.area2d, p.ordinal))

        # I12 incl. the flatMap split: each connected component of a clip
        # result is its own entry (TimeZoneMap.kt:220-235)
        self.entries: list[tuple[str, list[np.ndarray]]] = []
        for p in kept:
            lo_lon, lo_lat, hi_lon, hi_lat = p.bbox
            if (
                lo_lat >= min_lat
                and hi_lat <= max_lat
                and lo_lon >= min_lon
                and hi_lon <= max_lon
            ):
                self.entries.append((p.zone_id, p.rings))
                continue
            for rings in geom.clip_rings_to_box_split(
                p.rings, min_lon, min_lat, max_lon, max_lat
            ):
                if not rings or geom.polygon_area2d(rings) <= 0:
                    continue
                self.entries.append((p.zone_id, rings))

    def get_overlapping_time_zones(self, lat: float, lon: float) -> list[str]:
        min_lat, min_lon, max_lat, max_lon = self.init_region
        if not (min_lat <= lat <= max_lat and min_lon <= lon <= max_lon):
            raise ValueError(OUTSIDE_MSG)
        pt = np.array([[lon, lat]])
        return [
            zid for zid, rings in self.entries if geom.contains_inclusive(pt, rings)[0]
        ]

    def get_overlapping_time_zone(self, lat: float, lon: float) -> str | None:
        zones = self.get_overlapping_time_zones(lat, lon)
        return zones[0] if zones else None
