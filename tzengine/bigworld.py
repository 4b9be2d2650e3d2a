"""World-scale synthetic zone set (stress/scale fixture).

The real 2020d archive has >400 polygonal zone entries
(TimeZoneMapTest.java:283) with vertex counts in the hundreds-to-
thousands; this generator produces a comparable deterministic world so
compile time, broadcast size, and probe throughput can be evidenced at
reference scale without the (network-only) real GeoJSON:

- a G×G grid of star-shaped simple polygons (random radii around the
  tile center → guaranteed simple, no self-intersections), each with
  ``verts`` vertices, some enlarged to overlap neighbours (disputed-area
  stand-ins), a few multi-polygon zones, plus a world-covering filler —
  so every point matches ≥1 zone and overlap ordering is exercised.
"""

from __future__ import annotations

import numpy as np

from .zones import ZonePiece, make_piece, _rect


def big_world(
    grid: int = 21, verts: int = 96, seed: int = 42
) -> list[ZonePiece]:
    """~grid² + filler pieces over lat∈[-63,63], lon∈[-63,63]."""
    rng = np.random.default_rng(seed)
    pieces: list[ZonePiece] = []
    ordinal = 0
    span = 126.0
    tile = span / grid
    for gy in range(grid):
        for gx in range(grid):
            cx = -63.0 + (gx + 0.5) * tile
            cy = -63.0 + (gy + 0.5) * tile
            # star polygon: radii in [0.35, 0.52] * tile (slight overlap
            # with neighbours for ~10% of tiles)
            overlap = rng.uniform() < 0.1
            rmax = 0.75 if overlap else 0.52
            ang = np.linspace(0.0, 2 * np.pi, verts, endpoint=False)
            radii = rng.uniform(0.35, rmax, verts) * tile
            lon = cx + radii * np.cos(ang)
            lat = cy + radii * np.sin(ang)
            # CW orientation in (lon,lat): reverse the CCW angles
            ring = [(float(la), float(lo)) for la, lo in zip(lat[::-1], lon[::-1])]
            zid = f"Zone/G{gy:02d}x{gx:02d}"
            pieces.append(make_piece(zid, 0, ordinal, [ring]))
            ordinal += 1
            # every 37th zone gets a small second polygon (MultiPolygon)
            if (gy * grid + gx) % 37 == 5:
                r2 = [
                    (float(cy + 0.1 * tile), float(cx + 0.6 * tile)),
                    (float(cy + 0.2 * tile), float(cx + 0.75 * tile)),
                    (float(cy - 0.05 * tile), float(cx + 0.8 * tile)),
                ]
                pieces.append(make_piece(zid, 1, ordinal, [r2]))
                ordinal += 1
    pieces.append(
        make_piece("Zone/Ocean", 0, ordinal, [_rect(-63.0, -63.0, 63.0, 63.0)])
    )
    return pieces
