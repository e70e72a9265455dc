"""Grid model: fixed lat/lng tiling of the globe.

Reference: the ``Grid`` enum (app/models/enum/pixetl.py:25-57) — e.g.
``10/40000`` = 10°×10° tiles of 40000×40000 pixels; tile ids name the NW
corner (``50N_010E`` style, tile_scheme="nw", queries.py SourceLayer).

All pixel→coordinate math here is exact integer/float arithmetic usable
both driver-side (tile pruning) and as native Spark column expressions
(pixels.py) — never a Python UDF.
"""

from __future__ import annotations

import math
from dataclasses import dataclass


@dataclass(frozen=True)
class Grid:
    """``{tile_deg}/{pixels_per_side}``, NW-cornered tile ids."""

    tile_deg: float
    pixels_per_side: int

    @classmethod
    def parse(cls, spec: str) -> Grid:
        tile_deg, pixels = spec.split("/")
        return cls(float(tile_deg), int(pixels))

    @property
    def name(self) -> str:
        tile = int(self.tile_deg) if self.tile_deg == int(self.tile_deg) else self.tile_deg
        return f"{tile}/{self.pixels_per_side}"

    @property
    def pixel_size(self) -> float:
        return self.tile_deg / self.pixels_per_side

    # -- tile ids -----------------------------------------------------------

    @staticmethod
    def format_tile_id(lat_nw: float, lon_nw: float) -> str:
        ns = "N" if lat_nw >= 0 else "S"
        ew = "E" if lon_nw >= 0 else "W"
        return f"{abs(int(lat_nw)):02d}{ns}_{abs(int(lon_nw)):03d}{ew}"

    @staticmethod
    def parse_tile_id(tile_id: str) -> tuple[float, float]:
        """tile id → (lat_nw, lon_nw)."""
        lat_part, lon_part = tile_id.split("_")
        lat = float(lat_part[:-1]) * (1 if lat_part[-1] == "N" else -1)
        lon = float(lon_part[:-1]) * (1 if lon_part[-1] == "E" else -1)
        return lat, lon

    def tile_id_for(self, lat: float, lon: float) -> str:
        """The tile containing a point. A tile named by its NW corner covers
        ``[lat_nw - tile_deg, lat_nw) × [lon_nw, lon_nw + tile_deg)``."""
        step = self.tile_deg
        lat_nw = math.floor(lat / step) * step + step
        lon_nw = math.floor(lon / step) * step
        return self.format_tile_id(lat_nw, lon_nw)

    def tiles_overlapping(self, bbox: tuple[float, float, float, float]) -> list[str]:
        """All tile ids whose extent intersects [xmin, ymin, xmax, ymax] —
        the driver-side prune that keeps a zonal query from touching the
        global tile set (partition pruning does the same inside Spark)."""
        xmin, ymin, xmax, ymax = bbox
        step = self.tile_deg
        tiles = []
        lon_nw = math.floor(xmin / step) * step
        while lon_nw <= xmax:
            lat_nw = math.floor(ymin / step) * step + step
            while lat_nw - step <= ymax:
                tiles.append(self.format_tile_id(lat_nw, lon_nw))
                lat_nw += step
            lon_nw += step
        return sorted(set(tiles))
