"""Geometry + raster math function library (pure Python/NumPy)."""
