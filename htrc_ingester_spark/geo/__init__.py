"""Geospatial cell indexes (H3-lite / S2-lite) and planar geometry kernels."""
