"""Tile archive sinks: files (z/x/y.pbf), MBTiles (sqlite), PMTiles (v3)."""
