"""Pure-numpy geospatial kernel: projections, tile ids, Hilbert/S2/hex
indexes, clipping, simplification, point-in-polygon, WKB, MVT."""
