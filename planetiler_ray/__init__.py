"""planetiler_ray — a Ray-Data-native planet-scale tiling + spatial-join engine.

A from-scratch re-expression of the capabilities of onthegomap/planetiler
(reference read-only at /root/reference) as ray.data.Dataset pipelines over
zero-copy Arrow batches: geoparse -> spatial keying (tile/S2/hex) ->
point-in-polygon + kNN joins -> tile-keyed shuffle -> per-tile assembly
(simplify/merge/label-grid) -> MVT encode -> archive sinks
(files / MBTiles / PMTiles), plus the training-data operator suite
(dedup, ANN, text analysis, multimodal plumbing).
"""

__version__ = "0.1.0"
