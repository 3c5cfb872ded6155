"""Profile / layer model — the user-extension surface.

Re-expresses the reference's ``Profile`` + ``FeatureCollector`` contract
(``Profile.java:36-293``, ``FeatureCollector.java:514-642``) in Ray terms: a
profile is (a) a set of vectorized batch transforms that turn source rows
into feature rows, and (b) per-layer assembly settings (sort-key ordering,
label-grid limits, merge behavior) applied inside the per-tile ``map_groups``
assembler.  Zoom-dependent values use :class:`ZoomFunction`
(``util/ZoomFunction.java:13-80`` analogue).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class ZoomFunction:
    """A value that varies by zoom: dict of thresholds -> value, resolved as
    the value of the highest min-zoom <= z (reference semantics)."""

    def __init__(self, by_zoom: dict[int, object], default=None):
        self.items = sorted(by_zoom.items())
        self.default = default

    def at(self, z: int):
        out = self.default
        for mz, v in self.items:
            if z >= mz:
                out = v
        return out


def resolve_zoom(value, z: int):
    return value.at(z) if isinstance(value, ZoomFunction) else value


@dataclass
class LayerSpec:
    """Per-layer assembly configuration (FeatureCollector.Feature knobs)."""

    name: str
    attr_cols: tuple[str, ...] = ()
    sort_key_col: str | None = None  # int32 column, 22-bit range
    # label grid (points): per-cell top-k by sort-key order
    label_grid_px: object | None = None  # float or ZoomFunction
    label_grid_limit: object | None = None  # int or ZoomFunction
    buffer_px: float = 4.0
    min_zoom: int = 0
    max_zoom: int = 14
    # post-processing in the assembler (FeatureMerge analogues)
    merge_points: bool = False      # mergeMultiPoint: attr-grouped multipoint
    merge_lines: bool = False       # mergeLineStrings via LoopLineMerger-lite
    merge_polygons: bool = False    # mergeMultiPolygon: attr-grouped concat
    # mergeNearbyPolygons (buffer∘union∘unbuffer on the tile raster lattice,
    # geo/rasterunion.py) — the z13 building-merge capability
    merge_polygons_union: bool = False
    merge_buffer_px: float = 0.0    # dilation radius for the union merge
    merge_min_area_px: float = 1.0  # drop merged rings smaller than this
    merge_min_length: float = 0.0   # px; drop merged chains shorter than this
    merge_strokes: bool = False     # merge straightest pair through junctions
    # zoom-gated attributes (ZoomFunction-in-attrs semantics,
    # FeatureCollector.java:994-1027): attr col -> min zoom it appears at
    attr_min_zoom: dict = field(default_factory=dict)
    # user hook: fn(features: list[dict], z: int) -> list[dict], applied after
    # merging (Profile.postProcessLayerFeatures, Profile.java:219-227 region)
    post_process: object = None


@dataclass
class TilingProfile:
    """A complete tiling profile: layers + archive metadata + hooks."""

    name: str
    layers: dict[str, LayerSpec] = field(default_factory=dict)
    attribution: str = ""
    description: str = ""
    # user hook: fn(layers: dict[str, list[dict]], z, x, y) -> same shape,
    # applied across ALL layers of a tile just before MVT encoding
    # (Profile.postProcessTileFeatures)
    post_process_tile: object = None

    def add(self, spec: LayerSpec) -> "TilingProfile":
        self.layers[spec.name] = spec
        return self

    def layer(self, name: str) -> LayerSpec:
        return self.layers.get(name) or LayerSpec(name=name)


def flagship_profile() -> TilingProfile:
    """The built-in web-geo profile: geoparsed mentions as a label-gridded
    point layer + admin polygons as a filled polygon layer."""
    p = TilingProfile(
        name="webgeo",
        description="Geoparsed Common-Crawl-style mentions + admin polygons",
    )
    p.add(
        LayerSpec(
            name="places",
            attr_cols=("lang", "admin_id", "poi_id"),
            sort_key_col=None,
            label_grid_px=ZoomFunction({0: 64.0, 8: None}),  # limit only below z8
            label_grid_limit=ZoomFunction({0: 8, 8: None}),
            min_zoom=0,
            max_zoom=14,
        )
    )
    p.add(
        LayerSpec(
            name="admin",
            attr_cols=("name", "iso_code"),
            min_zoom=0,
            max_zoom=7,
        )
    )
    return p
