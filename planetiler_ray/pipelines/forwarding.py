"""ForwardingProfile — the handler-registry profile surface
(``ForwardingProfile.java:36-397`` capability, Ray-Data-first).

The reference lets a profile be assembled from small per-layer handlers:
``registerSourceHandler(source, h)`` / ``registerFeatureHandler(h)`` /
``registerHandler(h)`` with interface-based dispatch (layer post-processors,
tile post-processors, finish handlers), plus ``only_layers`` /
``exclude_layers`` gating and per-handler ``filter()`` expressions.

Here a handler is duck-typed (implement any subset):

* ``layer_name``      — the layer this handler owns (HandlerForLayer);
* ``filter_expr``     — an :mod:`..functions.expression` Expression gating
  which rows the handler sees (evaluated VECTORIZED per batch — the
  restatement of ``FeatureProcessor.filter()``);
* ``process_batch(batch) -> pa.Table | None`` — emit feature rows
  (FeatureProcessor.processFeature, batch-at-a-time);
* ``layer_spec``      — a :class:`.profile.LayerSpec` describing how the
  assembler should treat the layer;
* ``post_process_layer(features, z)`` — LayerPostProcessor;
* ``post_process_tile(layers, z, x, y)`` — TilePostProcessor;
* ``on_finish(source)`` — FinishHandler.

``process_source_batch`` is a ``map_batches``-shaped body: each worker holds
the (immutable) registry, rows flow through every registered handler whose
source/layer/filter gates pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .profile import LayerSpec, TilingProfile


class ForwardingProfile:
    def __init__(self, name: str = "forwarding", only_layers=None,
                 exclude_layers=None):
        self.name = name
        self.only_layers = set(only_layers or ())
        self.exclude_layers = set(exclude_layers or ())
        self._by_source: dict[str, list] = {}
        self._all_sources: list = []
        self._layer_post: dict[str, list] = {}
        self._tile_post: list = []
        self._finish: list = []
        self._specs: dict[str, LayerSpec] = {}

    # ------------------------------------------------------------- gating --
    def cares_about_layer(self, layer: str) -> bool:
        """(only empty or listed) and not excluded — ``:85`` semantics."""
        return (not self.only_layers or layer in self.only_layers) and (
            layer not in self.exclude_layers
        )

    def cares_about_source(self, source: str) -> bool:
        return bool(self._all_sources) or source in self._by_source

    # ------------------------------------------------------- registration --
    def register_source_handler(self, source: str, handler) -> "ForwardingProfile":
        self._register(handler, self._by_source.setdefault(source, []))
        return self

    def register_feature_handler(self, handler) -> "ForwardingProfile":
        self._register(handler, self._all_sources)
        return self

    def register_handler(self, handler) -> "ForwardingProfile":
        """Interface-based dispatch (``registerHandler``, ``:152-180``):
        inspect which hooks the handler implements and wire each."""
        self._register(handler, None)
        return self

    def _register(self, handler, processor_bucket) -> None:
        layer = getattr(handler, "layer_name", None)
        if layer is not None and not self.cares_about_layer(layer):
            return
        if processor_bucket is not None and hasattr(handler, "process_batch"):
            processor_bucket.append(handler)
        elif processor_bucket is None and hasattr(handler, "process_batch"):
            self._all_sources.append(handler)
        if layer is not None and hasattr(handler, "post_process_layer"):
            self._layer_post.setdefault(layer, []).append(handler)
        if hasattr(handler, "post_process_tile"):
            self._tile_post.append(handler)
        if hasattr(handler, "on_finish"):
            self._finish.append(handler)
        spec = getattr(handler, "layer_spec", None)
        if spec is not None and self.cares_about_layer(spec.name):
            self._specs[spec.name] = spec

    # ---------------------------------------------------------- execution --
    def _handlers_for(self, source: str):
        return self._by_source.get(source, []) + self._all_sources

    def process_source_batch(self, source: str, batch: pa.Table) -> pa.Table | None:
        """Run every gated handler over the batch; concat emitted rows.
        Usable directly as a ``map_batches`` body via ``functools.partial``.
        """
        outs = []
        for h in self._handlers_for(source):
            sub = batch
            expr = getattr(h, "filter_expr", None)
            if expr is not None:
                mask = expr.evaluate(batch)
                if not mask.any():
                    continue
                sub = batch.filter(pa.array(mask))
            out = h.process_batch(sub)
            if out is not None and out.num_rows:
                outs.append(out)
        if not outs:
            return None
        return pa.concat_tables(outs, promote_options="default")

    def finish(self, source: str) -> None:
        for h in self._finish:
            h.on_finish(source)

    # ------------------------------------------------------------ adapter --
    def to_tiling_profile(self) -> TilingProfile:
        """Materialize the registry as the assembler-facing profile: layer
        specs with chained per-layer post hooks + one combined tile hook."""
        prof = TilingProfile(name=self.name)
        for layer, spec in self._specs.items():
            posts = self._layer_post.get(layer, [])
            if posts:
                user = spec.post_process

                def chained(features, z, _posts=tuple(posts), _user=user):
                    for h in _posts:
                        features = h.post_process_layer(features, z)
                    return _user(features, z) if _user else features

                spec = _replace_post(spec, chained)
            prof.add(spec)
        if self._tile_post:
            tps = tuple(self._tile_post)

            def tile_hook(layers, z, x, y):
                layers = {k: v for k, v in layers.items() if self.cares_about_layer(k)}
                for h in tps:
                    layers = h.post_process_tile(layers, z, x, y)
                return layers

            prof.post_process_tile = tile_hook
        return prof


def _replace_post(spec: LayerSpec, post) -> LayerSpec:
    import dataclasses

    return dataclasses.replace(spec, post_process=post)
