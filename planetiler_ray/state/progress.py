"""Progress counters — ``stats/ProgressLoggers.java`` / ``stats/Stats.java``
analogue: a named Ray actor accumulating per-stage row/byte counters that any
task or actor can increment; the driver polls and prints rate lines.

Usage:
    counters = Counters.get()              # named detached-ish actor handle
    ds.map_batches(count_stage("render"))  # passthrough stage that counts
    print(ray.get(counters.snapshot.remote()))
"""

from __future__ import annotations

import time

import pyarrow as pa

import ray

_ACTOR_NAME = "planetiler_ray_counters"


@ray.remote(num_cpus=0)
class _CountersActor:
    def __init__(self):
        self.counts: dict[str, int] = {}
        self.t0 = time.time()

    def add(self, name: str, n: int):
        self.counts[name] = self.counts.get(name, 0) + int(n)

    def snapshot(self) -> dict:
        dt = max(time.time() - self.t0, 1e-9)
        return {
            "elapsed_s": round(dt, 1),
            "counts": dict(self.counts),
            "rates_per_s": {k: round(v / dt, 1) for k, v in self.counts.items()},
        }

    def reset(self):
        self.counts.clear()
        self.t0 = time.time()


class Counters:
    @staticmethod
    def get():
        try:
            return ray.get_actor(_ACTOR_NAME)
        except ValueError:
            return _CountersActor.options(name=_ACTOR_NAME, lifetime=None).remote()


def count_stage(name: str):
    """A passthrough map_batches body that increments the rows counter for
    ``name`` (fire-and-forget; never blocks the data path)."""

    def f(batch: pa.Table) -> pa.Table:
        try:
            actor = ray.get_actor(_ACTOR_NAME)
            actor.add.remote(name, batch.num_rows)
        except ValueError:
            pass
        return batch

    return f


# --------------------------------------------------- prometheus exposition --

_PROM_PREFIX = "planetiler_ray"


def _sanitize(name: str) -> str:
    import re

    return re.sub(r"[^a-zA-Z0-9_:]", "_", name)


def prometheus_text(snapshot: dict | None = None, extra_gauges: dict | None = None) -> str:
    """Render counters as Prometheus text exposition format —
    ``stats/PrometheusStats.java`` capability (:41-260: processed elements,
    emitted features, written tiles, data errors as labelled counters, plus
    gauges).  The reference PUSHES to a pushgateway every ~15 s; this
    sandbox has no network, so the equivalent surface is the exposition
    string + :func:`write_prometheus_textfile` (the node-exporter textfile-
    collector pattern — same scrape semantics, file transport).

    Counter-name convention: plain names become
    ``planetiler_ray_<name>_total``; names like ``stage:layer`` become a
    labelled series ``planetiler_ray_stage_total{label="layer"}``.
    """
    if snapshot is None:
        snapshot = ray.get(Counters.get().snapshot.remote())
    lines: list[str] = []
    grouped: dict[str, list[tuple[str | None, int]]] = {}
    for name, v in sorted(snapshot.get("counts", {}).items()):
        if ":" in name:
            base, label = name.split(":", 1)
            grouped.setdefault(base, []).append((label, v))
        else:
            grouped.setdefault(name, []).append((None, v))
    for base, series in grouped.items():
        metric = f"{_PROM_PREFIX}_{_sanitize(base)}_total"
        lines.append(f"# TYPE {metric} counter")
        for label, v in series:
            if label is None:
                lines.append(f"{metric} {v}")
            else:
                lines.append(f'{metric}{{label="{_sanitize(label)}"}} {v}')
    g = {"elapsed_seconds": snapshot.get("elapsed_s", 0.0)}
    g.update(extra_gauges or {})
    for name, v in sorted(g.items()):
        metric = f"{_PROM_PREFIX}_{_sanitize(name)}"
        lines.append(f"# TYPE {metric} gauge")
        lines.append(f"{metric} {v}")
    return "\n".join(lines) + "\n"


def write_prometheus_textfile(path: str, extra_gauges: dict | None = None) -> str:
    """Atomically write the current counters in exposition format (for a
    node-exporter textfile collector / post-run scrape)."""
    import os

    text = prometheus_text(extra_gauges=extra_gauges)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(text)
    os.replace(tmp, path)
    return text
