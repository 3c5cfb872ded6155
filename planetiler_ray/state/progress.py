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


class PushGateway:
    """Prometheus pushgateway client — ``stats/PrometheusStats.java:60-120``
    parity: the reference pushes the exposition payload to
    ``/metrics/job/<job>[/<label>/<value>...]`` every ~15 s.  Stdlib
    ``http.client`` transport (works against any reachable gateway, incl.
    loopback — exercised end-to-end in tests against a local HTTP server;
    the sandbox only lacks EXTERNAL network).  ``transport`` is injectable
    for tests/offline use: a callable ``(method, path, body, headers) ->
    status_code``.
    """

    def __init__(self, url: str, job: str = "planetiler_ray",
                 grouping: dict[str, str] | None = None, transport=None):
        from urllib.parse import urlparse

        u = urlparse(url)
        self.host = u.hostname or "127.0.0.1"
        self.port = u.port or 9091
        self.job = job
        self.grouping = grouping or {}
        self.transport = transport

    @property
    def path(self) -> str:
        parts = [f"/metrics/job/{_sanitize(self.job)}"]
        for k, v in sorted(self.grouping.items()):
            parts.append(f"/{_sanitize(k)}/{_sanitize(v)}")
        return "".join(parts)

    def push(self, extra_gauges: dict | None = None,
             snapshot: dict | None = None) -> int:
        """PUT the current exposition payload; returns the HTTP status."""
        body = prometheus_text(snapshot=snapshot,
                               extra_gauges=extra_gauges).encode()
        headers = {"Content-Type": "text/plain; version=0.0.4",
                   "Content-Length": str(len(body))}
        if self.transport is not None:
            return int(self.transport("PUT", self.path, body, headers))
        import http.client

        conn = http.client.HTTPConnection(self.host, self.port, timeout=10)
        try:
            conn.request("PUT", self.path, body=body, headers=headers)
            return conn.getresponse().status
        finally:
            conn.close()

    def start_pushing(self, interval_s: float = 15.0):
        """Background push loop (the reference's scheduled pusher).
        Returns a ``threading.Event``; set it to stop."""
        import threading

        stop = threading.Event()

        def loop():
            while not stop.wait(interval_s):
                try:
                    self.push()
                except Exception:
                    pass  # gateway outages never take down the build

        t = threading.Thread(target=loop, daemon=True)
        t.start()
        return stop
