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
