"""Run-wide counters + per-stage timings.

A ``RunCounters`` is created on the driver; its underlying zero-CPU actor
handle is passed into stage closures (``counters=rc.actor``), which
increment it fire-and-forget from inside map/reduce tasks — the only
shared mutable state in the engine, deliberately tiny (a dict of ints).
This is the case the Dataset API genuinely can't express: a side-channel
metric that must survive task retries without joining the data path.

Counters mirror the reference's always-printed sanity metric
(/root/reference/jaccard.cpp:811-819); ``timed()`` mirrors EVENT_PROFILE
per-kernel timing (/root/reference/standalone_algorithms.hpp:38-47).
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import ray


@ray.remote(num_cpus=0)
class _CounterActor:
    def __init__(self):
        self._c: dict = {}

    def add(self, d: dict) -> None:
        for k, v in d.items():
            self._c[k] = self._c.get(k, 0) + v

    def get(self) -> dict:
        return dict(self._c)


class RunCounters:
    """Driver-side handle around the counter actor + local stage timings."""

    def __init__(self):
        self._actor = _CounterActor.remote()
        self.timings: dict[str, float] = {}

    @property
    def actor(self):
        """The raw actor handle — pass this into stage closures; tasks
        call ``actor.add.remote({...})``."""
        return self._actor

    def add(self, **kw) -> None:
        self._actor.add.remote(dict(kw))

    @contextmanager
    def timed(self, stage: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.timings[stage] = self.timings.get(stage, 0.0) + (
                time.perf_counter() - t0)

    def get(self) -> dict:
        """Counter values + ``time_<stage>_s`` timings, merged."""
        out = ray.get(self._actor.get.remote())
        out.update({f"time_{k}_s": round(v, 3)
                    for k, v in self.timings.items()})
        return out
