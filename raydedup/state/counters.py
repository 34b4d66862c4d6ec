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

    def get(self, settle_s: float = 2.0) -> dict:
        """Counter values + ``time_<stage>_s`` timings, merged.

        Adds from map/reduce tasks are fire-and-forget (no per-batch
        actor round-trip in hot paths), so an add submitted by a worker
        whose task just completed may still be in flight when the driver
        reads.  The read side absorbs that race: poll until two
        consecutive reads agree (typically one extra RTT; bounded by
        ``settle_s``).  One settle per run on the driver is far cheaper
        than one blocking RTT per batch across every worker."""
        out = ray.get(self._actor.get.remote())
        deadline = time.perf_counter() + settle_s
        while time.perf_counter() < deadline:
            time.sleep(0.05)
            nxt = ray.get(self._actor.get.remote())
            if nxt == out:
                break
            out = nxt
        out.update({f"time_{k}_s": round(v, 3)
                    for k, v in self.timings.items()})
        return out
