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
        reads.  The read side absorbs that race heuristically: poll
        until THREE consecutive reads spaced 75 ms apart agree (bounded
        by ``settle_s``).  One settle per run on the driver is far
        cheaper than one blocking RTT per batch across every worker.

        Honest limits: a message delayed past the stability window, or
        queued in a worker process that dies AFTER its task completed,
        is lost — counters are flow telemetry (the reference's printed
        sanity metric), never inputs to the data path, which is why the
        trade is acceptable.  Raise ``settle_s`` on pathological
        hosts."""
        out = ray.get(self._actor.get.remote())
        stable = 0
        deadline = time.perf_counter() + settle_s
        while time.perf_counter() < deadline:
            time.sleep(0.075)
            nxt = ray.get(self._actor.get.remote())
            if nxt == out:
                stable += 1
                if stable >= 2:
                    break
            else:
                stable = 0
                out = nxt
        out.update({f"time_{k}_s": round(v, 3)
                    for k, v in self.timings.items()})
        return out
