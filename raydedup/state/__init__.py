"""Shared run-scoped state: the counter/metrics accumulator.

The reference prints a per-run sanity metric (nonzero-pair count,
/root/reference/jaccard.cpp:811-819) and, under EVENT_PROFILE, per-kernel
timings (/root/reference/standalone_algorithms.hpp:38-47).  This package
is the distributed analogue: a zero-CPU counter actor that map tasks
increment fire-and-forget, read once by the driver at the end of a run.
"""

from .counters import RunCounters

__all__ = ["RunCounters"]
