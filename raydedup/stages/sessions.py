"""Event-log sessionization — the streaming-shaped workload pattern.

Ray Data has no event-time windows (SURVEY.md §2.9); stream-shaped
semantics are expressed over the partitioned, ts-sorted log: partition
by key (manual hash shuffle), sort each key's events by time inside the
partition, and cut sessions at gaps > timeout — all vectorized.
Ordering assumption: events of one user fit one partition (hash
partitioning guarantees it); within-partition order is established
locally.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions.hashing import splitmix64
from ..functions.shuffle import hash_partition_map


def sessionize(events_ds, cfg: PipelineConfig = DEFAULT_CONFIG,
               gap_minutes: int = 30, user_col: str = "user_id",
               ts_col: str = "ts"):
    """→ Dataset(user_id, session_id, n_events, session_start):
    0-based session ids per user, new session when the gap since the
    previous event exceeds ``gap_minutes``."""
    n_parts = cfg.resolved_partitions()
    gap_us = np.int64(gap_minutes * 60 * 1_000_000)

    def _tag(t: pa.Table) -> pa.Table:
        uid = np.asarray(t[user_col], dtype=np.int64)
        part = (splitmix64(uid.view(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            user_col: pa.array(uid, pa.int64()),
            ts_col: t[ts_col],
            "part": pa.array(part, pa.int64()),
        })

    ts_type = None

    def _sessions(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0:
            return pa.table({
                user_col: pa.array([], pa.int64()),
                "session_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "session_start": pa.array([], pa.timestamp("us")),
            })
        uid = np.asarray(tab[user_col], dtype=np.int64)
        ts = np.asarray(tab[ts_col].cast(pa.timestamp("us")), dtype="datetime64[us]") \
            .astype(np.int64)
        order = np.lexsort((ts, uid))
        uid, ts = uid[order], ts[order]
        new_user = np.empty(len(uid), dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        gap_break = np.empty(len(uid), dtype=bool)
        gap_break[0] = True
        gap_break[1:] = (ts[1:] - ts[:-1]) > gap_us
        new_sess = new_user | gap_break
        # session id = per-user running count of session starts
        sess_global = np.cumsum(new_sess) - 1
        user_start = np.where(new_user)[0]
        first_sess_of_user = sess_global[user_start]
        sess_id = sess_global - np.repeat(first_sess_of_user,
                                          np.diff(np.append(user_start, len(uid))))
        starts = np.flatnonzero(new_sess)
        counts = np.diff(np.append(starts, len(uid)))
        return pa.table({
            user_col: pa.array(uid[starts], pa.int64()),
            "session_id": pa.array(sess_id[starts], pa.int64()),
            "n_events": pa.array(counts, pa.int64()),
            "session_start": pa.array(ts[starts].astype("datetime64[us]"),
                                      pa.timestamp("us")),
        })

    tagged = events_ds.map_batches(_tag, batch_format="pyarrow",
                                   zero_copy_batch=True)
    return hash_partition_map(tagged, "part", _sessions, n_parts)


def user_gap_stats(events_ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                   user_col: str = "user_id", ts_col: str = "ts",
                   long_gap_minutes: int = 30):
    """→ Dataset(user_id, n_events, max_gap_us, n_long_gaps): per-user
    inter-arrival statistics — event count, the largest gap between
    consecutive events in exact integer microseconds (0 for single-event
    users, matching SQL ``coalesce(max(gap), 0)``), and how many gaps
    exceed ``long_gap_minutes`` (the session-break census).

    Deterministic under timestamp ties: permuting equal values in a
    sorted sequence leaves the consecutive-difference multiset
    unchanged, so the result does not depend on how the sort (or SQL's
    ``lag`` window) breaks ties.  Same single hash exchange by user as
    sessionize; per partition one lexsort + ``reduceat`` segment
    kernels — no Python loop over users."""
    n_parts = cfg.resolved_partitions()
    long_us = np.int64(long_gap_minutes) * 60 * 1_000_000

    def _tag(t: pa.Table) -> pa.Table:
        uid = np.asarray(t[user_col], dtype=np.int64)
        part = (splitmix64(uid.view(np.uint64))
                % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            user_col: pa.array(uid, pa.int64()),
            ts_col: t[ts_col],
            "part": pa.array(part, pa.int64()),
        })

    empty = pa.table({user_col: pa.array([], pa.int64()),
                      "n_events": pa.array([], pa.int64()),
                      "max_gap_us": pa.array([], pa.int64()),
                      "n_long_gaps": pa.array([], pa.int64())})

    def _stats(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0:
            return empty
        uid = np.asarray(tab[user_col], dtype=np.int64)
        ts = np.asarray(tab[ts_col].cast(pa.timestamp("us")),
                        dtype="datetime64[us]").astype(np.int64)
        order = np.lexsort((ts, uid))
        uid, ts = uid[order], ts[order]
        new_user = np.empty(len(uid), dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new_user)
        counts = np.diff(np.append(starts, len(uid)))
        # diffs[i] = ts[i+1]-ts[i]; cross-user positions masked to 0 so
        # each reduceat segment [starts[u], starts[u+1]) over the
        # n-length padded array sees only user u's gaps (plus zeros)
        same = ~new_user[1:]
        diffs = np.where(same, ts[1:] - ts[:-1], 0)
        padded = np.append(diffs, np.int64(0))
        max_gap = np.maximum.reduceat(padded, starts)
        n_long = np.add.reduceat(
            np.append((same & (ts[1:] - ts[:-1] > long_us))
                      .astype(np.int64), 0), starts)
        return pa.table({
            user_col: pa.array(uid[starts], pa.int64()),
            "n_events": pa.array(counts, pa.int64()),
            "max_gap_us": pa.array(max_gap, pa.int64()),
            "n_long_gaps": pa.array(n_long, pa.int64()),
        })

    tagged = events_ds.map_batches(_tag, batch_format="pyarrow",
                                   zero_copy_batch=True)
    return hash_partition_map(tagged, "part", _stats, n_parts)


def funnel(events_ds, steps, cfg: PipelineConfig = DEFAULT_CONFIG, *,
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type"):
    """Sequential funnel: users who performed every step of ``steps``
    IN ORDER (each step's timestamp strictly after the previous step's)
    → Dataset(user_id, <step>_ts per step) with the EARLIEST valid
    timestamp per step (greedy-earliest semantics — the standard
    product-analytics funnel definition, and the one SQL's
    min-after-previous chain expresses).

    One hash exchange by user; per partition everything is one lexsort
    + one vectorized pass per step (per-user state is a threshold
    array indexed by user rank — no Python loop over users)."""
    n_parts = cfg.resolved_partitions()
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")

    def _tag(t: pa.Table) -> pa.Table:
        # only funnel-step rows travel
        keep = pc.is_in(t[type_col], value_set=pa.array(steps, pa.string()))
        t = t.filter(keep)
        uid = np.asarray(t[user_col], dtype=np.int64)
        part = (splitmix64(uid.view(np.uint64))
                % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            user_col: pa.array(uid, pa.int64()),
            ts_col: t[ts_col],
            type_col: t[type_col],
            "part": pa.array(part, pa.int64()),
        })

    empty_cols = {user_col: pa.array([], pa.int64())}
    for s in steps:
        empty_cols[f"{s}_ts"] = pa.array([], pa.timestamp("us"))
    empty = pa.table(empty_cols)

    DEAD = np.iinfo(np.int64).max
    START = np.iinfo(np.int64).min

    def _funnel(tab: pa.Table | None) -> pa.Table:
        if tab is None or tab.num_columns == 0 or not len(tab):
            return empty
        uid = np.asarray(tab[user_col], dtype=np.int64)
        ts = np.asarray(tab[ts_col].cast(pa.timestamp("us")),
                        dtype="datetime64[us]").astype(np.int64)
        typ = tab[type_col].combine_chunks()
        st = np.full(len(uid), -1, dtype=np.int64)
        for i, s in enumerate(steps):
            st[np.asarray(pc.equal(typ, s)).nonzero()] = i
        order = np.lexsort((ts, uid))
        uid, ts, st = uid[order], ts[order], st[order]
        uniq, inv = np.unique(uid, return_inverse=True)
        thr = np.full(len(uniq), START, dtype=np.int64)
        step_ts = []
        for i in range(len(steps)):
            rows = np.flatnonzero((st == i) & (ts > thr[inv]))
            nxt = np.full(len(uniq), DEAD, dtype=np.int64)
            if len(rows):
                ur = inv[rows]
                # rows are (user, ts)-sorted → first per user = earliest
                first = np.ones(len(ur), dtype=bool)
                first[1:] = ur[1:] != ur[:-1]
                nxt[ur[first]] = ts[rows[first]]
            thr = nxt                      # DEAD never revives: ts > max
            step_ts.append(thr.copy())
        alive = step_ts[-1] != DEAD
        out = {user_col: pa.array(uniq[alive], pa.int64())}
        for s, col in zip(steps, step_ts):
            out[f"{s}_ts"] = pa.array(
                col[alive].astype("datetime64[us]"), pa.timestamp("us"))
        return pa.table(out)

    tagged = events_ds.map_batches(_tag, batch_format="pyarrow",
                                   zero_copy_batch=True)
    return hash_partition_map(tagged, "part", _funnel, n_parts)
