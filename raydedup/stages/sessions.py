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
