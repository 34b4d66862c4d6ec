"""Temporal operators Ray Data has no native form for: as-of join and
event-time sliding-window aggregation.

Both follow the sessionize pattern (stages/sessions.py): ONE manual hash
exchange partitions rows by key, each partition is lexsorted by
(key, ts) locally, and the temporal semantics are computed with
whole-array numpy — no per-row and no per-key Python loops on the fast
path.  Ordering assumption (documented per SURVEY.md §2 custom-operator
rule): all rows of one key land in one partition (hash partitioning
guarantees it); within-partition order is established locally, so the
input needs no global sort.

The as-of match is a segmented forward-fill expressed as one
``np.maximum.accumulate`` over rank-offset composite keys; the window
aggregate is two ``np.searchsorted`` probes against a composite
(key_rank, ts) axis, falling back to a per-key-segment probe loop only
when the composite would overflow int64 (astronomically wide ts spans).
Windowed sums are computed over exact integer cents (cumsum
difference), so results are bit-identical regardless of summation
order — the float-sum trap events_hourly already documents.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions.hashing import splitmix64
from ..functions.shuffle import hash_partition_map

_US_PER_MINUTE = 60 * 1_000_000


def _part_of(ids: np.ndarray, n_parts: int) -> np.ndarray:
    return (splitmix64(ids.astype(np.int64).view(np.uint64))
            % np.uint64(n_parts)).astype(np.int64)


def _ts_int64(col) -> np.ndarray:
    return np.asarray(col.cast(pa.timestamp("us")),
                      dtype="datetime64[us]").astype(np.int64)


def _key_ranks(keys: np.ndarray) -> np.ndarray:
    """0-based dense rank of each row's key over a key-sorted array."""
    new = np.empty(len(keys), dtype=bool)
    new[0] = True
    new[1:] = keys[1:] != keys[:-1]
    return np.cumsum(new) - 1


def asof_join(left_ds, right_ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
              key_col: str = "user_id", ts_col: str = "ts",
              value_col: str = "value", out_col: str = "asof_value",
              id_col: str = "event_id"):
    """→ Dataset(id_col, key_col, ts_col, out_col): each left row joined
    to the LATEST right row with the same key and right.ts <= left.ts
    (inclusive, like SQL ``ASOF JOIN ... ON l.ts >= r.ts``); ``out_col``
    is null when no such right row exists.  ``value_col`` must be int64
    on the right side (callers convert floats to exact integer units
    first — see q_events_asof).

    One exchange: both sides are tagged (side right=0 / left=1) and
    hash-partitioned by key; per partition, rows are lexsorted by
    (key, ts, side, value) — right before left at equal ts, which
    implements the inclusive bound — and the match is a segmented
    forward-fill of "index of last right row seen": with S = n+1 and
    per-row key rank r, ``acc = maximum.accumulate(r*S + (i+1 if right
    else 0))`` stays within rank r's band (earlier ranks max out at
    r*S - 1), so ``acc - r*S`` is 1 + the matched right index, 0 = no
    match.

    Tie rule (part of the operator contract, not left to arrival
    order): when SEVERAL right rows share the matched (key, ts), the
    one with the MAXIMUM value wins — value is the lexsort's final
    component, so the max-value row sits last in the tie run and the
    forward-fill (which keeps the highest index) selects it
    deterministically.  SQL ASOF JOIN leaves this tie
    implementation-defined; oracles pre-aggregate ``max(value)`` per
    (key, ts) to pin the same rule.
    """
    n_parts = cfg.resolved_partitions()

    def _tag_left(t: pa.Table) -> pa.Table:
        keys = np.asarray(t[key_col], dtype=np.int64)
        return pa.table({
            "k": pa.array(keys, pa.int64()),
            "ts": t[ts_col].cast(pa.timestamp("us")),
            "rid": t[id_col].cast(pa.int64()),
            "v": pa.nulls(len(t), pa.int64()),
            "side": pa.array(np.ones(len(t), np.int8), pa.int8()),
            "part": pa.array(_part_of(keys, n_parts), pa.int64()),
        })

    def _tag_right(t: pa.Table) -> pa.Table:
        keys = np.asarray(t[key_col], dtype=np.int64)
        return pa.table({
            "k": pa.array(keys, pa.int64()),
            "ts": t[ts_col].cast(pa.timestamp("us")),
            "rid": pa.nulls(len(t), pa.int64()),
            "v": t[value_col].cast(pa.int64()),
            "side": pa.array(np.zeros(len(t), np.int8), pa.int8()),
            "part": pa.array(_part_of(keys, n_parts), pa.int64()),
        })

    empty = pa.table({
        id_col: pa.array([], pa.int64()),
        key_col: pa.array([], pa.int64()),
        ts_col: pa.array([], pa.timestamp("us")),
        out_col: pa.array([], pa.int64()),
    })

    def _join(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0:
            return empty
        keys = np.asarray(tab["k"], dtype=np.int64)
        ts = _ts_int64(tab["ts"])
        side = np.asarray(tab["side"], dtype=np.int8)
        vals = np.asarray(tab["v"].combine_chunks().fill_null(0),
                          dtype=np.int64)
        order = np.lexsort((vals, side, ts, keys))
        keys, ts, side, vals = keys[order], ts[order], side[order], vals[order]
        rid = np.asarray(tab["rid"].combine_chunks().fill_null(-1),
                         dtype=np.int64)[order]
        n = len(keys)
        rank = _key_ranks(keys)
        is_right = side == 0
        S = np.int64(n + 1)
        band = rank.astype(np.int64) * S
        marker = band + np.where(is_right, np.arange(1, n + 1, dtype=np.int64),
                                 np.int64(0))
        acc = np.maximum.accumulate(marker)
        j = acc - band            # 0 = no right row yet for this key
        left = ~is_right
        jl = j[left]
        matched = np.maximum(jl - 1, 0)
        out_vals = vals[matched]
        return pa.table({
            id_col: pa.array(rid[left], pa.int64()),
            key_col: pa.array(keys[left], pa.int64()),
            ts_col: pa.array(ts[left].astype("datetime64[us]"),
                             pa.timestamp("us")),
            out_col: pa.array(np.where(jl > 0, out_vals, 0), pa.int64(),
                              mask=(jl == 0)),
        })

    tagged = left_ds.map_batches(_tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(_tag_right, batch_format="pyarrow"))
    return hash_partition_map(tagged, "part", _join, n_parts)


def windowed_agg(events_ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                 key_col: str = "user_id", ts_col: str = "ts",
                 id_col: str = "event_id", cents_col: str | None = None,
                 window_minutes: int = 60):
    """→ Dataset(id_col, key_col, ts_col, n_window[, sum_cents_window]):
    per event, the count (and exact integer-cent sum) of events by the
    same key with ts in the CLOSED interval [ts - window, ts] — SQL's
    ``RANGE BETWEEN INTERVAL w PRECEDING AND CURRENT ROW``.

    Per partition: lexsort by (key, ts); composite axis
    ``c = rank*S + ts_rel`` (S = per-partition ts span) is globally
    sorted, so both frame bounds are single whole-array searchsorted
    probes — the lower-bound query clamps ``ts_rel - w`` at 0 so it can
    never dip into the previous rank's band.  Falls back to a per-key
    segment probe loop iff n_ranks * S would overflow int64.
    """
    n_parts = cfg.resolved_partitions()
    w = np.int64(window_minutes * _US_PER_MINUTE)
    with_sum = cents_col is not None

    def _tag(t: pa.Table) -> pa.Table:
        keys = np.asarray(t[key_col], dtype=np.int64)
        cols = {
            "k": pa.array(keys, pa.int64()),
            "ts": t[ts_col].cast(pa.timestamp("us")),
            "rid": t[id_col].cast(pa.int64()),
            "part": pa.array(_part_of(keys, n_parts), pa.int64()),
        }
        if with_sum:
            cols["cents"] = t[cents_col].cast(pa.int64())
        return pa.table(cols)

    out_fields = {
        id_col: pa.int64(), key_col: pa.int64(),
        ts_col: pa.timestamp("us"), "n_window": pa.int64(),
    }
    if with_sum:
        out_fields["sum_cents_window"] = pa.int64()
    empty = pa.table({c: pa.array([], t) for c, t in out_fields.items()})

    def _window(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0:
            return empty
        keys = np.asarray(tab["k"], dtype=np.int64)
        ts = _ts_int64(tab["ts"])
        order = np.lexsort((ts, keys))
        keys, ts = keys[order], ts[order]
        rid = np.asarray(tab["rid"], dtype=np.int64)[order]
        rank = _key_ranks(keys)
        ts_rel = ts - ts.min()
        span = np.int64(ts_rel.max()) + 1
        n_ranks = int(rank[-1]) + 1
        if int(n_ranks) * int(span) < 2**63:
            band = rank.astype(np.int64) * span
            c = band + ts_rel
            lo_q = band + np.maximum(ts_rel - w, 0)
            lo = np.searchsorted(c, lo_q, side="left")
            hi = np.searchsorted(c, c, side="right")
        else:  # ts span wider than int64 allows for the composite
            seg_starts = np.flatnonzero(np.concatenate(
                ([True], keys[1:] != keys[:-1])))
            seg_ends = np.append(seg_starts[1:], len(keys))
            lo = np.empty(len(keys), np.int64)
            hi = np.empty(len(keys), np.int64)
            for a, b in zip(seg_starts, seg_ends):
                seg = ts[a:b]
                lo[a:b] = a + np.searchsorted(seg, seg - w, side="left")
                hi[a:b] = a + np.searchsorted(seg, seg, side="right")
        cols = {
            id_col: pa.array(rid, pa.int64()),
            key_col: pa.array(keys, pa.int64()),
            ts_col: pa.array(ts.astype("datetime64[us]"), pa.timestamp("us")),
            "n_window": pa.array(hi - lo, pa.int64()),
        }
        if with_sum:
            cents = np.asarray(tab["cents"], dtype=np.int64)[order]
            cs = np.concatenate(([0], np.cumsum(cents, dtype=np.int64)))
            cols["sum_cents_window"] = pa.array(cs[hi] - cs[lo], pa.int64())
        return pa.table(cols)

    tagged = events_ds.map_batches(_tag, batch_format="pyarrow")
    return hash_partition_map(tagged, "part", _window, n_parts)
