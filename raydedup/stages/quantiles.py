"""Exact distributed quantiles over integer metrics.

Length/score distributions drive every curation threshold (Gopher's
length gates, packing budgets, outlier cuts), and at 100 TB you cannot
sort the corpus to read off a percentile.  For INTEGER metrics the
exact answer needs no sort and no sketch: a (value → count) histogram
is an exact sufficient statistic, and its size is the metric's
cardinality (token counts, char lengths, scores — thousands of
distinct values), independent of corpus size.

Physical plan: per-batch Arrow ``value_counts`` combiner (one row per
distinct value per batch travels) → one hash exchange on the value →
per-partition count sums → the driver collects only the (value, count)
histogram, cumsums, and reads off ``quantile_disc`` positions
(DuckDB semantics, pinned by oracle: index ceil(q·n)−1 clamped to 0,
i.e. the smallest value whose cumulative count ≥ ceil(q·n)).

For unbounded-cardinality metrics (floats, byte lengths of huge blobs)
pre-bucket the column; the exactness contract is per-bucket then.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions.hashing import hash_utf8_array, splitmix64
from ..functions.shuffle import hash_partition_map


def value_histogram(ds, col: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    """→ Dataset(value:int64, n:int64) — exact global value counts of
    an integer column (the distributed sufficient statistic)."""
    n_parts = cfg.num_partitions

    def _partial(t: pa.Table) -> pa.Table:
        g = pa.table({"value": t[col].cast(pa.int64())}) \
            .group_by("value").aggregate([("value", "count")])
        v = np.asarray(g["value"], dtype=np.int64)
        part = (splitmix64(v.view(np.uint64)) % np.uint64(n_parts)) \
            .astype(np.int64)
        return pa.table({"value": g["value"],
                         "n": g["value_count"].cast(pa.int64()),
                         "_part": pa.array(part, pa.int64())})

    def _reduce(t: pa.Table | None) -> pa.Table:
        if t is None or len(t) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"value": z, "n": z})
        g = t.group_by("value").aggregate([("n", "sum")])
        return pa.table({"value": g["value"],
                         "n": g["n_sum"].cast(pa.int64())})

    return hash_partition_map(ds, "_part", _reduce, n_parts,
                              map_fn=_partial,
                              map_chunk_rows=cfg.batch_size)


def int_quantiles(ds, col: str, qs=(0.5, 0.9, 0.99),
                  cfg: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Exact discrete quantiles of an integer column →
    pa.Table(q:string 'p50'-style, value:int64).  Only the (value,
    count) histogram ever reaches the driver."""
    import ray

    hist_tabs = [t for t in ray.get(
        list(value_histogram(ds, col, cfg).to_arrow_refs())) if len(t)]
    if not hist_tabs:
        return pa.table({"q": pa.array([], pa.string()),
                         "value": pa.array([], pa.int64())})
    hist = pa.concat_tables(hist_tabs)
    v = np.asarray(hist["value"], dtype=np.int64)
    c = np.asarray(hist["n"], dtype=np.int64)
    order = np.argsort(v, kind="stable")
    v, c = v[order], c[order]
    cum = np.cumsum(c)
    n = int(cum[-1])
    labels, values = [], []
    for q in qs:
        rank = max(1, math.ceil(q * n))      # quantile_disc position
        idx = int(np.searchsorted(cum, rank))
        labels.append(_plabel(q))
        values.append(int(v[idx]))
    return pa.table({"q": pa.array(labels, pa.string()),
                     "value": pa.array(values, pa.int64())})


def cont_quantiles(ds, col: str, qs=(0.5, 0.9, 0.99),
                   cfg: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Exact CONTINUOUS (linear-interpolated) quantiles of an integer
    column → pa.Table(q:string, value:double), DuckDB ``quantile_cont``
    semantics: position h = q·(n−1); result =
    v[floor(h)]·(ceil(h) − h) + v[ceil(h)]·(h − floor(h)) — the
    two-sided form, which differs from lo + frac·(hi−lo) by an ulp on
    some inputs; the oracle hash requires DuckDB's exact arithmetic.

    Same physical plan as ``int_quantiles`` — only the (value, count)
    histogram reaches the driver; the rank-to-value reads come off the
    cumulative counts, so no sort of the data ever happens.  Fixed-
    decimal metrics (prices) should be passed as scaled integers
    (cents) — the interpolation then matches the SQL oracle bit-for-
    bit because both engines do the same double arithmetic."""
    import ray

    hist_tabs = [t for t in ray.get(
        list(value_histogram(ds, col, cfg).to_arrow_refs())) if len(t)]
    if not hist_tabs:
        return pa.table({"q": pa.array([], pa.string()),
                         "value": pa.array([], pa.float64())})
    hist = pa.concat_tables(hist_tabs)
    v = np.asarray(hist["value"], dtype=np.int64)
    c = np.asarray(hist["n"], dtype=np.int64)
    order = np.argsort(v, kind="stable")
    v, c = v[order], c[order]
    cum = np.cumsum(c)
    n = int(cum[-1])
    labels, values = [], []
    for q in qs:
        h = q * (n - 1)                      # 0-based fractional rank
        lo_rank, hi_rank = math.floor(h), math.ceil(h)
        # value at 0-based rank r = smallest v with cum > r
        lo = float(v[int(np.searchsorted(cum, lo_rank, side="right"))])
        hi = float(v[int(np.searchsorted(cum, hi_rank, side="right"))])
        labels.append(_plabel(q))
        values.append(lo if hi_rank == lo_rank
                      else lo * (hi_rank - h) + hi * (h - lo_rank))
    return pa.table({"q": pa.array(labels, pa.string()),
                     "value": pa.array(values, pa.float64())})


def _plabel(q: float) -> str:
    pct = q * 100
    if abs(pct - round(pct)) < 1e-9:
        return f"p{int(round(pct))}"
    return f"p{pct:g}"


def grouped_int_quantile(ds, col: str, key_col: str, q: float = 0.25,
                         cfg: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Exact per-GROUP discrete quantile of an integer column →
    ``pa.Table(key_col:string, value:int64)``, one row per group, in
    DuckDB ``quantile_disc(col, q)`` semantics.

    Same histogram insight as ``int_quantiles``, grouped: each batch
    ships one (key, value, count) row per distinct (key, value) it
    contains, the exchange is keyed by hash(key) so each group's
    histogram lands whole on one partition, and the per-group
    rank-read happens there.  Only the per-group threshold rows reach
    the driver — the caller's contract is that ``key_col`` is
    LOW-CARDINALITY (languages, sources, domains-after-bucketing);
    per-group histogram size is the metric's cardinality, exactly as
    in the ungrouped case."""
    import ray

    if not (0.0 < q <= 1.0):
        raise ValueError(f"q must be in (0, 1], got {q}")
    n_parts = cfg.num_partitions

    def _partial(t: pa.Table) -> pa.Table:
        # null keys fill to '' (the hll_registers_by convention) — a
        # None surviving into the reduce's lexsort would TypeError
        g = pa.table({"key": pc.fill_null(t[key_col].cast(pa.string()),
                                          ""),
                      "value": t[col].cast(pa.int64())}) \
            .group_by(["key", "value"]).aggregate([("value", "count")])
        kh = hash_utf8_array(g["key"].combine_chunks())
        part = (kh % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"key": g["key"], "value": g["value"],
                         "n": g["value_count"].cast(pa.int64()),
                         "_part": pa.array(part, pa.int64())})

    def _reduce(t: pa.Table | None) -> pa.Table:
        empty = pa.table({"key": pa.array([], pa.string()),
                          "value": pa.array([], pa.int64())})
        if t is None or len(t) == 0:
            return empty
        g = t.group_by(["key", "value"]).aggregate([("n", "sum")])
        keys = np.asarray(g["key"].cast(pa.large_string()))
        vals = np.asarray(g["value"], dtype=np.int64)
        cnts = np.asarray(g["n_sum"], dtype=np.int64)
        order = np.lexsort((vals, keys))
        keys, vals, cnts = keys[order], vals[order], cnts[order]
        first = np.ones(len(keys), dtype=bool)
        first[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(first)
        out_k, out_v = [], []
        bounds = np.append(starts, len(keys))
        for i in range(len(starts)):
            lo, hi = bounds[i], bounds[i + 1]
            cum = np.cumsum(cnts[lo:hi])
            rank = max(1, math.ceil(q * int(cum[-1])))
            out_k.append(keys[lo])
            out_v.append(int(vals[lo + int(np.searchsorted(cum, rank))]))
        return pa.table({"key": pa.array(out_k, pa.string()),
                         "value": pa.array(out_v, pa.int64())})

    parts = hash_partition_map(ds, "_part", _reduce, n_parts,
                               map_fn=_partial,
                               map_chunk_rows=cfg.batch_size).materialize()
    tabs = [t for t in ray.get(list(parts.to_arrow_refs())) if len(t)]
    if not tabs:
        return pa.table({key_col: pa.array([], pa.string()),
                         "value": pa.array([], pa.int64())})
    tab = pa.concat_tables(tabs)
    return pa.table({key_col: tab["key"], "value": tab["value"]})


def percentile_filter(ds, col: str, key_col: str, q: float = 0.25,
                      cfg: PipelineConfig = DEFAULT_CONFIG):
    """Keep rows whose ``col`` >= their group's exact q-quantile — the
    per-language length/quality gate every curation pipeline runs
    ("drop the shortest quartile per language" instead of one global
    threshold that over-prunes compact-script languages).

    Thresholds come from ``grouped_int_quantile`` (one row per group),
    broadcast via ray.put + the shared worker-local cache; the filter
    itself is one zero-shuffle map.  Rows whose key has no threshold
    (born after the threshold snapshot) pass through — the
    conservative choice for a filter."""
    import ray

    from ..functions.broadcast import bcast_get

    thr = grouped_int_quantile(ds, col, key_col, q, cfg)
    kh = hash_utf8_array(thr[key_col].combine_chunks())
    order = np.argsort(kh)
    thr_ref = ray.put((np.ascontiguousarray(kh[order]),
                       np.asarray(thr["value"], dtype=np.int64)[order]))

    def _filter(t: pa.Table) -> pa.Table:
        keys_h, thr_v = bcast_get(thr_ref)
        if not len(keys_h):
            return t
        kh = hash_utf8_array(pc.fill_null(t[key_col].cast(pa.string()),
                                          "").combine_chunks())
        pos = np.clip(np.searchsorted(keys_h, kh), 0, len(keys_h) - 1)
        has = keys_h[pos] == kh
        vals = np.asarray(t[col].cast(pa.int64()), dtype=np.int64)
        keep = ~has | (vals >= thr_v[pos])
        return t.filter(pa.array(keep))

    return ds.map_batches(_filter, batch_format="pyarrow",
                          batch_size=cfg.batch_size, zero_copy_batch=True)
