"""Graph-semantics core: the reference's edge-connected Jaccard, re-expressed.

Mirrors the reference's contracts exactly (SURVEY.md §1.3):
  * symmetrize undirected inputs (main.cpp:99-112)        → ``symmetrize``
  * drop self-loops at CSR build (readMtxToCSR.cpp:174)   → ``drop_self_loops``
  * one-direction canonical form (readMtxToCSR.cpp:133)   → ``canonicalize``
  * per-vertex degree / RowSum (jaccard.cpp:236-261)      → ``degrees``
  * adjacency = sorted neighbor rows (jaccard.cpp:353)    → ``build_adjacency``
  * edge scoring J = Wi/(Ws−Wi) (jaccard.cpp:614-619)     → ``edge_jaccard``
  * pair-list scoring (jaccard_list, jaccard.cpp:901-923) → ``pair_jaccard``

``edge_jaccard`` IS the dedup verification stage applied to graph data:
pairs = the edge list, sets = adjacency rows — one engine, two payloads.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions.hashing import splitmix64
from ..functions.setops import pairwise_weighted_jaccard
from ..functions.text import binary_to_sets, sets_to_binary
from .verify import attach_sets, score_pairs


def _vertex_part(v: np.ndarray, n_parts: int) -> np.ndarray:
    """Partition key for vertex ids — the repo-wide splitmix64 key
    (functions/shuffle.part_of)."""
    from ..functions.shuffle import part_of

    return part_of(v, n_parts)


def drop_self_loops(edges_ds):
    """Remove (v, v) edges — the reference drops them during CSR build."""
    return edges_ds.map_batches(
        lambda t: t.filter(pc.not_equal(t["src"], t["dst"])),
        batch_format="pyarrow",
    )


def invert_direction(edges_ds):
    """Mirrored (dst, src[, weight]) edge per input edge (readMtxToCSR.cpp:116)."""

    def _swap(t: pa.Table) -> pa.Table:
        cols = {"src": t["dst"], "dst": t["src"]}
        if "weight" in t.column_names:
            cols["weight"] = t["weight"]
        return pa.table(cols)

    return edges_ds.map_batches(_swap, batch_format="pyarrow")


def symmetrize(edges_ds, cfg: PipelineConfig = DEFAULT_CONFIG):
    """Union original + mirrored edges, exact-dedup on (src, dst) —
    main.cpp:108-111's set-union.  Weight of a duplicated edge = min.

    Physical plan: ONE map emits both directions per batch (no
    union-of-two-streams re-executing the upstream per branch) and ONE
    manual hash exchange keyed on src dedups per partition with a
    lexsort + run-length first (weights: ``minimum.reduceat`` at group
    starts).  Replaces the Ray-native per-edge groupby, the measured
    slow exchange (functions/shuffle.py module docstring); output rows
    are additionally src-co-partitioned, which ``degrees`` exploits."""
    from ..functions.shuffle import hash_partition_map

    schema = edges_ds.schema()
    has_w = "weight" in schema.names
    # empty partitions must emit the INPUT weight dtype, not a
    # hardcoded float64 — an integer-weighted edge list would otherwise
    # yield mixed block schemas across the output Dataset
    w_type = (schema.types[schema.names.index("weight")]
              if has_w else None)
    n_parts = cfg.resolved_partitions()

    def _bidir_tag(t: pa.Table) -> pa.Table:
        src = t["src"].combine_chunks().cast(pa.int64())
        dst = t["dst"].combine_chunks().cast(pa.int64())
        cols = {"src": pa.concat_arrays([src, dst]),
                "dst": pa.concat_arrays([dst, src])}
        if has_w:
            w = t["weight"].combine_chunks()
            cols["weight"] = pa.concat_arrays([w, w])
        s = np.asarray(cols["src"], dtype=np.int64)
        cols["part"] = pa.array(_vertex_part(s, n_parts), pa.int64())
        return pa.table(cols)

    empty_cols = {"src": pa.array([], pa.int64()),
                  "dst": pa.array([], pa.int64())}

    def _dedup(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0 or tab.num_columns == 0:
            out = dict(empty_cols)
            if has_w:
                out["weight"] = pa.array([], w_type)
            return pa.table(out)
        src = np.asarray(tab["src"], dtype=np.int64)
        dst = np.asarray(tab["dst"], dtype=np.int64)
        order = np.lexsort((dst, src))
        so, do = src[order], dst[order]
        first = np.ones(len(so), dtype=bool)
        first[1:] = (so[1:] != so[:-1]) | (do[1:] != do[:-1])
        out = {"src": pa.array(so[first], pa.int64()),
               "dst": pa.array(do[first], pa.int64())}
        if has_w:
            w = tab["weight"].combine_chunks() \
                .to_numpy(zero_copy_only=False)[order]
            out["weight"] = pa.array(
                np.minimum.reduceat(w, np.flatnonzero(first)))
        return pa.table(out)

    tagged = edges_ds.map_batches(_bidir_tag, batch_format="pyarrow",
                                  zero_copy_batch=True)
    return hash_partition_map(tagged, "part", _dedup, n_parts)


def canonicalize(edges_ds):
    """Keep one direction of each pair: src < dst (removeReverseEdges,
    readMtxToCSR.cpp:133-147, as an embarrassingly-parallel filter)."""
    return edges_ds.map_batches(
        lambda t: t.filter(pc.less(t["src"], t["dst"])),
        batch_format="pyarrow",
    )


def degrees(edges_ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
            src_partitioned: bool = False):
    """Per-vertex out-degree over a (symmetrized) edge list — the
    unweighted RowSum kernel (jaccard.cpp:236-261).
    → Dataset(vertex:int64, degree:int64).

    Combiner exchange: each batch pre-aggregates to (vertex, partial
    count) rows — shuffle volume is distinct vertices per batch, not
    edges — then one hash exchange keyed on vertex sums partials with
    ``add.reduceat``.  Replaces the Ray-native per-edge groupby.

    ``src_partitioned=True``: the input is already src-co-partitioned —
    every vertex's rows live in exactly one block (e.g. ``symmetrize``
    output, whose reduce emits one block per hash partition).  Degrees
    are then complete per block and the whole op is a pure streaming
    map: ZERO additional exchange.

    CALLER CONTRACT, not validated (a check would cost the very
    exchange this path removes): if the invariant is broken — e.g. by
    a ``repartition`` or a parquet round-trip between symmetrize and
    degrees — a vertex whose rows span blocks is emitted MULTIPLE
    times with partial counts.  Duplicate ``vertex`` values in the
    output are the signature of that misuse; the default
    (``src_partitioned=False``) path is always safe."""
    from ..functions.shuffle import hash_partition_map

    if src_partitioned:
        def _local(t: pa.Table) -> pa.Table:
            src = np.asarray(t["src"].combine_chunks().cast(pa.int64()),
                             dtype=np.int64)
            u, c = np.unique(src, return_counts=True)
            return pa.table({
                "vertex": pa.array(u, pa.int64()),
                "degree": pa.array(c.astype(np.int64), pa.int64()),
            })

        # batch_size=None: one call per (partition-complete) block —
        # slicing a block would split a vertex's rows across calls
        return edges_ds.map_batches(_local, batch_format="pyarrow",
                                    batch_size=None, zero_copy_batch=True)

    n_parts = cfg.resolved_partitions()

    def _partial(t: pa.Table) -> pa.Table:
        src = np.asarray(t["src"].combine_chunks().cast(pa.int64()),
                         dtype=np.int64)
        u, c = np.unique(src, return_counts=True)
        return pa.table({
            "vertex": pa.array(u, pa.int64()),
            "partial": pa.array(c.astype(np.int64), pa.int64()),
            "part": pa.array(_vertex_part(u, n_parts), pa.int64()),
        })

    empty = pa.table({"vertex": pa.array([], pa.int64()),
                      "degree": pa.array([], pa.int64())})

    def _sum(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0 or tab.num_columns == 0:
            return empty
        v = np.asarray(tab["vertex"], dtype=np.int64)
        c = np.asarray(tab["partial"], dtype=np.int64)
        order = np.argsort(v, kind="stable")
        vs, cs = v[order], c[order]
        first = np.ones(len(vs), dtype=bool)
        first[1:] = vs[1:] != vs[:-1]
        starts = np.flatnonzero(first)
        return pa.table({
            "vertex": pa.array(vs[first], pa.int64()),
            "degree": pa.array(np.add.reduceat(cs, starts), pa.int64()),
        })

    parted = edges_ds.map_batches(_partial, batch_format="pyarrow",
                                  zero_copy_batch=True)
    return hash_partition_map(parted, "part", _sum, n_parts)


def build_adjacency(edges_ds, cfg: PipelineConfig = DEFAULT_CONFIG,
                    id_col: str = "doc_id", dedup: bool = True):
    """Edges → Dataset(id, n_neighbors, neighbors) where ``neighbors`` is
    the sorted unique neighbor row in the binary wire format (the CSR row
    of standalone_csr.hpp:44 as an Arrow payload).

    One shuffle, keyed on ``hash(src) % num_partitions``: each partition
    group receives ALL edges of its vertices and builds its rows with a
    single vectorized lexsort + slice — per-partition Python calls (one
    per shuffle partition), never per-vertex.  Duplicate edges are
    dropped here (``dedup``), so upstream symmetrize need not pre-dedup.
    """
    n_parts = cfg.resolved_partitions()

    def _part(t: pa.Table) -> pa.Table:
        src = np.asarray(t["src"], dtype=np.int64)
        part = _vertex_part(src, n_parts)
        return pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(np.asarray(t["dst"], dtype=np.int64), pa.int64()),
            "part": pa.array(part, pa.int64()),
        })

    parted = edges_ds.map_batches(_part, batch_format="pyarrow",
                                  zero_copy_batch=True)

    def _build(group) -> pa.Table:
        if group is None or len(group) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n_neighbors": pa.array([], pa.int64()),
                             "neighbors": pa.array([], pa.large_binary())})
        src = np.asarray(group["src"], dtype=np.int64)
        dst = np.asarray(group["dst"], dtype=np.int64)
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        if dedup and len(src):
            keep = np.empty(len(src), dtype=bool)
            keep[0] = True
            keep[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
            src, dst = src[keep], dst[keep]
        uniq, starts = np.unique(src, return_index=True)
        bounds = np.append(starts, len(src))
        dbytes = dst.astype("<u8").tobytes()
        blobs = [dbytes[bounds[i] * 8 : bounds[i + 1] * 8]
                 for i in range(len(uniq))]
        return pa.table({
            id_col: pa.array(uniq, pa.int64()),
            "n_neighbors": pa.array(bounds[1:] - bounds[:-1], pa.int64()),
            "neighbors": pa.array(blobs, pa.large_binary()),
        })

    from ..functions.shuffle import hash_partition_map
    return hash_partition_map(parted, "part", _build, n_parts)


BROADCAST_MAX_ROWS = 2_000_000  # adjacency sides below this are shipped
# via ray.put instead of a shuffle join (broadcast-small-side rule)


def pair_jaccard(pairs_ds, adj_ds, cfg: PipelineConfig = DEFAULT_CONFIG,
                 weights=None, id_col: str = "doc_id",
                 broadcast: bool | None = None):
    """Score an explicit (a, b) pair list against adjacency sets — the
    ``jaccard_list`` API (standalone_algorithms.hpp:109-133).  Returns
    (a, b, intersection, union, jaccard); unweighted unless a per-vertex
    ``weights`` numpy array is given (jaccard.cpp:253-256 weighted path).

    Physical variants (the VC/EC duality of the reference, collapsed
    into one logical op): ``broadcast=True`` ships the packed adjacency
    to every worker once (no shuffle — right when the graph fits a
    worker); ``broadcast=False`` gathers via two hash joins on the
    vertex id (the scale path).  Auto-chosen by adjacency row count.
    """
    from .verify import verify_pairs_broadcast

    if broadcast is None:
        broadcast = adj_ds.count() <= BROADCAST_MAX_ROWS
    if broadcast:
        return verify_pairs_broadcast(pairs_ds, adj_ds, cfg, threshold=None,
                                      id_col=id_col, set_col="neighbors",
                                      weights=weights)

    joined = attach_sets(pairs_ds, adj_ds, cfg, id_col=id_col, set_col="neighbors")
    if weights is None:
        return score_pairs(joined, cfg=None, threshold=None)

    import ray
    w_ref = ray.put(np.asarray(weights, dtype=np.float64))

    class _WeightedScore:
        def __init__(self):
            self.w = ray.get(w_ref)  # broadcast once per actor, not per batch

        def __call__(self, batch: pa.Table) -> pa.Table:
            av, ao = binary_to_sets(batch["set_a"])
            bv, bo = binary_to_sets(batch["set_b"])
            wi, wu, j = pairwise_weighted_jaccard(av, ao, bv, bo, weight_of=self.w)
            return pa.table({
                "a": batch["a"],
                "b": batch["b"],
                "weight_i": pa.array(wi, type=pa.float64()),
                "weight_u": pa.array(wu, type=pa.float64()),
                "jaccard": pa.array(j, type=pa.float64()),
            })

    return joined.map_batches(_WeightedScore, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=8192,
                              concurrency=(1, 4))


def _adjacency_and_pairs(edges_ds, cfg: PipelineConfig,
                         symmetrize_input: bool = True):
    """Shared prefix of every edge-scoring op: self-loop drop →
    (optional) bidirectional emit → adjacency build (materialized) →
    canonical (a<b) pair derivation FROM the adjacency rows.
    Returns (adj, pairs)."""
    clean = drop_self_loops(edges_ds)
    # no pre-dedup shuffle: adjacency build dedups inside its one shuffle.
    # Both directions are emitted by ONE map over each batch — a
    # union(invert(...)) would re-execute the upstream read+map per
    # branch and double the block count for no benefit.
    if symmetrize_input:
        def _bidir(t: pa.Table) -> pa.Table:
            src = t["src"].combine_chunks()
            dst = t["dst"].combine_chunks()
            return pa.table({
                "src": pa.concat_arrays([src, dst]),
                "dst": pa.concat_arrays([dst, src]),
            })

        both = clean.map_batches(_bidir, batch_format="pyarrow",
                                 zero_copy_batch=True)
    else:
        both = clean
    adj = build_adjacency(both, cfg, id_col="id").materialize()
    # canonical (a<b) edge list derived FROM the adjacency rows — a pure
    # map, no extra shuffle: each vertex emits its neighbors greater
    # than itself (removeReverseEdges as a projection)
    def _pairs(t: pa.Table) -> pa.Table:
        from ..functions.text import binary_to_sets
        vals, offs = binary_to_sets(t["neighbors"])
        ids = np.asarray(t["id"], dtype=np.int64)
        a = np.repeat(ids, offs[1:] - offs[:-1])
        b = vals.view(np.int64)
        keep = a < b
        return pa.table({"a": pa.array(a[keep], pa.int64()),
                         "b": pa.array(b[keep], pa.int64())})

    pairs = adj.map_batches(_pairs, batch_format="pyarrow", zero_copy_batch=True)
    return adj, pairs


def edge_jaccard(edges_ds, cfg: PipelineConfig = DEFAULT_CONFIG,
                 weights=None, *, symmetrize_input: bool = True):
    """Edge-connected Jaccard over a graph: score every existing
    (canonical) edge — the reference's main path (jaccard.cpp:784-899).

    Input: Dataset(src:int64, dst:int64[, weight]).  The graph is
    symmetrized (undirected contract, main.cpp:99-112) and self-loops
    dropped before adjacency build; output is one row per canonical
    (src<dst) edge: (a, b, intersection, union, jaccard) — both
    directions of an edge score identically in the reference, so the
    canonical row represents both.
    """
    adj, pairs = _adjacency_and_pairs(edges_ds, cfg, symmetrize_input)
    return pair_jaccard(pairs, adj, cfg, weights=weights, id_col="id")


def attach_degrees(scored_ds, adj_ds, cfg: PipelineConfig = DEFAULT_CONFIG,
                   broadcast: bool | None = None,
                   cols: tuple = (("a", "deg_a"), ("b", "deg_b"))):
    """Append per-endpoint degree columns (neighbor-set sizes from the
    adjacency's ``n_neighbors``) to a (a, b, ...) edge Dataset.
    ``cols`` maps each endpoint id column to its output degree column.

    Broadcast path (≤ BROADCAST_MAX_ROWS adjacency rows): the
    (sorted-ids, degrees) arrays ship once via ray.put and each batch
    resolves endpoints with searchsorted lookups — zero shuffle.  Above
    the gate, one partitioned equi-join per endpoint column (both sides
    move once each) attaches the columns at scale."""
    import ray

    if broadcast is None:
        broadcast = adj_ds.count() <= BROADCAST_MAX_ROWS
    if not broadcast:
        from .join import partitioned_join

        deg = adj_ds.map_batches(
            lambda t: pa.table({"__v": t["id"].combine_chunks(),
                                "__dg": t["n_neighbors"].combine_chunks()}),
            batch_format="pyarrow")
        out = scored_ds
        for id_c, deg_c in cols:
            out = partitioned_join(out, deg, id_c, cfg, right_on="__v")
            out = out.map_batches(
                lambda t, dc=deg_c: t.rename_columns(
                    [(dc if c == "__dg" else c) for c in t.column_names]),
                batch_format="pyarrow")
        return out

    tabs = [t for t in (ray.get(r) for r in
            adj_ds.select_columns(["id", "n_neighbors"]).to_arrow_refs())
            if len(t)]
    if tabs:
        tab = pa.concat_tables(tabs)
        ids = np.asarray(tab["id"], dtype=np.int64)
        dg = np.asarray(tab["n_neighbors"], dtype=np.int64)
    else:  # empty adjacency (e.g. a graph of only self-loops)
        ids = np.empty(0, dtype=np.int64)
        dg = np.empty(0, dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    deg_ref = ray.put((ids[order], dg[order]))

    def _lookup(t: pa.Table) -> pa.Table:
        sids, sdg = ray.get(deg_ref)  # local plasma read, zero-copy arrays
        out = t
        for id_c, deg_c in cols:
            v = np.asarray(t[id_c], dtype=np.int64)
            pos = np.clip(np.searchsorted(sids, v), 0, max(len(sids) - 1, 0))
            d = np.where(len(sids) and sids[pos] == v, sdg[pos], 0)
            out = out.append_column(deg_c, pa.array(d, pa.int64()))
        return out

    return scored_ds.map_batches(_lookup, batch_format="pyarrow",
                                 zero_copy_batch=True)


def edge_similarity(edges_ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                    symmetrize_input: bool = True,
                    broadcast: bool | None = None):
    """Sibling edge-similarity coefficients over the SAME intersect
    kernel as ``edge_jaccard`` (jaccard.cpp:614-619 computes only J;
    overlap / Sørensen–Dice / Salton cosine are its standard graph-
    similarity companions — all pure functions of (|A∩B|, |A|, |B|)):

        overlap  = i / min(da, db)
        sorensen = 2·i / (da + db)
        cosine   = i / sqrt(da · db)

    One intersection pass + one degree attach (broadcast lookup or
    partitioned joins, `attach_degrees`); no extra set scans.  Output:
    (a, b, intersection, deg_a, deg_b, overlap, sorensen, cosine)."""
    adj, pairs = _adjacency_and_pairs(edges_ds, cfg, symmetrize_input)
    scored = pair_jaccard(pairs, adj, cfg, id_col="id",
                          broadcast=broadcast)
    withdeg = attach_degrees(scored, adj, cfg, broadcast=broadcast)

    def _metrics(t: pa.Table) -> pa.Table:
        i = np.asarray(t["intersection"], dtype=np.int64).astype(np.float64)
        da = np.asarray(t["deg_a"], dtype=np.int64)
        db = np.asarray(t["deg_b"], dtype=np.int64)
        daf, dbf = da.astype(np.float64), db.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            mn = np.minimum(daf, dbf)
            overlap = np.where(mn > 0, i / np.maximum(mn, 1.0), 0.0)
            ssum = daf + dbf
            sorensen = np.where(ssum > 0,
                                (2.0 * i) / np.maximum(ssum, 1.0), 0.0)
            prod = np.sqrt((da * db).astype(np.float64))
            cosine = np.where(prod > 0, i / np.maximum(prod, 1.0), 0.0)
        return pa.table({
            "a": t["a"], "b": t["b"],
            "intersection": t["intersection"],
            "deg_a": t["deg_a"], "deg_b": t["deg_b"],
            "overlap": pa.array(overlap, pa.float64()),
            "sorensen": pa.array(sorensen, pa.float64()),
            "cosine": pa.array(cosine, pa.float64()),
        })

    return withdeg.map_batches(_metrics, batch_format="pyarrow",
                               zero_copy_batch=True)


def triangle_counts(edges_ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                    symmetrize_input: bool = True,
                    broadcast: bool | None = None):
    """Per-vertex triangle counts + local clustering coefficient,
    derived from the edge-intersection kernel: |N(a)∩N(b)| of a
    canonical edge IS the number of triangles through that edge, so
    t(v) = Σ_{edges incident to v} intersection(e) / 2 (each triangle
    {v,x,y} is counted by both (v,x) and (v,y)), and
    lcc(v) = 2·t(v) / (deg(v)·(deg(v)−1)).

    Physical plan: score pass (shared with edge_jaccard) → per-batch
    partial sums of intersections per endpoint (combiner, same shape as
    ``degrees``) → one hash exchange → degree attach → pure map.
    Output: (vertex, triangles, lcc) for every vertex with ≥1 edge."""
    from ..functions.shuffle import hash_partition_map

    adj, pairs = _adjacency_and_pairs(edges_ds, cfg, symmetrize_input)
    scored = pair_jaccard(pairs, adj, cfg, id_col="id",
                          broadcast=broadcast)
    n_parts = cfg.resolved_partitions()

    def _partial(t: pa.Table) -> pa.Table:
        a = np.asarray(t["a"], dtype=np.int64)
        b = np.asarray(t["b"], dtype=np.int64)
        c = np.asarray(t["intersection"], dtype=np.int64)
        v = np.concatenate([a, b])
        w = np.concatenate([c, c])
        order = np.argsort(v, kind="stable")
        vs, ws = v[order], w[order]
        first = np.ones(len(vs), dtype=bool)
        first[1:] = vs[1:] != vs[:-1]
        u = vs[first]
        s = np.add.reduceat(ws, np.flatnonzero(first)) if len(ws) else ws
        return pa.table({
            "vertex": pa.array(u, pa.int64()),
            "partial": pa.array(s, pa.int64()),
            "part": pa.array(_vertex_part(u, n_parts), pa.int64()),
        })

    empty = pa.table({"vertex": pa.array([], pa.int64()),
                      "triangles": pa.array([], pa.int64())})

    def _sum(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0 or tab.num_columns == 0:
            return empty
        v = np.asarray(tab["vertex"], dtype=np.int64)
        c = np.asarray(tab["partial"], dtype=np.int64)
        order = np.argsort(v, kind="stable")
        vs, cs = v[order], c[order]
        first = np.ones(len(vs), dtype=bool)
        first[1:] = vs[1:] != vs[:-1]
        starts = np.flatnonzero(first)
        # each triangle at v is counted by exactly two incident edges
        tri = np.add.reduceat(cs, starts) // 2
        return pa.table({
            "vertex": pa.array(vs[first], pa.int64()),
            "triangles": pa.array(tri, pa.int64()),
        })

    parted = scored.map_batches(_partial, batch_format="pyarrow",
                                zero_copy_batch=True)
    tri = hash_partition_map(parted, "part", _sum, n_parts)

    withdeg = attach_degrees(tri, adj, cfg, broadcast=broadcast,
                             cols=(("vertex", "degree"),))

    def _lcc(t: pa.Table) -> pa.Table:
        tr = np.asarray(t["triangles"], dtype=np.int64)
        dg = np.asarray(t["degree"], dtype=np.int64)
        denom = dg * (dg - 1)
        with np.errstate(divide="ignore", invalid="ignore"):
            lcc = np.where(denom > 0,
                           (2.0 * tr) / np.maximum(denom, 1).astype(np.float64),
                           0.0)
        return pa.table({
            "vertex": t["vertex"],
            "degree": t["degree"],
            "triangles": t["triangles"],
            "lcc": pa.array(lcc, pa.float64()),
        })

    return withdeg.map_batches(_lcc, batch_format="pyarrow",
                               zero_copy_batch=True)
