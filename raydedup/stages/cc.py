"""Connected components over the verified dup-pair graph.

Iterative hash-min label propagation (the standard map-reduce CC): every
node starts labeled with its own id; each round every node takes the min
label over itself and its neighbors (``groupby(node).min(label)``, one
shuffle per round, SURVEY.md §4.2).  Converges in O(diameter) rounds —
dup clusters are near-cliques, so few — and is bounded by
``cfg.cc_max_iters``.  Each round's label table can be checkpointed
(pipelines/checkpoint.py) so a resumed job restarts from the last round.

The final label of every node is the minimum doc_id in its component —
which makes the SQL oracle for exact-dup components simply
``min(doc_id) OVER (PARTITION BY text)``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig


def _symmetrize_pairs(pairs_ds):
    """(a,b) → (node, nbr) both directions."""
    fwd = pairs_ds.map_batches(
        lambda t: pa.table({"node": t["a"], "nbr": t["b"]}),
        batch_format="pyarrow",
    )
    rev = pairs_ds.map_batches(
        lambda t: pa.table({"node": t["b"], "nbr": t["a"]}),
        batch_format="pyarrow",
    )
    return fwd.union(rev)


LOCAL_CC_MAX_EDGES = 5_000_000


def connected_components(pairs_ds, cfg: PipelineConfig, checkpoint_fn=None,
                         mode: str = "auto"):
    """Dataset(a:int64, b:int64) of undirected edges →
    Dataset(node:int64, component:int64) for every node that appears in
    an edge; component = min doc_id of the component.

    ``mode``: "distributed" = iterative hash-min label propagation
    (shuffle per round — the 10^12-doc path); "local" = driver-side
    union-find (right when the verified dup-pair graph is a small
    fraction of the corpus, the common case); "auto" picks by edge
    count (≤ LOCAL_CC_MAX_EDGES → local).

    ``checkpoint_fn(round_idx, labels_ds) -> labels_ds`` is called each
    round when given (hook for Parquet checkpointing).
    """
    if mode == "auto":
        mode = "local" if pairs_ds.count() <= LOCAL_CC_MAX_EDGES else "distributed"
    if mode == "local":
        return _connected_components_local(pairs_ds)
    return _connected_components_distributed(pairs_ds, cfg, checkpoint_fn)


def _connected_components_local(pairs_ds):
    """Union-find over a collected pair list — O(E α(E)) on the driver.
    Only reached when the edge list is provably small (auto threshold)."""
    import pandas as pd
    import ray.data as rd

    df = pairs_ds.select_columns(["a", "b"]).to_pandas()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(df["a"].to_numpy(), df["b"].to_numpy()):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted(parent)
    out = pd.DataFrame({"node": nodes,
                        "component": [find(n) for n in nodes]})
    out["node"] = out["node"].astype("int64")
    out["component"] = out["component"].astype("int64")
    return rd.from_arrow(pa.Table.from_pandas(out, preserve_index=False))


def _connected_components_distributed(pairs_ds, cfg: PipelineConfig,
                                      checkpoint_fn=None):
    edges = _symmetrize_pairs(pairs_ds).groupby(["node", "nbr"]).count() \
                                       .select_columns(["node", "nbr"])
    edges = edges.materialize()  # reused every round; edge set is the
    # verified dup-pair graph — tiny relative to the corpus

    # labels: node → itself
    labels = edges.groupby("node").min("nbr").map_batches(
        lambda t: pa.table({
            "node": t["node"],
            "component": pc.min_element_wise(t["node"], t["min(nbr)"]),
        }),
        batch_format="pyarrow",
    ).materialize()
    # note: seeding with min(node, min-neighbor) is already one halved round

    for it in range(cfg.cc_max_iters):
        # neighbor labels: edges(node,nbr) ⋈ labels(nbr) → (node, cand)
        nbr_labels = edges.join(
            labels.rename_columns({"node": "nbr", "component": "cand"}),
            join_type="inner", num_partitions=cfg.resolved_partitions(), on=("nbr",),
        ).map_batches(
            lambda t: pa.table({"node": t["node"], "component": t["cand"]}),
            batch_format="pyarrow",
        )
        new_labels = labels.union(nbr_labels) \
                           .groupby("node").min("component") \
                           .map_batches(
            lambda t: pa.table({"node": t["node"], "component": t["min(component)"]}),
            batch_format="pyarrow",
        ).materialize()

        # convergence: any label changed?
        changed = labels.rename_columns({"component": "old"}).join(
            new_labels, join_type="inner",
            num_partitions=cfg.resolved_partitions(), on=("node",),
        ).map_batches(
            lambda t: t.filter(pc.not_equal(t["old"], t["component"])),
            batch_format="pyarrow",
        ).count()
        labels = new_labels
        if checkpoint_fn is not None:
            labels = checkpoint_fn(it, labels)
        if changed == 0:
            break
    return labels
