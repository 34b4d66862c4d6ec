"""The flagship pipeline: MinHash-LSH near-duplicate detection + clustering.

    docs ──map_batches(SignatureStage, slim)──► band keys        (~300 B/doc)
         ──explode bands──► (band_key, doc_id)
         ──partition shuffles──► candidate pairs (a<b)
         ──semi-filter docs by candidate endpoints──► recompute
           shingle sets for JUST those docs──► verify (exact Jaccard)
         ──hash-min CC──► (doc_id, component)

Bandwidth design: the banding pass materializes only band keys (the
full signature table with shingle blobs is ~15x larger); shingle sets
are recomputed for the candidate-endpoint subset only — recomputing a
few percent of the corpus is far cheaper than materializing and
re-shuffling everyone's sets.  When the candidate set is too large to
collect its endpoint ids (> SEMI_FILTER_MAX_PAIRS), the pipeline falls
back to the full-signature path automatically.

Every wide step's shuffle key is explicit (stages/lsh.py, stages/cc.py,
stages/verify.py); stage outputs can be checkpointed to Parquet
(pipelines/checkpoint.py) so a resumed run skips completed stages.
"""

from __future__ import annotations

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..stages.cc import connected_components
from ..stages.lsh import candidate_pairs, explode_bands
from ..stages.signatures import signatures
from ..stages.verify import SEMI_FILTER_MAX_PAIRS, verify_pairs


def near_dup_pairs(docs, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                   id_col: str = "doc_id", text_col: str = "text",
                   threshold: float | None = ..., sig_ds=None,
                   strategy: str = "full", counters=None):
    """→ Dataset(a, b, intersection, union, jaccard) of verified
    near-duplicate pairs with jaccard ≥ threshold (default
    cfg.verify_threshold).

    ``strategy``: "full" (default) materializes the complete signature
    table (shingle blobs included) once and verifies against it — right
    when a large fraction of docs end up as candidate endpoints (real
    web crawls are dup-heavy; measured: endpoint fraction ~40% on the
    bench corpus, where recomputation loses).  "slim" materializes only
    band keys (~15x smaller) and recomputes shingle sets for the
    candidate-endpoint subset — wins when duplicates are sparse.
    """
    if sig_ds is not None:
        # caller-provided full signatures (must carry shingles)
        bands = explode_bands(sig_ds, cfg, id_col=id_col)
        cands = candidate_pairs(bands, cfg, id_col=id_col, counters=counters)
        return verify_pairs(cands, sig_ds, cfg, threshold=threshold,
                            id_col=id_col)

    if strategy == "full":
        full = signatures(docs, cfg, id_col=id_col, text_col=text_col,
                          with_simhash=False).materialize()
        bands = explode_bands(full, cfg, id_col=id_col)
        cands = candidate_pairs(bands, cfg, id_col=id_col, counters=counters)
        return verify_pairs(cands, full, cfg, threshold=threshold,
                            id_col=id_col)

    slim = signatures(docs, cfg, id_col=id_col, text_col=text_col,
                      keep_shingles=False, keep_minhash=False,
                      with_simhash=False).materialize()
    bands = explode_bands(slim, cfg, id_col=id_col)
    cands = candidate_pairs(bands, cfg, id_col=id_col,
                            counters=counters).materialize()

    if cands.count() > SEMI_FILTER_MAX_PAIRS:
        # endpoint ids too many to collect: full-signature fallback
        full = signatures(docs, cfg, id_col=id_col, text_col=text_col,
                          with_simhash=False).materialize()
        return verify_pairs(cands, full, cfg, threshold=threshold,
                            id_col=id_col, assume_small=False)

    # recompute shingle sets for candidate-endpoint docs only
    import numpy as np
    import pyarrow as pa
    import ray

    tabs = [ray.get(r) for r in
            cands.select_columns(["a", "b"]).to_arrow_refs()]
    tabs = [t for t in tabs if len(t)]
    if not tabs:
        from ..stages.verify import _empty_joined, score_pairs
        return score_pairs(_empty_joined(), cfg, threshold=threshold)
    tab = pa.concat_tables(tabs)
    need = np.unique(np.concatenate([
        np.asarray(tab["a"], dtype=np.int64),
        np.asarray(tab["b"], dtype=np.int64)]))

    def _semi(t, nd=need):
        ids = np.asarray(t[id_col], dtype=np.int64)
        pos = np.searchsorted(nd, ids)
        pos = np.clip(pos, 0, max(len(nd) - 1, 0))
        return t.filter(pa.array(nd[pos] == ids))

    docs_sub = docs.map_batches(_semi, batch_format="pyarrow")
    sig_sub = signatures(docs_sub, cfg, id_col=id_col, text_col=text_col,
                         keep_minhash=False, with_simhash=False)
    # sig_sub is already the exact needed subset: force the matching
    # physical verify plan by size
    from ..stages.verify import VERIFY_BROADCAST_MAX_PAIRS
    small = cands.count() <= VERIFY_BROADCAST_MAX_PAIRS
    return verify_pairs(cands, sig_sub.materialize(), cfg,
                        threshold=threshold, id_col=id_col,
                        assume_small=True if small else None)


def near_dup_clusters(docs, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                      id_col: str = "doc_id", text_col: str = "text",
                      threshold: float | None = ..., checkpoint_fn=None,
                      counters=None):
    """→ Dataset(node, component): connected components of the verified
    near-dup graph; component = min doc_id of each cluster.  Docs that
    belong to no cluster are absent (their implicit component is
    themselves)."""
    pairs = near_dup_pairs(docs, cfg, id_col=id_col, text_col=text_col,
                           threshold=threshold, counters=counters)
    # materialize: the verified dup-pair set is tiny relative to the
    # corpus, and CC references it twice (fwd+rev symmetrize)
    pairs = pairs.select_columns(["a", "b"]).materialize()
    if counters is not None:
        counters.add.remote({"verified_pairs": pairs.count()})
    if pairs.count() == 0:
        import pyarrow as pa
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "component": pa.array([], pa.int64()),
        }))
    return connected_components(pairs, cfg, checkpoint_fn=checkpoint_fn,
                                counters=counters)
