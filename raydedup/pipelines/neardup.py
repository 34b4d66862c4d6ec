"""The flagship pipeline: MinHash-LSH near-duplicate detection + clustering.

    docs ──map_batches(SignatureStage)──► signatures
         ──explode bands──► (band_key, doc_id)
         ──groupby/join──► candidate pairs (a<b)
         ──join shingles ×2 + score──► verified pairs (jaccard ≥ τ)
         ──hash-min CC──► (doc_id, component)

Every wide step's shuffle key is explicit (stages/lsh.py, stages/cc.py);
signatures can be checkpointed to Parquet between stages
(pipelines/checkpoint.py) so a resumed run skips completed stages.
"""

from __future__ import annotations

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..stages.cc import connected_components
from ..stages.lsh import candidate_pairs, explode_bands
from ..stages.signatures import signatures
from ..stages.verify import verify_pairs


def near_dup_pairs(docs, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                   id_col: str = "doc_id", text_col: str = "text",
                   threshold: float | None = ..., sig_ds=None):
    """→ Dataset(a, b, intersection, union, jaccard) of verified
    near-duplicate pairs with jaccard ≥ threshold (default
    cfg.verify_threshold)."""
    if sig_ds is None:
        sig_ds = signatures(docs, cfg, id_col=id_col, text_col=text_col,
                            with_simhash=False)  # not needed on this path
        sig_ds = sig_ds.materialize()  # reused by banding AND verification
    bands = explode_bands(sig_ds, cfg, id_col=id_col)
    cands = candidate_pairs(bands, cfg, id_col=id_col)
    return verify_pairs(cands, sig_ds, cfg, threshold=threshold, id_col=id_col)


def near_dup_clusters(docs, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                      id_col: str = "doc_id", text_col: str = "text",
                      threshold: float | None = ..., checkpoint_fn=None):
    """→ Dataset(node, component): connected components of the verified
    near-dup graph; component = min doc_id of each cluster.  Docs that
    belong to no cluster are absent (their implicit component is
    themselves)."""
    pairs = near_dup_pairs(docs, cfg, id_col=id_col, text_col=text_col,
                           threshold=threshold)
    # materialize: the verified dup-pair set is tiny relative to the
    # corpus, and CC's symmetrize references it twice — without this the
    # whole upstream join DAG would execute twice in one graph
    pairs = pairs.select_columns(["a", "b"]).materialize()
    return connected_components(pairs, cfg, checkpoint_fn=checkpoint_fn)
