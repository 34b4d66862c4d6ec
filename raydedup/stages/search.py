"""BM25 full-text ranking over the corpus — the lexical leg of the
similarity-search surface (the ANN stages cover the embedding leg).

Okapi BM25 with the Lucene idf form (Robertson/Sparck Jones with +1 so
it is always positive):

    idf(t)      = ln((N - df + 0.5) / (df + 0.5) + 1)
    score(d, Q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

Physical plan (two streaming passes over the docs, no shuffle at all —
the query side is a handful of terms, so every "join" is a broadcast):

  1. stats pass: each batch emits ONE row of integer partials
     (n_docs, Σdl, df per query term); the driver sums them — pull is
     provably bounded at one row per block.  df/idf live on the driver
     (|Q| scalars) and ship inside the scoring closure.
  2. scoring pass: per-batch vectorized tf via `pc.index_in` on the
     flattened token values (EXACT string match — no hash-collision
     caveat), per-doc score, per-batch top-k partial;
  3. k·n_blocks partial rows collapse through one single-partition
     merge (`repartition(1)`) — the same stateless-partials top-k shape
     as ann.ann_topk_bruteforce.

Determinism contract (how a float formula hash-checks vs DuckDB): each
TERM's contribution is rounded to e6 fixed point half-away-from-zero
(functions/numeric.round_half_away) and the per-doc score is the
INTEGER sum of those — integer addition is associative, so the result
is independent of both engines' summation order.  The contribution
expression is written in the exact literal form the SQL oracle uses
(same association order, same literals), so both sides round identical
IEEE doubles; the ln() libm-ulp hazard is absorbed by the e6 round
(the repo-wide *_e6 convention, numeric.py:1-10).

Reference provenance: this is the engine's "query the corpus" surface;
the reference has no retrieval op, but its weighted-Jaccard scoring
loop (jaccard.cpp:462-540, weights read per-edge) is the same
gather-score-reduce shape recast here over (term, doc) postings.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions.numeric import round_half_away


def _tf_dl(t: pa.Table, text_col: str, qarr: pa.StringArray,
           sep: str) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc (tf matrix [n_docs × m], dl vector) for one batch —
    flattened-token vectorized, exact string matching."""
    texts = pc.fill_null(t[text_col].combine_chunks(), "")
    toks = pc.split_pattern(texts, pattern=sep)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = np.asarray(toks.offsets, dtype=np.int64)
    tv = toks.values
    n_docs = len(t)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64),
                        offs[1:] - offs[:-1])
    ne = pc.not_equal(tv, "")
    if isinstance(ne, pa.ChunkedArray):
        ne = ne.combine_chunks()
    nonempty = np.asarray(ne)
    dl = np.bincount(doc_idx[nonempty], minlength=n_docs).astype(np.int64)

    hit = pc.index_in(tv, value_set=qarr)   # int32, null = no match
    valid = hit.is_valid().to_numpy(zero_copy_only=False)
    hv = hit.fill_null(0).to_numpy(zero_copy_only=False)
    tf = np.zeros((n_docs, len(qarr)), dtype=np.int64)
    if valid.any():
        np.add.at(tf, (doc_idx[valid], hv[valid].astype(np.int64)), 1)
    return tf, dl


def bm25_topk(docs_ds, query_terms: list[str],
              cfg: PipelineConfig = DEFAULT_CONFIG, *, k: int = 20,
              k1: float = 1.2, b: float = 0.75, id_col: str = "doc_id",
              text_col: str = "text", sep: str = " "):
    """Top-``k`` documents by BM25 score for the term set
    ``query_terms`` as ``(doc_id, score_e6)``, score descending with
    min-id tie-break (deterministic at the rank-k boundary).  Only
    documents containing at least one query term are ranked."""
    import ray
    import ray.data as rd

    if not query_terms or len(set(query_terms)) != len(query_terms):
        raise ValueError("query_terms must be a non-empty list of "
                         "distinct terms")
    if any(t == "" or sep in t for t in query_terms):
        raise ValueError(f"query terms must be non-empty and not "
                         f"contain the separator {sep!r}")
    qarr = pa.array(query_terms, pa.string())
    m = len(query_terms)

    # ---- pass 1: one integer partial row per batch, summed driver-side
    def _stats(t: pa.Table) -> pa.Table:
        tf, dl = _tf_dl(t, text_col, qarr, sep)
        # N counts docs with >=1 NON-EMPTY token — the oracle derives
        # its stats from the dl CTE, where an empty/whitespace-only doc
        # has no row; counting it here would shift every idf and avgdl
        cols = {"n_docs": pa.array([int((dl > 0).sum())], pa.int64()),
                "sum_dl": pa.array([int(dl.sum())], pa.int64())}
        present = (tf > 0).sum(axis=0)
        for j in range(m):
            cols[f"df_{j}"] = pa.array([int(present[j])], pa.int64())
        return pa.table(cols)

    parts = docs_ds.map_batches(_stats, batch_format="pyarrow",
                                batch_size=cfg.batch_size,
                                zero_copy_batch=True).materialize()
    tabs = [t for t in ray.get(list(parts.to_arrow_refs())) if len(t)]
    if not tabs:
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "score_e6": pa.array([], pa.int64())}))
    stat = pa.concat_tables(tabs)
    n_total = int(pc.sum(stat["n_docs"]).as_py() or 0)
    sum_dl = int(pc.sum(stat["sum_dl"]).as_py() or 0)
    df = np.array([int(pc.sum(stat[f"df_{j}"]).as_py() or 0)
                   for j in range(m)], dtype=np.int64)
    if n_total == 0:
        avgdl = 1.0
    else:
        avgdl = float(sum_dl) / float(n_total)   # sum_dl::DOUBLE / n_docs
    # idf per term, Lucene form — matches the oracle's ln() literally
    idf = np.log((n_total - df + 0.5) / (df + 0.5) + 1)

    # ---- pass 2: per-batch scores + local top-k partials
    def _score(t: pa.Table) -> pa.Table:
        tf, dl = _tf_dl(t, text_col, qarr, sep)
        ids = np.asarray(t[id_col], dtype=np.int64)
        any_hit = tf.sum(axis=1) > 0
        tf, dl, ids = tf[any_hit], dl[any_hit], ids[any_hit]
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "score_e6": pa.array([], pa.int64())})
        tff = tf.astype(np.float64)
        # EXACT oracle expression, same association order:
        #   idf * tf * (1.2 + 1) / (tf + 1.2*(1 - 0.75 + 0.75*dl/avgdl))
        denom = tff + k1 * (1.0 - b + b * dl.astype(np.float64)[:, None]
                            / avgdl)
        contrib = idf[None, :] * tff * (k1 + 1.0) / denom
        c_e6 = round_half_away(np.where(tff > 0, contrib * 1e6, 0.0)
                               ).astype(np.int64)
        score = c_e6.sum(axis=1)
        order = np.lexsort((ids, -score))[:k]
        return pa.table({id_col: pa.array(ids[order], pa.int64()),
                         "score_e6": pa.array(score[order], pa.int64())})

    def _final(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col], dtype=np.int64)
        score = np.asarray(t["score_e6"], dtype=np.int64)
        order = np.lexsort((ids, -score))[:k]
        return pa.table({id_col: pa.array(ids[order], pa.int64()),
                         "score_e6": pa.array(score[order], pa.int64())})

    partials = docs_ds.map_batches(_score, batch_format="pyarrow",
                                   batch_size=cfg.batch_size,
                                   zero_copy_batch=True)
    return partials.repartition(1).map_batches(
        _final, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)
