"""Decontamination: remove corpus docs that (near-)duplicate a REFERENCE
set — the training-data leakage guard (eval/test-set overlap removal).

Physical plan — ZERO shuffles.  The reference side (test sets: thousands
to a few million docs) is signed distributed, then collected and packed
(band keys + shingle sets, bounded by |reference|) and broadcast once
with ``ray.put``.  A single streaming map over the corpus then

  1. computes each batch's LSH band keys with the same fused stream-OPH
     kernels the near-dup pipeline uses (bit-identical keys),
  2. probes the sorted reference band-key table (searchsorted — no hash
     set rebuild per batch),
  3. recomputes shingle sets ONLY for the banded-hit docs,
  4. scores each hit doc against only the reference docs sharing a band
     (exact Jaccard, the reference's J = Wi/(Ws−Wi) formula), and
  5. drops docs with J ≥ threshold.

The corpus is touched exactly once and never materialized; at 10^12
docs this is a pure map stage — the right shape when one side is tiny,
mirroring the broadcast-side rule in SURVEY.md §4.2.  Reference kernel
lineage: banding/verify reuse jaccard.cpp:332-367's iterate-smaller
sorted intersection recast as the batched kernels in functions/setops.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions.broadcast import bcast_get
from ..functions.sketches import band_keys, minhash_oph_stream
from ..functions.text import (TOKEN_CACHE_COL, batch_tokens, binary_to_sets,
                              shingle_batch, shingle_stream,
                              tokens_to_column)


def _gather_rows(values: np.ndarray, offsets: np.ndarray,
                 rows: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """CSR row gather: rows (may repeat) → (values, offsets) of the
    selected rows concatenated — all numpy, no Python loop."""
    lens = (offsets[rows + 1] - offsets[rows]).astype(np.int64)
    out_offs = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum(lens, out=out_offs[1:])
    total = int(out_offs[-1])
    if total == 0:
        return np.empty(0, dtype=values.dtype), out_offs
    intra = np.arange(total, dtype=np.int64) - np.repeat(out_offs[:-1], lens)
    src = np.repeat(offsets[rows].astype(np.int64), lens) + intra
    return values[src], out_offs


def build_reference_pack(reference_ds, cfg: PipelineConfig = DEFAULT_CONFIG,
                         *, id_col: str = "doc_id", text_col: str = "text"):
    """Public pack builder: call once and pass the result as ``pack=``
    to both ``decontaminate`` and ``decontamination_matches`` to sign
    and collect the reference a single time."""
    return _build_reference_pack(reference_ds, cfg, id_col, text_col)


def _build_reference_pack(reference_ds, cfg: PipelineConfig,
                          id_col: str, text_col: str):
    """Distributed signature pass over the reference, collected into one
    broadcastable pack: sorted (band_key, ref_idx) pairs for probing +
    the reference shingle sets (CSR) + ids.  Driver state is bounded by
    |reference| — the small side by design."""
    import ray

    from .signatures import signatures

    sig = signatures(reference_ds, cfg, id_col=id_col, text_col=text_col,
                     keep_shingles=True, with_simhash=False,
                     keep_minhash=False, keep_bands=True)
    tabs = [t for t in ray.get(sig.to_arrow_refs()) if len(t)]
    if not tabs:
        return None
    tab = pa.concat_tables(tabs)
    ids = np.asarray(tab[id_col], dtype=np.int64)
    vals, offs = binary_to_sets(tab["shingles"])
    bands = np.asarray(tab["bands"].combine_chunks().flatten(),
                       dtype=np.uint64).reshape(len(ids), cfg.bands)
    nonempty = (offs[1:] - offs[:-1]) > 0
    key = bands.ravel()
    owner = np.repeat(np.arange(len(ids), dtype=np.int64), cfg.bands)
    live = np.repeat(nonempty, cfg.bands)
    key, owner = key[live], owner[live]
    order = np.argsort(key, kind="stable")
    return {
        "band_sorted": key[order],
        "band_owner": owner[order],
        "ref_ids": ids,
        "ref_vals": vals,
        "ref_offs": offs,
    }


# per-worker-process seed cache (signatures.py's stage-cache pattern):
# permutation seeds are built once per worker, not once per batch, while
# the map stage stays a stateless elastic task pool.
_SEED_CACHE: dict = {}


def _cached_seeds(num_perms: int, seed: int) -> np.ndarray:
    from ..functions.hashing import perm_seeds

    key = (num_perms, seed)
    s = _SEED_CACHE.get(key)
    if s is None:
        s = perm_seeds(num_perms, seed)
        _SEED_CACHE[key] = s
    return s


def _match_batch(batch: pa.Table, pack: dict, cfg: PipelineConfig,
                 id_col: str, text_col: str, thr: float):
    """→ (drop_mask over batch rows, matches table(corpus_id, ref_id,
    jaccard)).  Steps 1-5 of the module docstring for one Arrow batch."""
    from ..functions.setops import pairwise_jaccard

    n = len(batch)
    empty = pa.table({"corpus_id": pa.array([], pa.int64()),
                      "ref_id": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
    if n == 0:
        return np.zeros(0, dtype=bool), empty
    seeds = _cached_seeds(cfg.num_perms, cfg.seed)
    # tokenize-once: reuse an upstream stage's token-hash cache column
    # when present (quality_filter carry_tokens), else tokenize here
    tok = batch_tokens(batch, text_col)
    wh, wd, n_docs = shingle_stream(batch[text_col], cfg.k_shingle, tok=tok)
    sig = minhash_oph_stream(wh, wd, n_docs, cfg.num_perms, seeds[0])
    bk = band_keys(sig, cfg.bands, cfg.rows_per_band)      # (n, B)
    nonempty = np.bincount(wd, minlength=n_docs) > 0
    keys = bk.ravel()
    doc_of = np.repeat(np.arange(n, dtype=np.int64), cfg.bands)
    live = np.repeat(nonempty, cfg.bands)
    keys, doc_of = keys[live], doc_of[live]

    bs = pack["band_sorted"]
    lo = np.searchsorted(bs, keys, side="left")
    hi = np.searchsorted(bs, keys, side="right")
    runs = hi - lo
    hit = runs > 0
    if not hit.any():
        return np.zeros(n, dtype=bool), empty
    # expand each hit band to its (corpus doc, ref idx) pairs
    lo, runs, doc_of = lo[hit], runs[hit], doc_of[hit]
    starts = np.zeros(len(runs) + 1, dtype=np.int64)
    np.cumsum(runs, out=starts[1:])
    intra = np.arange(int(starts[-1]), dtype=np.int64) \
        - np.repeat(starts[:-1], runs)
    ref_idx = pack["band_owner"][np.repeat(lo, runs) + intra]
    cor_idx = np.repeat(doc_of, runs)
    pairs = np.unique(np.stack([cor_idx, ref_idx], axis=1), axis=0)
    cor_idx, ref_idx = pairs[:, 0], pairs[:, 1]

    # exact verification: sets for the hit corpus docs only
    hit_docs = np.unique(cor_idx)
    sub = batch.take(pa.array(hit_docs, pa.int64()))
    cv, co = shingle_batch(sub[text_col], cfg.k_shingle,
                           tok=batch_tokens(sub, text_col))
    local_of = np.searchsorted(hit_docs, cor_idx)
    av, ao = _gather_rows(cv, co, local_of)
    bv, bo = _gather_rows(pack["ref_vals"], pack["ref_offs"], ref_idx)
    _, _, j = pairwise_jaccard(av, ao, bv, bo)
    matched = j >= thr
    drop_mask = np.zeros(n, dtype=bool)
    drop_mask[cor_idx[matched]] = True
    ids = np.asarray(batch[id_col], dtype=np.int64)
    matches = pa.table({
        "corpus_id": pa.array(ids[cor_idx[matched]], pa.int64()),
        "ref_id": pa.array(pack["ref_ids"][ref_idx[matched]], pa.int64()),
        "jaccard": pa.array(j[matched], pa.float64()),
    })
    return drop_mask, matches


def decontaminate(corpus_ds, reference_ds, cfg: PipelineConfig = DEFAULT_CONFIG,
                  *, id_col: str = "doc_id", text_col: str = "text",
                  threshold: float | None = None, counters=None, pack=None,
                  carry_tokens: bool = False):
    """Corpus rows whose text does NOT near-duplicate (J ≥ threshold,
    default cfg.verify_threshold) any reference doc — original columns
    preserved, streaming, zero shuffles.  ``pack``: a prebuilt
    ``build_reference_pack`` result (reference_ds ignored then).
    ``carry_tokens``: attach the token-hash cache column to the output
    for the next zero-shuffle stage (see quality_filter)."""
    import ray

    thr = cfg.verify_threshold if threshold is None else threshold
    if pack is None:
        pack = _build_reference_pack(reference_ds, cfg, id_col, text_col)
    if pack is None:
        return corpus_ds
    pack_ref = ray.put(pack)

    def _filter(batch: pa.Table) -> pa.Table:
        p = bcast_get(pack_ref)
        if carry_tokens and TOKEN_CACHE_COL not in batch.column_names:
            batch = batch.append_column(
                TOKEN_CACHE_COL,
                tokens_to_column(*batch_tokens(batch, text_col)))
        drop, _ = _match_batch(batch, p, cfg, id_col, text_col, thr)
        if counters is not None and drop.any():
            counters.add.remote(            # settle on read, not here
                {"decontam_dropped": int(drop.sum())})
        return batch.filter(pa.array(~drop))

    return corpus_ds.map_batches(_filter, batch_format="pyarrow",
                                 batch_size=cfg.batch_size,
                                 zero_copy_batch=True)


def decontamination_matches(corpus_ds, reference_ds,
                            cfg: PipelineConfig = DEFAULT_CONFIG, *,
                            id_col: str = "doc_id", text_col: str = "text",
                            threshold: float | None = None, pack=None):
    """→ Dataset(corpus_id, ref_id, jaccard): every (corpus doc,
    reference doc) near-dup match at J ≥ threshold — the audit-trail
    companion to ``decontaminate`` (what leaked, and from where).
    ``pack``: prebuilt ``build_reference_pack`` result."""
    import ray

    thr = cfg.verify_threshold if threshold is None else threshold
    if pack is None:
        pack = _build_reference_pack(reference_ds, cfg, id_col, text_col)
    empty = pa.table({"corpus_id": pa.array([], pa.int64()),
                      "ref_id": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
    if pack is None:
        import ray.data as rd
        return rd.from_arrow(empty)
    pack_ref = ray.put(pack)

    def _matches(batch: pa.Table) -> pa.Table:
        p = bcast_get(pack_ref)
        _, m = _match_batch(batch, p, cfg, id_col, text_col, thr)
        return m

    return corpus_ds.map_batches(_matches, batch_format="pyarrow",
                                 batch_size=cfg.batch_size,
                                 zero_copy_batch=True)


def decontaminate_exact(corpus_ds, reference_ds,
                        cfg: PipelineConfig = DEFAULT_CONFIG, *,
                        id_col: str = "doc_id", text_col: str = "text",
                        counters=None):
    """Exact-text decontamination: drop corpus rows whose text is
    byte-identical to any reference doc.  Broadcast sorted 128-bit
    content hashes of the reference; one searchsorted per batch."""
    import ray

    from .dedup import _HASH_COLS, with_text_hash

    hashed_ref = with_text_hash(
        reference_ds.select_columns([id_col, text_col]), text_col)
    tabs = [t for t in ray.get(hashed_ref.to_arrow_refs()) if len(t)]
    if not tabs:
        return corpus_ds
    ref = pa.concat_tables(tabs)
    # pack the two 64-bit hashes into lexsorted order for a single
    # binary-search membership probe
    rh = np.stack([np.asarray(ref[c], dtype=np.int64) for c in _HASH_COLS],
                  axis=1)
    rh = rh[np.lexsort((rh[:, 1], rh[:, 0]))]
    ref_pack = ray.put(rh)

    def _filter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..functions.hashing import hash_strings
        import pandas as pd

        r = bcast_get(ref_pack)
        texts = pc.fill_null(batch[text_col], "").to_numpy(
            zero_copy_only=False)
        h1 = hash_strings(texts).view(np.int64)
        obj = np.asarray(texts, dtype=object)
        from .dedup import _KEY2
        h2 = (pd.util.hash_array(obj, hash_key=_KEY2, categorize=False)
              if len(obj) else np.empty(0, np.uint64)).view(np.int64)
        pos = np.searchsorted(r[:, 0], h1)
        pos = np.clip(pos, 0, max(len(r) - 1, 0))
        drop = np.zeros(len(batch), dtype=bool)
        # scan forward over the (tiny) h1-collision runs
        cand = np.flatnonzero(r[pos, 0] == h1) if len(r) else np.empty(0, int)
        for i in cand:
            p = pos[i]
            while p < len(r) and r[p, 0] == h1[i]:
                if r[p, 1] == h2[i]:
                    drop[i] = True
                    break
                p += 1
        if counters is not None and drop.any():
            counters.add.remote(            # settle on read, not here
                {"decontam_exact_dropped": int(drop.sum())})
        return batch.filter(pa.array(~drop))

    return corpus_ds.map_batches(_filter, batch_format="pyarrow",
                                 batch_size=cfg.batch_size,
                                 zero_copy_batch=True)


# ---------------------------------------------------------- n-gram guard

class NgramPack(NamedTuple):
    """Broadcastable n-gram guard pack: the sorted unique window hashes
    AND the n they were built with — the window width and the hash
    space are coupled (a pack probed at a different n silently yields
    zero matches), so the pack carries its n and the consumers verify
    it."""
    grams: np.ndarray
    n: int


def build_ngram_pack(reference_ds, n: int = 13, *, text_col: str = "text",
                     batch_size: int = 4096) -> "NgramPack | None":
    """Sorted unique uint64 window hashes of every n-token-gram in the
    reference — the broadcastable side of the GPT-3-style n-gram
    leakage guard (Brown et al. 2020 §C dropped training docs sharing a
    13-gram with an eval doc).  Distributed sign (per-batch unique
    inside map_batches), driver holds only the merged gram array:
    bounded by the reference's distinct gram count, the small side by
    definition.  Returns None for an empty / too-short reference."""
    import ray

    from ..functions.text import shingle_stream

    def _grams(batch: pa.Table) -> pa.Table:
        wh, _, _ = shingle_stream(batch[text_col], n)
        return pa.table({"g": pa.array(np.unique(wh), pa.uint64())})

    gr = reference_ds.select_columns([text_col]).map_batches(
        _grams, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True)
    tabs = [t for t in ray.get(gr.to_arrow_refs()) if len(t)]
    if not tabs:
        return None
    return NgramPack(np.unique(np.asarray(pa.concat_tables(tabs)["g"],
                                          dtype=np.uint64)), int(n))


def _resolve_ngram_pack(pack, n: int | None) -> tuple[np.ndarray, int]:
    """Unwrap an NgramPack (or bare ndarray, back-compat) + requested n
    → (grams, effective n); a pack built at a different n than the one
    requested fails loudly instead of silently matching nothing."""
    if isinstance(pack, NgramPack):
        if n is not None and n != pack.n:
            raise ValueError(
                f"ngram pack was built with n={pack.n} but n={n} was "
                f"requested — window hashes would never match; rebuild "
                f"the pack or drop the explicit n")
        return pack.grams, pack.n
    return pack, (13 if n is None else n)


def _ngram_hits(batch: pa.Table, grams: np.ndarray, n: int, text_col: str
                ) -> tuple[np.ndarray, np.ndarray]:
    """→ (per-doc total window count, per-doc contaminated window count)
    for one Arrow batch — duplicate windows counted per position, so the
    DuckDB per-position oracle agrees exactly."""
    wh, wd, n_docs = shingle_stream(batch[text_col], n,
                                    tok=batch_tokens(batch, text_col))
    total = np.bincount(wd, minlength=n_docs).astype(np.int64)
    if len(wh) == 0 or len(grams) == 0:
        return total, np.zeros(n_docs, dtype=np.int64)
    pos = np.searchsorted(grams, wh)
    pos_c = np.minimum(pos, len(grams) - 1)
    hit = grams[pos_c] == wh
    return total, np.bincount(wd[hit], minlength=n_docs).astype(np.int64)


def decontaminate_ngram(corpus_ds, reference_ds,
                        cfg: PipelineConfig = DEFAULT_CONFIG, *,
                        n: int | None = None, max_hits: int = 0,
                        id_col: str = "doc_id", text_col: str = "text",
                        counters=None, pack=None):
    """N-gram decontamination: drop corpus docs sharing MORE THAN
    ``max_hits`` n-token-grams (window positions) with the reference.
    Zero shuffles — the reference gram table is broadcast once
    (``ray.put``) and the corpus is touched in one streaming map, the
    same broadcast-small-side shape as ``decontaminate``.  ``pack``: a
    prebuilt ``build_ngram_pack`` result (reference_ds ignored then);
    ``n`` defaults to the pack's n, else 13, and an explicit n that
    disagrees with the pack raises.

    This is the standard eval-leakage guard stricter than whole-doc
    similarity: a single overlapping 13-gram marks the doc, however
    dissimilar the rest is."""
    import ray

    if pack is None:
        if reference_ds is None:
            raise ValueError("decontaminate_ngram needs a reference_ds "
                             "or a prebuilt pack")
        pack = build_ngram_pack(reference_ds, 13 if n is None else n,
                                text_col=text_col,
                                batch_size=cfg.batch_size)
    if pack is None:
        return corpus_ds
    grams, n = _resolve_ngram_pack(pack, n)
    pack_ref = ray.put(grams)

    def _filter(batch: pa.Table) -> pa.Table:
        grams = bcast_get(pack_ref)
        _, hits = _ngram_hits(batch, grams, n, text_col)
        drop = hits > max_hits
        if counters is not None and drop.any():
            counters.add.remote(            # settle on read, not here
                {"decontam_ngram_dropped": int(drop.sum())})
        return batch.filter(pa.array(~drop))

    return corpus_ds.map_batches(_filter, batch_format="pyarrow",
                                 batch_size=cfg.batch_size,
                                 zero_copy_batch=True)


def ngram_contamination_stats(corpus_ds, reference_ds,
                              cfg: PipelineConfig = DEFAULT_CONFIG, *,
                              n: int | None = None, id_col: str = "doc_id",
                              text_col: str = "text", pack=None):
    """→ Dataset(doc_id, n_grams, n_contaminated, frac) for every corpus
    doc with ≥1 contaminated n-gram window — the audit companion to
    ``decontaminate_ngram`` (how MUCH of each flagged doc overlaps the
    reference, per window position)."""
    import ray

    if pack is None:
        if reference_ds is None:
            raise ValueError("ngram_contamination_stats needs a "
                             "reference_ds or a prebuilt pack")
        pack = build_ngram_pack(reference_ds, 13 if n is None else n,
                                text_col=text_col,
                                batch_size=cfg.batch_size)
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "n_grams": pa.array([], pa.int64()),
                      "n_contaminated": pa.array([], pa.int64()),
                      "frac": pa.array([], pa.float64())})
    if pack is None:
        import ray.data as rd
        return rd.from_arrow(empty)
    grams_arr, n = _resolve_ngram_pack(pack, n)
    pack_ref = ray.put(grams_arr)

    def _stats(batch: pa.Table) -> pa.Table:
        grams = bcast_get(pack_ref)
        total, hits = _ngram_hits(batch, grams, n, text_col)
        keep = hits > 0
        if not keep.any():
            return empty
        ids = np.asarray(batch[id_col], dtype=np.int64)[keep]
        t, h = total[keep], hits[keep]
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "n_grams": pa.array(t, pa.int64()),
                         "n_contaminated": pa.array(h, pa.int64()),
                         "frac": pa.array(h / t, pa.float64())})

    return corpus_ds.map_batches(_stats, batch_format="pyarrow",
                                 batch_size=cfg.batch_size,
                                 zero_copy_batch=True)
