"""Signature stage: text → shingle set + MinHash + SimHash + LSH band keys.

A stateful actor-pool stage (SURVEY.md §2.3 T3): the 128 permutation
seeds and config are built ONCE per actor in ``__init__`` — the Ray Data
analogue of the reference's device-resident buffers — and every batch is
processed as a zero-copy Arrow table with the vectorized kernels from
``raydedup.functions``.

Output schema per doc:
  doc_id:int64, n_shingles:int64, shingles:list<uint64> (sorted unique),
  minhash:fixed_size_list<uint64>[P], simhash:uint64,
  bands:fixed_size_list<uint64>[B]
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import PipelineConfig
from ..functions.hashing import perm_seeds
from ..functions.sketches import (
    band_keys,
    minhash_oph_stream,
    minhash_signatures,
    minhash_signatures_oph,
    simhash64,
)
from ..functions.text import sets_to_binary, shingle_batch, shingle_stream


class SignatureStage:
    """Callable class for ``map_batches(SignatureStage, fn_constructor_args=(cfg,),
    batch_format="pyarrow", concurrency=N)``."""

    def __init__(self, cfg: PipelineConfig, id_col: str = "doc_id",
                 text_col: str = "text", keep_shingles: bool = True,
                 with_simhash: bool = True, keep_minhash: bool = True,
                 keep_bands: bool = True):
        self.cfg = cfg
        self.id_col = id_col
        self.text_col = text_col
        self.keep_shingles = keep_shingles
        self.keep_minhash = keep_minhash
        self.with_simhash = with_simhash
        self.keep_bands = keep_bands
        self.seeds = perm_seeds(cfg.num_perms, cfg.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        slim = not (self.keep_shingles or self.keep_minhash
                    or self.with_simhash)
        if slim and cfg.minhash_mode == "oph":
            # fused stream path: raw window hashes → OPH directly, no
            # sorted-unique set materialization (bit-identical bands —
            # a per-bin min is invariant to duplicates; tested in
            # test_kernels).  n_shingles is the WINDOW count here, an
            # upper bound of the set size sharing its zero set — banding
            # only tests n_shingles > 0.
            wh, wd, n_docs = shingle_stream(batch[self.text_col],
                                            cfg.k_shingle)
            sig = minhash_oph_stream(wh, wd, n_docs, cfg.num_perms,
                                     self.seeds[0])
            bk = band_keys(sig, cfg.bands, cfg.rows_per_band)
            n_sh = np.bincount(wd, minlength=n_docs).astype(np.int64)
            return pa.table({
                self.id_col: batch[self.id_col],
                "n_shingles": pa.array(n_sh, type=pa.int64()),
                "bands": pa.FixedSizeListArray.from_arrays(
                    pa.array(bk.ravel(), type=pa.uint64()), cfg.bands
                ),
            })
        vals, offs = shingle_batch(batch[self.text_col], cfg.k_shingle)
        n_sh = (offs[1:] - offs[:-1]).astype(np.int64)
        cols = {
            self.id_col: batch[self.id_col],
            "n_shingles": pa.array(n_sh, type=pa.int64()),
        }
        if self.keep_bands or self.keep_minhash:
            if cfg.minhash_mode == "oph":
                sig = minhash_signatures_oph(vals, offs, cfg.num_perms,
                                             self.seeds[0])
            else:
                sig = minhash_signatures(vals, offs, self.seeds,
                                         cfg.minhash_perm_chunk)
        if self.keep_bands:
            bk = band_keys(sig, cfg.bands, cfg.rows_per_band)
            cols["bands"] = pa.FixedSizeListArray.from_arrays(
                pa.array(bk.ravel(), type=pa.uint64()), cfg.bands
            )
        if self.keep_minhash:
            cols["minhash"] = pa.FixedSizeListArray.from_arrays(
                pa.array(sig.ravel(), type=pa.uint64()), cfg.num_perms
            )
        if self.with_simhash:
            cols["simhash"] = pa.array(simhash64(vals, offs), type=pa.uint64())
        if self.keep_shingles:
            # binary wire format (not list<uint64>): shingle sets must
            # survive Acero hash joins in the verification stage
            cols["shingles"] = sets_to_binary(vals, offs)
        return pa.table(cols)


_WORKER_STAGE_CACHE: dict = {}


def signatures(ds, cfg: PipelineConfig, *, id_col: str = "doc_id",
               text_col: str = "text", keep_shingles: bool = True,
               with_simhash: bool = True, keep_minhash: bool = True,
               keep_bands: bool = True, concurrency=None):
    """Attach signatures to a Dataset of documents.

    Physical execution: stateless Ray tasks with a per-worker-process
    stage cache — the permutation state is still built once per worker
    (the actor-pool guarantee) but without actor-pool scheduling
    constraints: tasks are fully elastic, so the stage scales to
    whatever CPUs the streaming executor has free.  Pass ``concurrency``
    to force a fixed actor pool instead (e.g. when future stage state
    becomes expensive enough to pin)."""
    if concurrency is not None:
        return ds.map_batches(
            SignatureStage,
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            zero_copy_batch=True,
            fn_constructor_args=(cfg,),
            fn_constructor_kwargs=dict(
                id_col=id_col, text_col=text_col, keep_shingles=keep_shingles,
                with_simhash=with_simhash, keep_minhash=keep_minhash,
                keep_bands=keep_bands,
            ),
            concurrency=concurrency,
        )

    key = (cfg.config_hash(), id_col, text_col, keep_shingles,
           with_simhash, keep_minhash, keep_bands)

    def _sig(batch: pa.Table) -> pa.Table:
        stage = _WORKER_STAGE_CACHE.get(key)
        if stage is None:
            stage = SignatureStage(cfg, id_col=id_col, text_col=text_col,
                                   keep_shingles=keep_shingles,
                                   with_simhash=with_simhash,
                                   keep_minhash=keep_minhash,
                                   keep_bands=keep_bands)
            _WORKER_STAGE_CACHE[key] = stage
        return stage(batch)

    return ds.map_batches(_sig, batch_format="pyarrow",
                          batch_size=cfg.batch_size, zero_copy_batch=True)
