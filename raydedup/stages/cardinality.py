"""HyperLogLog approximate distinct counting — the cardinality sketch a
100-TB pipeline uses where exact distinct (token_doc_freq / top_k_vocab's
exchange) would shuffle the whole key space.

Flajolet et al., "HyperLogLog: the analysis of a near-optimal cardinality
estimation algorithm" (AofA 2007), with the standard small-range linear
counting correction.  64-bit hashes (functions/hashing.hash_utf8_array —
the repo's byte-exact FNV path) make the large-range correction
unnecessary.

Scale shape: each map chunk folds its values into a 2^p-register int8
array (16 KB at p=14) — per-chunk exchange volume is the REGISTER ARRAY,
independent of both chunk size and cardinality.  Registers merge by
elementwise max through a two-level tree (P partition-level maxes, then
one final max over P rows), so no single task ever sees more than
max(chunks/P, P) register arrays.  The estimate is deterministic for a
given input (fixed hash, max is commutative/associative) — tests pin it
— but is NOT SQL-oracle-comparable: DuckDB's approx_count_distinct is a
different HLL implementation, so the driver records a rows-only check
and the accuracy gate lives in tests/test_cardinality.py (relative
error < 2% at p=14 against exact np.unique truth).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions.hashing import hash_utf8_array


def _resolve_hasher(hash_family: str):
    """'fnv' = the production buffer-level kernel; 'md5' = the
    ORACLE-LEG family (== DuckDB ``md5_number_lower``), which makes the
    register table SQL-hash-checkable — see q_approx_distinct_scored."""
    if hash_family == "fnv":
        return hash_utf8_array
    if hash_family == "md5":
        from ..functions.hashing import md5_lower64_array
        return md5_lower64_array
    raise ValueError(f"unknown hash_family {hash_family!r}")


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def fold_registers(h: np.ndarray, p: int) -> np.ndarray:
    """uint64 hashes → 2^p int8 registers (max rank per bucket)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.int8)
    if not len(h):
        return regs
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    # rank = position of leftmost 1-bit in the remaining 64-p bits, +1;
    # all-zero rest → 64-p+1
    nbits = 64 - p
    rank = np.full(len(h), nbits + 1, dtype=np.int8)
    nz = rest != 0
    # leftmost set bit index from the top via log2 on float64 is unsafe
    # near 2^63; use bit_length via uint64 -> float trick avoided:
    # np.frexp gives exact exponents for integers < 2^64 cast to float64?
    # Not exact either.  Do it with a 4-step binary reduction instead.
    r = rest[nz]
    lz = np.zeros(r.shape, dtype=np.int8)
    for shift in (32, 16, 8, 4, 2, 1):
        mask = r < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += shift
        r[mask] = r[mask] << np.uint64(shift)
    rank[nz] = np.minimum(lz + 1, nbits + 1)
    np.maximum.at(regs, bucket, rank)
    return regs


def estimate(regs: np.ndarray) -> float:
    """Registers → cardinality estimate (raw HLL + linear counting)."""
    m = len(regs)
    est = _alpha(m) * m * m / float(np.sum(np.exp2(-regs.astype(np.float64))))
    if est <= 2.5 * m:
        zeros = int(np.sum(regs == 0))
        if zeros:
            est = m * np.log(m / zeros)
    return est


def hll_registers(ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                  col: str = "text", p: int = 14, tokens: bool = False,
                  sep: str = " ", hash_family: str = "fnv"):
    """→ the merged 2^p register array (np.int8) for ``col``'s values
    (or, with ``tokens=True``, its non-empty ``sep``-split tokens)."""
    import ray

    from ..functions.shuffle import hash_partition_map

    n_parts = cfg.resolved_partitions()
    m = 1 << p
    hasher = _resolve_hasher(hash_family)

    def _fold(t: pa.Table) -> pa.Table:
        vals = pc.fill_null(t[col].combine_chunks(), "")
        if tokens:
            vals = pc.list_flatten(pc.split_pattern(vals, sep))
            vals = vals.filter(pc.not_equal(vals, ""))
        regs = fold_registers(hasher(vals), p)
        # route this chunk's registers to a partition by a rotating tag
        # derived from content (any spread works; max is commutative)
        part = int(regs.view(np.uint8).sum()) % n_parts
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary()),
                         "part": pa.array([part], pa.int64())})

    def _max_merge(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0:
            return pa.table({"regs": pa.array([], pa.binary())})
        acc = np.zeros(m, dtype=np.int8)
        for buf in tab["regs"]:
            np.maximum(acc, np.frombuffer(buf.as_py(), dtype=np.int8),
                       out=acc)
        return pa.table({"regs": pa.array([acc.tobytes()], pa.binary())})

    level1 = hash_partition_map(ds, "part", _max_merge, n_parts,
                                map_fn=_fold, map_chunk_rows=cfg.batch_size)
    acc = np.zeros(m, dtype=np.int8)
    for tab in ray.get(list(level1.to_arrow_refs())):   # P one-row tables
        for buf in tab["regs"]:
            np.maximum(acc, np.frombuffer(buf.as_py(), dtype=np.int8),
                       out=acc)
    return acc


def approx_distinct(ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                    col: str = "text", p: int = 14, tokens: bool = False,
                    sep: str = " ") -> pa.Table:
    """One-row table: the HLL cardinality estimate for ``col``."""
    regs = hll_registers(ds, cfg, col=col, p=p, tokens=tokens, sep=sep)
    return pa.table({
        "n_distinct_est": pa.array([int(round(estimate(regs)))], pa.int64()),
        "precision": pa.array([p], pa.int64()),
    })


def hll_registers_by(ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                     key: str, col: str = "text", p: int = 14,
                     tokens: bool = False, sep: str = " ",
                     hash_family: str = "fnv") -> pa.Table:
    """Grouped HLL: one merged 2^p register array PER DISTINCT ``key``
    value — distinct-count-per-group without shuffling the value space.

    Scale shape: each map chunk folds each key group it sees into one
    register blob (exchange volume = 16 KB x keys-present-per-chunk,
    independent of values), the ONE exchange hash-partitions blobs by
    key, and each partition max-merges its keys' blobs.  Intended for
    low-cardinality keys (lang, source, shard): total state is
    2^p bytes per distinct key.  Returns a one-row-per-key Arrow table
    ``(key:string, regs:binary)``, already fully merged (each key lands
    in exactly one partition).
    """
    from ..functions.hashing import hash_strings
    from ..functions.shuffle import hash_partition_map

    n_parts = cfg.resolved_partitions()
    m = 1 << p
    hasher = _resolve_hasher(hash_family)
    empty = pa.table({key: pa.array([], pa.string()),
                      "regs": pa.array([], pa.binary())})

    def _fold(t: pa.Table) -> pa.Table:
        keys = pc.fill_null(t[key].combine_chunks().cast(pa.string()), "")
        vals = pc.fill_null(t[col].combine_chunks(), "")
        enc = keys.dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        idx = np.asarray(enc.indices, dtype=np.int64)
        blobs = []
        for gi in range(len(uniq)):          # bounded: distinct keys/chunk
            gv = vals.filter(pa.array(idx == gi))
            if tokens:
                gv = pc.list_flatten(pc.split_pattern(gv, sep))
                gv = gv.filter(pc.not_equal(gv, ""))
            blobs.append(fold_registers(hasher(gv), p).tobytes())
        part = (hash_strings(uniq) % np.uint64(n_parts)).astype(np.int64) \
            if uniq else np.empty(0, np.int64)
        return pa.table({key: pa.array(uniq, pa.string()),
                         "regs": pa.array(blobs, pa.binary()),
                         "part": pa.array(part, pa.int64())})

    def _max_merge(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0:
            return empty
        kv = tab[key].combine_chunks()
        enc = kv.dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        idx = np.asarray(enc.indices, dtype=np.int64)
        accs = np.zeros((len(uniq), m), dtype=np.int8)
        for row, buf in enumerate(tab["regs"]):
            np.maximum(accs[idx[row]],
                       np.frombuffer(buf.as_py(), dtype=np.int8),
                       out=accs[idx[row]])
        return pa.table({key: pa.array(uniq, pa.string()),
                         "regs": pa.array([a.tobytes() for a in accs],
                                          pa.binary())})

    merged = hash_partition_map(ds, "part", _max_merge, n_parts,
                                map_fn=_fold,
                                map_chunk_rows=cfg.batch_size)
    import ray
    tabs = [t for t in ray.get(list(merged.to_arrow_refs())) if len(t)]
    return pa.concat_tables(tabs) if tabs else empty


def register_table(regs: np.ndarray) -> pa.Table:
    """Non-zero registers as a sorted integer table ``(bucket,
    register)`` — the hash-exact-comparable face of the sketch (the
    ESTIMATE sums 2^-reg over 2^p floats, whose value is summation-
    order-dependent past 53 mantissa bits, so only the registers are
    oracle-safe)."""
    nz = np.nonzero(regs)[0]
    return pa.table({"bucket": pa.array(nz.astype(np.int64), pa.int64()),
                     "register": pa.array(regs[nz].astype(np.int64),
                                          pa.int64())})


def approx_distinct_by(ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                       key: str, col: str = "text", p: int = 14,
                       tokens: bool = False, sep: str = " ") -> pa.Table:
    """Per-key HLL cardinality estimates ``(key, n_distinct_est,
    precision)``, via hll_registers_by."""
    tab = hll_registers_by(ds, cfg, key=key, col=col, p=p, tokens=tokens,
                           sep=sep)
    ests = [int(round(estimate(np.frombuffer(b.as_py(), dtype=np.int8))))
            for b in tab["regs"]]
    return pa.table({key: tab[key],
                     "n_distinct_est": pa.array(ests, pa.int64()),
                     "precision": pa.array([p] * len(tab), pa.int64())})
