"""Scale artifact for chunk_documents (stages/chunking.py): 2M docs /
~172M tokens with an EXACT planted truth, timed at 32 CPUs, host window
recorded.

Corpus (deterministic, generated in-cluster): doc id's token count is
class-determined by id % 4 -> {30, 64, 100, 150} tokens (below the
64-token chunk, exactly one chunk, two chunks, three chunks at stride
48).  Token 0 is "d{id}", tokens 1.. are the class-constant "w{j}", so
every output row's FULL chunk text is closed-form:

  chunk 0 of doc id  = "d{id} w1 ... w{min(64,n)-1}"
  chunk i>0          = "w{48i} ... w{min(48i+64,n)-1}"  (class constant)

Distributed assertions (zero violations required): every row's
chunk_id < nc(class), n_tokens matches the grammar, chunk_text is
byte-equal to the closed form; global row count == sum nc and global
sum(chunk_id) == sum nc*(nc-1)/2.

Usage: python tools/chunk_scale.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

CHUNK, STRIDE = 64, 48
CLASS_N = np.array([30, 64, 100, 150], dtype=np.int64)


def _nc(n: int) -> int:
    return 1 if n <= CHUNK else 1 + -(-(n - CHUNK) // STRIDE)


CLASS_NC = np.array([_nc(int(n)) for n in CLASS_N], dtype=np.int64)
# suffix after token 0 for chunk 0, per class: " w1 ... w{min(64,n)-1}"
_SUF0 = ["".join(f" w{j}" for j in range(1, min(CHUNK, int(n))))
         for n in CLASS_N]
# constant full text of chunk i>0, per (class, i) — object LUT indexed
# cls * 4 + chunk_id for a vectorized gather in the checker
_LATER_LUT = np.full(16, "", dtype=object)
for _c, _n in enumerate(CLASS_N):
    for _i in range(1, int(CLASS_NC[_c])):
        _LATER_LUT[_c * 4 + _i] = " ".join(
            f"w{_j}" for _j in range(_i * STRIDE,
                                     min(_i * STRIDE + CHUNK, int(_n))))


def _host_window():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = list(map(int, parts[1:]))
    return vals[7], sum(vals)


def _docs_ds(n_docs: int, n_blocks: int = 64):
    import ray.data as rd

    per = n_docs // n_blocks

    def _gen(batch: pa.Table) -> pa.Table:
        b = int(batch["b"][0].as_py())
        ids = np.arange(b * per, (b + 1) * per, dtype=np.int64)
        cls = ids % 4
        head = np.char.add("d", ids.astype("U12"))
        body = np.empty(len(ids), dtype=object)
        for c, n in enumerate(CLASS_N):
            suffix = "".join(f" w{j}" for j in range(1, int(n)))
            m = cls == c
            body[m] = np.char.add(head[m], suffix).astype(object)
        return pa.table({"doc_id": pa.array(ids),
                         "text": pa.array(body, pa.string())})

    base = rd.from_arrow(
        [pa.table({"b": pa.array([b], pa.int64())}) for b in range(n_blocks)])
    return base.map_batches(_gen, batch_format="pyarrow", batch_size=None)


def main():
    import ray
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from raydedup.stages.chunking import chunk_documents

    docs = _docs_ds(n_docs).materialize()
    per_class = np.array([(n_docs + 3 - c) // 4 for c in range(4)])
    n_tokens = int((per_class * CLASS_N).sum())
    want_rows = int((per_class * CLASS_NC).sum())
    want_chunkid_sum = int((per_class * (CLASS_NC * (CLASS_NC - 1) // 2)).sum())

    st0, tot0 = _host_window()
    t0 = time.perf_counter()
    out = chunk_documents(docs, chunk_tokens=CHUNK, stride=STRIDE) \
        .materialize()
    dt = time.perf_counter() - t0
    st1, tot1 = _host_window()

    def _check(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        ci = np.asarray(t["chunk_id"], dtype=np.int64)
        nt = np.asarray(t["n_tokens"], dtype=np.int64)
        txt = t["chunk_text"].to_numpy(zero_copy_only=False)
        cls = ids % 4
        n = CLASS_N[cls]
        s = ci * STRIDE
        bad = (ci >= CLASS_NC[cls]) | (nt != np.minimum(s + CHUNK, n) - s)
        first = ci == 0
        want0 = np.char.add(
            np.char.add("d", ids[first].astype("U12")),
            np.array(_SUF0)[cls[first]]).astype(object)
        bad[first] |= txt[first] != want0
        later = ~first
        if later.any():
            want_l = _LATER_LUT[cls[later] * 4 + ci[later]]
            bad[later] |= txt[later] != want_l
        return pa.table({
            "bad": pa.array([int(bad.sum())], pa.int64()),
            "rows": pa.array([len(ids)], pa.int64()),
            "cid_sum": pa.array([int(ci.sum())], pa.int64())})

    chk = out.map_batches(_check, batch_format="pyarrow").to_pandas()
    n_bad, n_rows = int(chk["bad"].sum()), int(chk["rows"].sum())
    cid_sum = int(chk["cid_sum"].sum())

    rec = {
        "probe": "chunk_documents_scale",
        "n_docs": n_docs,
        "n_tokens": n_tokens,
        "chunk_tokens": CHUNK,
        "stride": STRIDE,
        "sec": round(dt, 2),
        "docs_per_sec": round(n_docs / dt, 0),
        "tokens_per_sec": round(n_tokens / dt, 0),
        "rows_out": n_rows,
        "planted_violations": n_bad,
        "row_count_ok": n_rows == want_rows,
        "chunk_id_sum_ok": cid_sum == want_chunkid_sum,
        "host_window": {
            "steal_pct": round(100.0 * (st1 - st0) / max(tot1 - tot0, 1), 2)},
        "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32")),
    }
    print(json.dumps(rec))
    assert n_rows == want_rows, (n_rows, want_rows)
    assert cid_sum == want_chunkid_sum
    assert n_bad == 0, f"{n_bad} planted-truth violations"
    ray.shutdown()


if __name__ == "__main__":
    main()
