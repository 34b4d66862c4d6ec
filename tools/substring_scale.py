"""Substring/trim-tier scale probe (round-5 verdict item #5): run
``substring_dedup`` standalone at >=2M docs with an EXACT planted truth
and record per-stage walls + host window.

Planted corpus (deterministic, generated in-cluster):
  - every doc: 80 uniform-random tokens from a 1M vocab ("w<id>") --
    50-token windows of these are unique w.h.p. (collision needs 50
    identical uniform draws in a row);
  - 5% of docs (doc_id % 20 == 7): a fixed 60-token boilerplate
    paragraph ("b0".."b59") appended -> every occurrence except the
    globally-first (smallest doc_id) must lose exactly 60 tokens.  This
    is ALSO the skew case: each of the 11 boilerplate window hashes
    lands ~n_docs/20 occurrences in ONE hash group of the exchange.
  - 1% of docs (doc_id % 100 == 3, disjoint from the 5%): the doc's
    first 55 tokens repeated at the end -> the second occurrence (a
    self-repeat) must lose exactly 55 tokens.

Expected exactly:  docs_cut = n_docs/20 - 1 + n_docs/100
                   tokens_cut = 60*(n_docs/20 - 1) + 55*(n_docs/100)

Usage: python tools/substring_scale.py [n_docs]   (default 2_000_000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa


def _host_window():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = list(map(int, parts[1:]))
    return vals[7], sum(vals)


BP = " ".join(f"b{i}" for i in range(60))
BASE_TOK, REPEAT_TOK = 80, 55


def _docs_ds(n_docs: int, n_blocks: int = 64):
    import pyarrow.compute as pc
    import ray.data as rd

    per = -(-n_docs // n_blocks)  # ceil: last block takes the remainder

    def _gen(batch: pa.Table) -> pa.Table:
        b = int(batch["b"][0].as_py())
        rng = np.random.RandomState(7100 + b)
        ids = np.arange(b * per, min((b + 1) * per, n_docs), dtype=np.int64)
        toks = rng.randint(0, 1_000_000, size=(len(ids), BASE_TOK - 1))
        cols = [pc.binary_join_element_wise(
            pa.scalar("w"), pa.array(toks[:, j].astype(str)), "")
            for j in range(BASE_TOK - 1)]
        # last base token is per-doc UNIQUE ("u<id>") so the junction
        # window (t79, b0..b48) of two boilerplate docs can never match
        # (observed: ~1 in 1e6 boiler pairs share t79 -> +1-token spans)
        cols.append(pc.binary_join_element_wise(
            pa.scalar("u"), pa.array(ids.astype(str)), ""))
        text = cols[0]
        prefix55 = None
        for j, c in enumerate(cols[1:], start=1):
            text = pc.binary_join_element_wise(text, c, " ")
            if j == REPEAT_TOK - 1:
                prefix55 = text
        boiler = pa.array(ids % 20 == 7)
        selfrep = pa.array(ids % 100 == 3)
        with_bp = pc.binary_join_element_wise(text, pa.scalar(BP), " ")
        with_rep = pc.binary_join_element_wise(text, prefix55, " ")
        out = pc.if_else(boiler, with_bp, pc.if_else(selfrep, with_rep, text))
        return pa.table({"doc_id": pa.array(ids), "text": out})

    base = rd.from_arrow(
        [pa.table({"b": pa.array([b], pa.int64())}) for b in range(n_blocks)])
    return base.map_batches(_gen, batch_format="pyarrow", batch_size=None)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    import ray
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from raydedup.config import DEFAULT_CONFIG
    from raydedup.stages.substring import find_duplicate_spans, substring_dedup

    cfg = DEFAULT_CONFIG.with_(num_partitions=32)
    st0, tot0 = _host_window()

    t0 = time.perf_counter()
    docs = _docs_ds(n_docs).materialize()
    gen_sec = time.perf_counter() - t0

    # stage 1 wall: window emit -> hash exchange -> span merge
    t0 = time.perf_counter()
    spans = find_duplicate_spans(docs, cfg, min_tokens=50).materialize()
    spans_sec = time.perf_counter() - t0
    import pyarrow.compute as pc
    sp = spans.to_pandas()
    span_docs = int(sp["doc_id"].nunique())
    span_tokens = int((sp["end_tok"] - sp["start_tok"]).sum())

    # end-to-end wall (re-runs span finding + the co-partitioned cut)
    t0 = time.perf_counter()
    out = substring_dedup(docs, cfg, min_tokens=50).materialize()
    e2e_sec = time.perf_counter() - t0
    agg = out.map_batches(
        lambda t: pa.table({
            "docs_cut": pa.array(
                [int(pc.sum(pc.greater(t["n_cut_tokens"], 0)).as_py() or 0)]),
            "tokens_cut": pa.array(
                [int(pc.sum(t["n_cut_tokens"]).as_py() or 0)]),
            "rows": pa.array([len(t)])}),
        batch_format="pyarrow").to_pandas().sum()

    n_boiler = len(range(7, n_docs, 20))
    n_selfrep = len(range(3, n_docs, 100))
    exp_docs = n_boiler - 1 + n_selfrep
    exp_tokens = 60 * (n_boiler - 1) + REPEAT_TOK * n_selfrep
    st1, tot1 = _host_window()
    total_tokens = n_docs * BASE_TOK + 60 * n_boiler + REPEAT_TOK * n_selfrep
    res = {
        "n_docs": n_docs, "total_tokens": total_tokens,
        "gen_sec": round(gen_sec, 2),
        "spans_sec": round(spans_sec, 2),
        "cut_sec": round(e2e_sec - spans_sec, 2),
        "e2e_sec": round(e2e_sec, 2),
        "tokens_per_sec": round(total_tokens / e2e_sec, 0),
        "span_docs": span_docs, "span_tokens": span_tokens,
        "docs_cut": int(agg["docs_cut"]), "tokens_cut": int(agg["tokens_cut"]),
        "rows_out": int(agg["rows"]),
        "expected": {"docs_cut": exp_docs, "tokens_cut": exp_tokens},
        "exact_match": bool(int(agg["docs_cut"]) == exp_docs
                            and int(agg["tokens_cut"]) == exp_tokens
                            and span_docs == exp_docs
                            and span_tokens == exp_tokens
                            and int(agg["rows"]) == n_docs),
        "host_window": {
            "steal_pct": round(100.0 * (st1 - st0) / max(tot1 - tot0, 1), 2),
            "loadavg": os.getloadavg()[0]},
    }
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
