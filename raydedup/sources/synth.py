"""Deterministic synthetic pages corpus with planted duplicate structure.

FIXTURES.md §1: ~5% exact-dup groups (2-5 byte-identical copies), ~10%
near-dup groups (edit-perturbed copies spanning Jaccard ≈ 0.6-0.99 on
k-shingles, straddling the LSH threshold both ways), the rest unique,
plus edge cases (empty text, < k tokens, repeated-single-token,
non-ASCII).  A companion truth table (url, doc_id, group_id, kind) is
derived from the generator for recall oracles.  Everything is seeded —
byte-identical corpora on every run.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .pages import _EPOCH_US, wrap_html

_LANGS = np.array(["en"] * 8 + ["de", "fr"])


def _zipf_vocab(rng: np.random.Generator, size: int = 5000) -> np.ndarray:
    return np.array([f"w{i}" for i in range(size)], dtype=object)


def _draw_doc(rng: np.random.Generator, vocab: np.ndarray) -> list[str]:
    n = int(rng.integers(50, 2000))
    # zipfian-ish ranks over the vocab
    ranks = rng.zipf(1.3, size=n) % len(vocab)
    return list(vocab[ranks])


def _perturb(rng: np.random.Generator, toks: list[str], vocab: np.ndarray,
             frac: float) -> list[str]:
    """Edit-perturb a token list: substitute / delete / insert ~frac of
    tokens — yields k-shingle Jaccard roughly in (1-2*k*frac, 1)."""
    out = list(toks)
    n_edits = max(1, int(len(out) * frac))
    for _ in range(n_edits):
        op = rng.integers(0, 3)
        pos = int(rng.integers(0, max(1, len(out))))
        word = str(vocab[int(rng.integers(0, len(vocab)))])
        if op == 0 and out:
            out[pos % len(out)] = word          # substitute
        elif op == 1 and len(out) > 1:
            del out[pos % len(out)]             # delete
        else:
            out.insert(pos % (len(out) + 1), word)  # insert
    return out


def synth_pages_ds(n: int, seed: int = 42, avg_tokens: int = 600,
                   parallelism: int | None = None):
    """Distributed deterministic pages corpus as a Ray Dataset — for
    benchmarking at sizes the driver-side generator can't reach.

    Every row is a pure function of (seed, doc_id), so generation is an
    embarrassingly-parallel ``map_batches`` with no cross-batch state:
    docs are grouped in quads; every 5th quad is a near-dup group (one
    base doc + 3 perturbed copies), the rest unique.
    """
    import ray.data as rd

    def _gen(batch):
        ids = batch["id"].astype(np.int64)
        texts = []
        for i in ids:
            quad, pos = divmod(int(i), 4)
            is_dup_group = quad % 5 == 0
            base_id = quad * 4 if is_dup_group else int(i)
            rng = np.random.default_rng((seed << 20) ^ base_id)
            n_tok = int(rng.integers(avg_tokens // 2, avg_tokens * 2))
            toks = rng.zipf(1.3, size=n_tok) % 5000
            if is_dup_group and pos > 0:
                prng = np.random.default_rng((seed << 21) ^ int(i))
                n_edit = max(1, int(n_tok * prng.uniform(0.005, 0.08)))
                idx = prng.integers(0, n_tok, size=n_edit)
                toks = toks.copy()
                toks[idx] = prng.zipf(1.3, size=n_edit) % 5000
            texts.append(" ".join(map(str, toks)))
        return {
            "doc_id": ids,
            "text": np.array(texts, dtype=object),
        }

    ds = rd.range(n, override_num_blocks=parallelism)
    return ds.map_batches(_gen, batch_format="numpy", batch_size=1024)


def synth_pages(n: int = 5000, seed: int = 42) -> tuple[pa.Table, pa.Table]:
    """→ (pages, truth).

    pages:  doc_id:int64, url:string, warc_ts:timestamp[us], html:binary,
            text:string, lang:string
    truth:  doc_id:int64, url:string, group_id:int64,
            kind:string ∈ {exact, near, unique, edge}
    """
    rng = np.random.default_rng(seed)
    vocab = _zipf_vocab(rng)

    texts: list[str] = []
    kinds: list[str] = []
    group_ids: list[int] = []
    gid = 0

    edge_texts = ["", "w1 w2", "w7 " * 99 + "w7", "é ü ß 你好 " * 30 + "末"]
    for t in edge_texts:
        texts.append(t)
        kinds.append("edge")
        group_ids.append(gid)
        gid += 1

    while len(texts) < n:
        r = rng.random()
        base = _draw_doc(rng, vocab)
        if r < 0.05 and len(texts) + 5 <= n:          # exact-dup group
            n_copies = int(rng.integers(2, 6))
            for _ in range(n_copies):
                texts.append(" ".join(base))
                kinds.append("exact")
                group_ids.append(gid)
        elif r < 0.15 and len(texts) + 5 <= n:        # near-dup group
            n_copies = int(rng.integers(2, 4))
            texts.append(" ".join(base))
            kinds.append("near")
            group_ids.append(gid)
            for _ in range(n_copies - 1):
                frac = float(rng.uniform(0.005, 0.10))
                texts.append(" ".join(_perturb(rng, base, vocab, frac)))
                kinds.append("near")
                group_ids.append(gid)
        else:                                          # unique
            texts.append(" ".join(base))
            kinds.append("unique")
            group_ids.append(gid)
        gid += 1

    texts = texts[:n]
    kinds = kinds[:n]
    group_ids = group_ids[:n]
    doc_id = np.arange(n, dtype=np.int64)
    urls = [f"https://site{i % 97}.example/p/{i}" for i in range(n)]
    langs = _LANGS[rng.integers(0, len(_LANGS), size=n)]

    text_arr = pa.array(texts, type=pa.string())
    pages = pa.table({
        "doc_id": pa.array(doc_id),
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": pa.array(_EPOCH_US + doc_id * 1_000_000, type=pa.timestamp("us")),
        "html": wrap_html(text_arr),
        "text": text_arr,
        "lang": pa.array(list(langs), type=pa.string()),
    })
    truth = pa.table({
        "doc_id": pa.array(doc_id),
        "url": pa.array(urls, type=pa.string()),
        "group_id": pa.array(group_ids, type=pa.int64()),
        "kind": pa.array(kinds, type=pa.string()),
    })
    return pages, truth
