"""Global top-k vocabulary over a text corpus — the canonical combiner
pattern (word count) that a crawl-scale pipeline runs to build token
stats / frequency cutoffs.

Scale shape: the map side splits each batch into tokens with Arrow's C++
``split_pattern`` kernel and PRE-AGGREGATES counts per batch with
Arrow's hash group-by, so what enters the exchange is one (token,
partial_count) row per distinct token per map chunk — never the raw
token stream.  Tokens are routed to their partition by a byte-exact FNV
hash of the token bytes (functions/hashing.hash_utf8_array, no Python
string objects), each partition sums its partials and trims to its own
top-k (safe: a token lives in exactly one partition, so per-partition
counts are already global), and the final k-of-(P·k) merge is a
Dataset sort+limit over P·k rows.

Token definition is the single-space split shared with the shingle
oracle SQL (``string_split(text, ' ')``), empty tokens dropped —
byte-identical between pyarrow and DuckDB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions.hashing import hash_utf8_array
from ..functions.shuffle import hash_partition_map

# Small broadcast objects this module ships into map chunks (DF table
# for doc_keywords, heavy-hitter candidate set, PMI word list) go
# through the shared worker-local deserialized-value cache.
from ..functions.broadcast import bcast_get as _bcast_get


def top_k_vocab(docs_ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                text_col: str = "text", k: int = 100, sep: str = " "):
    """→ Dataset(token, n) of the k most frequent tokens, ordered by
    (n desc, token asc) — the tie-break makes the cut deterministic."""
    n_parts = cfg.resolved_partitions()

    def _partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(
            t[text_col].combine_chunks(), sep))
        toks = toks.filter(pc.not_equal(toks, ""))
        part = pa.table({"token": toks}).group_by("token") \
            .aggregate([("token", "count")])
        tok_col = part["token"].combine_chunks()
        pid = (hash_utf8_array(tok_col) % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "token": tok_col,
            "n": part["token_count"].cast(pa.int64()),
            "part": pa.array(pid, pa.int64()),
        })

    empty = pa.table({"token": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})

    def _topk(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0:
            return empty
        agg = tab.group_by("token").aggregate([("n", "sum")])
        total = pa.table({"token": agg["token"],
                          "n": agg["n_sum"].cast(pa.int64())})
        return total.sort_by([("n", "descending"), ("token", "ascending")]) \
            .slice(0, k)

    parts = hash_partition_map(
        docs_ds, "part", _topk, n_parts,
        map_fn=_partial, map_chunk_rows=cfg.batch_size)
    return parts.sort(["n", "token"], descending=[True, False]).limit(k)


def top_k_ngrams(docs_ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                 text_col: str = "text", k: int = 100, n: int = 2,
                 sep: str = " "):
    """→ Dataset(ngram, n) of the k most frequent word ``n``-grams
    (space-joined adjacent tokens, never crossing document bounds),
    ordered (count desc, ngram asc).  Same combiner-exchange shape as
    ``top_k_vocab``: what travels is one (ngram, partial) row per
    distinct n-gram per map chunk.  Tokens keep empties so the
    SQL-list oracle (``ws[i] || ' ' || ws[i+1]``) agrees exactly."""
    if n < 2:
        raise ValueError("top_k_ngrams needs n >= 2; use top_k_vocab")
    n_parts = cfg.resolved_partitions()

    def _partial(t: pa.Table) -> pa.Table:
        from ..functions.text import word_ngram_strings
        grams, _ = word_ngram_strings(t[text_col], n, sep)
        part = pa.table({"token": grams}).group_by("token") \
            .aggregate([("token", "count")])
        tok_col = part["token"].combine_chunks()
        pid = (hash_utf8_array(tok_col) % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "token": tok_col,
            "n": part["token_count"].cast(pa.int64()),
            "part": pa.array(pid, pa.int64()),
        })

    empty = pa.table({"token": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})

    def _topk(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0:
            return empty
        agg = tab.group_by("token").aggregate([("n", "sum")])
        total = pa.table({"token": agg["token"],
                          "n": agg["n_sum"].cast(pa.int64())})
        return total.sort_by([("n", "descending"), ("token", "ascending")]) \
            .slice(0, k)

    parts = hash_partition_map(
        docs_ds, "part", _topk, n_parts,
        map_fn=_partial, map_chunk_rows=cfg.batch_size)
    out = parts.sort(["n", "token"], descending=[True, False]).limit(k)
    return out.map_batches(
        lambda t: t.rename_columns(
            ["ngram" if c == "token" else c for c in t.column_names]),
        batch_format="pyarrow")


def doc_keywords(docs_ds, *, id_col: str = "doc_id",
                 text_col: str = "text", k: int = 3, sep: str = " "):
    """→ Dataset(id, token, tf, rank): each document's top-``k`` tokens
    by term frequency (tf desc, token asc tie-break — binary collation,
    matching DuckDB's default ORDER BY).  Entirely doc-local: one
    streaming map, per-batch Arrow hash group-by + one lexsort, ZERO
    shuffle — the keyword surface for doc routing / topic bucketing."""

    def _kw(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[text_col], "").combine_chunks()
        toks = pc.split_pattern(texts, sep)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        doc = np.repeat(np.arange(len(batch), dtype=np.int64),
                        np.asarray(pc.list_value_length(toks),
                                   dtype=np.int64))
        if not len(flat):
            return pa.table({id_col: pa.array([], pa.int64()),
                             "token": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64())})
        # Arrow-native ordering: binary collation == DuckDB's default
        # ORDER BY, and no Python/unicode-dtype round-trip of the tokens
        tf_tab = pa.table({"d": pa.array(doc, pa.int64()),
                           "token": flat}) \
            .group_by(["d", "token"]).aggregate([("token", "count")]) \
            .sort_by([("d", "ascending"), ("token_count", "descending"),
                      ("token", "ascending")])
        do = np.asarray(tf_tab["d"], dtype=np.int64)
        first = np.ones(len(do), dtype=bool)
        first[1:] = do[1:] != do[:-1]
        starts = np.flatnonzero(first)
        lens = np.diff(np.append(starts, len(do)))
        rank = (np.arange(len(do), dtype=np.int64)
                - np.repeat(starts, lens) + 1)
        mask = rank <= k
        ids = np.asarray(batch[id_col], dtype=np.int64)
        sel = pa.array(np.flatnonzero(mask), pa.int64())
        return pa.table({
            id_col: pa.array(ids[do[mask]], pa.int64()),
            "token": tf_tab["token"].combine_chunks().take(sel),
            "tf": tf_tab["token_count"].cast(pa.int64())
                .combine_chunks().take(sel),
            "rank": pa.array(rank[mask], pa.int64()),
        })

    return docs_ds.map_batches(_kw, batch_format="pyarrow",
                               zero_copy_batch=True)


def tfidf_keywords(docs_ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                   id_col: str = "doc_id", text_col: str = "text",
                   k: int = 3, min_df: int = 1, sep: str = " "):
    """→ Dataset(id, token, tf, df, rank): each document's top-``k``
    tokens by tf-idf with the LOG-FREE rational idf — score ∝ tf/df.
    Dropping the log keeps the ranking EXACTLY reproducible: IEEE-754
    division is correctly rounded, so numpy and the DuckDB oracle
    (``tf * 1.0 / df``) produce bit-identical scores, where ``ln`` is
    libm-dependent and can flip near-ties.  Order inside a doc is
    (tf/df desc, token asc); tokens with df < ``min_df`` are excluded
    from ranking.

    Physical plan: ONE combiner exchange builds the document-frequency
    table (token_doc_freq), the df table ships once via ``ray.put``
    (vocabulary-sized — ``min_df`` prunes the hapax tail that dominates
    a web vocabulary; for an unbounded vocabulary the alternative is a
    double exchange: route (doc, token, tf) by token, join df, route
    back by doc), then one zero-shuffle streaming map computes
    doc-local tf, joins df with an exact ``pc.index_in``, and ranks."""
    import ray

    df_tab = pa.concat_tables(
        [t for t in ray.get(list(
            token_doc_freq(docs_ds, cfg, id_col=id_col, text_col=text_col,
                           min_df=min_df, sep=sep).to_arrow_refs()))
         if len(t)] or [pa.table({"token": pa.array([], pa.string()),
                                  "df": pa.array([], pa.int64())})])
    df_ref = ray.put({"tokens": df_tab["token"].combine_chunks(),
                      "df": np.asarray(df_tab["df"], dtype=np.int64)})

    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "token": pa.array([], pa.string()),
                      "tf": pa.array([], pa.int64()),
                      "df": pa.array([], pa.int64()),
                      "rank": pa.array([], pa.int64())})

    def _kw(batch: pa.Table) -> pa.Table:
        pk = _bcast_get(df_ref)
        texts = pc.fill_null(batch[text_col], "").combine_chunks()
        toks = pc.split_pattern(texts, sep)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        doc = np.repeat(np.arange(len(batch), dtype=np.int64),
                        np.asarray(pc.list_value_length(toks),
                                   dtype=np.int64))
        if not len(flat):
            return empty
        tf_tab = pa.table({"d": pa.array(doc, pa.int64()), "token": flat}) \
            .filter(pc.not_equal(flat, "")) \
            .group_by(["d", "token"]).aggregate([("token", "count")])
        idx = pc.index_in(tf_tab["token"].combine_chunks(),
                          value_set=pk["tokens"])
        known = pc.is_valid(idx)
        tf_tab = tf_tab.append_column("df_idx", idx).filter(known)
        if not len(tf_tab):
            return empty
        tf = np.asarray(tf_tab["token_count"], dtype=np.int64)
        dfv = pk["df"][np.asarray(tf_tab["df_idx"], dtype=np.int64)]
        scored = pa.table({
            "d": tf_tab["d"],
            "token": tf_tab["token"],
            "tf": pa.array(tf, pa.int64()),
            "df": pa.array(dfv, pa.int64()),
            "score": pa.array(tf.astype(np.float64) / dfv, pa.float64()),
        }).sort_by([("d", "ascending"), ("score", "descending"),
                    ("token", "ascending")])
        do = np.asarray(scored["d"], dtype=np.int64)
        first = np.ones(len(do), dtype=bool)
        first[1:] = do[1:] != do[:-1]
        starts = np.flatnonzero(first)
        lens = np.diff(np.append(starts, len(do)))
        rank = (np.arange(len(do), dtype=np.int64)
                - np.repeat(starts, lens) + 1)
        mask = rank <= k
        ids = np.asarray(batch[id_col], dtype=np.int64)
        sel = pa.array(np.flatnonzero(mask), pa.int64())
        return pa.table({
            id_col: pa.array(ids[do[mask]], pa.int64()),
            "token": scored["token"].combine_chunks().take(sel),
            "tf": scored["tf"].combine_chunks().take(sel),
            "df": scored["df"].combine_chunks().take(sel),
            "rank": pa.array(rank[mask], pa.int64()),
        })

    return docs_ds.map_batches(_kw, batch_format="pyarrow",
                               zero_copy_batch=True)


def token_doc_freq(docs_ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                   id_col: str = "doc_id", text_col: str = "text",
                   min_df: int = 1, sep: str = " "):
    """→ Dataset(token, df): number of DISTINCT docs containing each
    token (the document-frequency table behind idf weighting / stopword
    discovery), tokens with df >= min_df.

    Same combiner shape as top_k_vocab with one extra step: the map side
    uniques (doc, token) pairs per batch BEFORE counting — a doc is one
    row, so per-batch uniquing is exact, and what ships is one (token,
    partial_df) row per distinct token per map chunk."""
    n_parts = cfg.resolved_partitions()

    def _partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t[text_col].combine_chunks(), sep)
        flat = pc.list_flatten(toks)
        doc = np.repeat(np.arange(len(t), dtype=np.int64),
                        np.asarray(pc.list_value_length(toks),
                                   dtype=np.int64))
        keep = pc.not_equal(flat, "")
        pairs = pa.table({"d": pa.array(doc, pa.int64()), "token": flat}) \
            .filter(keep)
        uniq = pairs.group_by(["d", "token"]).aggregate([])
        part = uniq.group_by("token").aggregate([("token", "count")])
        tok_col = part["token"].combine_chunks()
        pid = (hash_utf8_array(tok_col) % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "token": tok_col,
            "df": part["token_count"].cast(pa.int64()),
            "part": pa.array(pid, pa.int64()),
        })

    empty = pa.table({"token": pa.array([], pa.string()),
                      "df": pa.array([], pa.int64())})

    def _sum(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0:
            return empty
        agg = tab.group_by("token").aggregate([("df", "sum")])
        out = pa.table({"token": agg["token"],
                        "df": agg["df_sum"].cast(pa.int64())})
        if min_df > 1:
            out = out.filter(pc.greater_equal(out["df"], min_df))
        return out

    return hash_partition_map(
        docs_ds, "part", _sum, n_parts,
        map_fn=_partial, map_chunk_rows=cfg.batch_size)


def common_token_stats(docs_ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                       id_col: str = "doc_id", text_col: str = "text",
                       k: int = 50, sep: str = " "):
    """→ Dataset(id, n_common:int64, n_tokens:int64) — per doc, how
    many of its whitespace tokens fall in the corpus's top-``k``
    vocabulary (count desc, token asc tie-break), plus the total token
    count.  The ratio is the classic common-word/stopword quality
    signal (CCNet-style LM-free proxy: gibberish and boilerplate-free
    prose sit at opposite ends); kept as two exact integers so
    downstream thresholds — and the SQL oracle — never touch floats.

    Physical plan: one combiner exchange builds the top-k table
    (top_k_vocab), the k tokens broadcast by closure, then one
    streaming map does an exact ``pc.is_in`` over the flattened token
    stream with a cumsum-at-offsets per-doc reduction.  Two passes over
    the corpus total; nothing corpus-sized moves."""
    import ray

    vocab_tab = pa.concat_tables(
        [t for t in ray.get(list(
            top_k_vocab(docs_ds, cfg, text_col=text_col, k=k, sep=sep)
            .to_arrow_refs())) if len(t)])
    vset = vocab_tab["token"].combine_chunks() if len(vocab_tab) else \
        pa.array([], pa.string())

    def _stats(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.fill_null(
            t[text_col].combine_chunks(), ""), sep)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        common = pc.fill_null(pc.is_in(flat, value_set=vset), False) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        offs = np.asarray(toks.offsets, dtype=np.int64)
        offs = offs - offs[0]
        csum = np.concatenate([[0], np.cumsum(common)])
        n_common = csum[offs[1:]] - csum[offs[:-1]]
        n_tokens = (offs[1:] - offs[:-1])
        return pa.table({
            id_col: t[id_col],
            "n_common": pa.array(n_common, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
        })

    return docs_ds.map_batches(_stats, batch_format="pyarrow",
                               zero_copy_batch=True)


def heavy_hitters(docs_ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                  text_col: str = "text", sep: str = " ",
                  support_num: int = 1, support_den: int = 1000,
                  summary_size: int | None = None, with_total: bool = False,
                  counters=None):
    """EXACT heavy hitters: every token whose count ≥ ⌈support·N⌉
    (N = total non-empty tokens), **without ever shuffling the full
    distinct-token space** — the at-scale alternative to top_k_vocab.

    top_k_vocab's exchange moves one partial row per distinct token per
    map chunk; on a web corpus with ~10⁹ distinct tokens that is the
    dominant shuffle.  Here each map chunk first compresses its counts
    to a Misra-Gries summary of ``summary_size`` entries (default
    ⌈2/support⌉), so the exchange moves AT MOST summary_size rows per
    chunk regardless of vocabulary size.  MG summaries merge with the
    additive guarantee (Agarwal et al., "Mergeable Summaries", PODS'12):
    global undercount ≤ N/(summary_size+1), and MG never overcounts, so
    filtering merged lower bounds at (threshold − slack) provably keeps
    every true heavy hitter and at most ~2/support candidates.  A second
    streaming pass exact-counts ONLY the candidate set (broadcast
    ``pc.is_in`` filter), making the final output exact — and therefore
    SQL-oracle-comparable (HAVING count ≥ ⌈support·N⌉), unlike a sketch
    that stops at approximate counts.

    Thresholds use pure integer arithmetic mirrored by the oracle:
    ``thresh = (support_num·N + support_den − 1) // support_den``.

    Global N is learned without a separate pass: every map chunk routes
    one sentinel row (token='', its chunk token total) to EVERY
    partition, so each reduce task knows N exactly and applies the
    threshold locally — no driver round-trip inside either pass.

    ``with_total=True`` additionally emits one (token='', n=N) row per
    non-empty partition (callers like doc_surprisal need N for
    probabilities; dedupe by max, '' can never be a real token).
    """
    import ray

    n_parts = cfg.resolved_partitions()
    min_summary = (2 * support_den + support_num - 1) // support_num
    if summary_size is None:
        summary_size = max(64, min_summary)
    elif summary_size < min_summary:
        raise ValueError(
            f"heavy_hitters: summary_size={summary_size} breaks the "
            f"no-false-negative guarantee for support "
            f"{support_num}/{support_den}; need >= {min_summary}")

    def _tok_counts(t: pa.Table):
        toks = pc.list_flatten(pc.split_pattern(
            pc.fill_null(t[text_col].combine_chunks(), ""), sep))
        toks = toks.filter(pc.not_equal(toks, ""))
        total = len(toks)
        part = pa.table({"token": toks}).group_by("token") \
            .aggregate([("token", "count")])
        return (part["token"].combine_chunks(),
                part["token_count"].to_numpy().astype(np.int64), total)

    def _sentinels(total: int) -> pa.Table:
        return pa.table({
            "token": pa.array([""] * n_parts, pa.string()),
            "n": pa.array(np.full(n_parts, total, np.int64)),
            "part": pa.array(np.arange(n_parts, dtype=np.int64)),
        })

    def _mg_partial(t: pa.Table) -> pa.Table:
        tok, cnt, total = _tok_counts(t)
        if len(cnt) > summary_size:
            # subtract-and-drop compress: decrement everything by the
            # (summary_size+1)-th largest count, keep positive residuals
            d = np.partition(cnt, len(cnt) - summary_size - 1)[
                len(cnt) - summary_size - 1]
            keep = cnt > d
            tok = tok.filter(pa.array(keep))
            cnt = cnt[keep] - d
        pid = (hash_utf8_array(tok) % np.uint64(n_parts)).astype(np.int64)
        rows = pa.table({"token": tok, "n": pa.array(cnt, pa.int64()),
                         "part": pa.array(pid, pa.int64())})
        return pa.concat_tables([rows, _sentinels(total)])

    empty = pa.table({"token": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})

    def _thresh(n_total: int) -> int:
        return (support_num * n_total + support_den - 1) // support_den

    def _cand(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0:
            return empty
        agg = tab.group_by("token").aggregate([("n", "sum")])
        tok = agg["token"].combine_chunks()
        n = agg["n_sum"].to_numpy().astype(np.int64)
        is_sent = pc.equal(tok, "").to_numpy(zero_copy_only=False)
        n_total = int(n[is_sent].sum())
        slack = n_total // (summary_size + 1)
        keep = (~is_sent) & (n >= max(_thresh(n_total) - slack, 1))
        return pa.table({"token": tok.filter(pa.array(keep)),
                         "n": pa.array(n[keep], pa.int64())})

    cand_ds = hash_partition_map(docs_ds, "part", _cand, n_parts,
                                 map_fn=_mg_partial,
                                 map_chunk_rows=cfg.batch_size)
    # provably ≤ ~2/support rows — a driver-side collect is safe
    cand_tabs = [t for t in ray.get(list(cand_ds.to_arrow_refs())) if len(t)]
    cand_tok = pa.concat_tables(cand_tabs)["token"].combine_chunks() \
        if cand_tabs else pa.array([], pa.string())
    if counters is not None:
        counters.add.remote({"heavy_hitter_candidates": len(cand_tok)})
    cand_ref = ray.put(cand_tok)

    def _exact_partial(t: pa.Table) -> pa.Table:
        cand = _bcast_get(cand_ref)
        tok, cnt, total = _tok_counts(t)
        keep = pc.fill_null(pc.is_in(tok, value_set=cand), False) \
            .to_numpy(zero_copy_only=False)
        tok, cnt = tok.filter(pa.array(keep)), cnt[keep]
        pid = (hash_utf8_array(tok) % np.uint64(n_parts)).astype(np.int64)
        rows = pa.table({"token": tok, "n": pa.array(cnt, pa.int64()),
                         "part": pa.array(pid, pa.int64())})
        return pa.concat_tables([rows, _sentinels(total)])

    def _final(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0:
            return empty
        agg = tab.group_by("token").aggregate([("n", "sum")])
        tok = agg["token"].combine_chunks()
        n = agg["n_sum"].to_numpy().astype(np.int64)
        is_sent = pc.equal(tok, "").to_numpy(zero_copy_only=False)
        n_total = int(n[is_sent].sum())
        keep = (~is_sent) & (n >= _thresh(n_total))
        out = pa.table({"token": tok.filter(pa.array(keep)),
                        "n": pa.array(n[keep], pa.int64())})
        if with_total:
            out = pa.concat_tables([out, pa.table({
                "token": pa.array([""], pa.string()),
                "n": pa.array([n_total], pa.int64())})])
        return out

    return hash_partition_map(docs_ds, "part", _final, n_parts,
                              map_fn=_exact_partial,
                              map_chunk_rows=cfg.batch_size)


def inverted_index(docs_ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                   text_col: str = "text", id_col: str = "doc_id",
                   sep: str = " ", max_df: int | None = None,
                   counters=None):
    """token → sorted posting list: the search-side artifact of a text
    corpus (→ Dataset(token, postings:list<int64>, df:int64)).

    Scale shape: each map chunk emits DISTINCT (token, doc_id) pairs
    (per-doc dedup via one lexsort — a doc mentioning 'the' 50× sends
    one row), the single hash exchange on token co-locates a token's
    full posting set, and the reduce assembles sorted ListArrays
    directly from offsets (no Python lists).  ``max_df`` drops
    boilerplate tokens whose document frequency exceeds the cap —
    applied exactly (the partition sees the token's complete set), it
    bounds both output row width and the skew any mega-token would
    otherwise concentrate in one partition.  Consume with
    ``.write_parquet(path)`` for the persisted index.
    """
    n_parts = cfg.resolved_partitions()

    def _pairs(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.fill_null(
            t[text_col].combine_chunks(), ""), sep)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        offs = np.asarray(toks.offsets, dtype=np.int64)
        offs = offs - offs[0]
        ids = np.asarray(t[id_col], dtype=np.int64)
        doc_of = np.repeat(ids, np.diff(offs))
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat, doc_of = flat.filter(pa.array(keep)), doc_of[keep]
        # per-chunk distinct (token, doc_id): group by token hash+doc
        th = hash_utf8_array(flat).view(np.int64)
        order = np.lexsort((doc_of, th))
        th_s, doc_s = th[order], doc_of[order]
        first = np.empty(len(th_s), dtype=bool)
        if len(th_s):
            first[0] = True
            first[1:] = (th_s[1:] != th_s[:-1]) | (doc_s[1:] != doc_s[:-1])
        sel = np.sort(order[first])
        flat = flat.take(pa.array(sel, pa.int64()))
        doc_of = doc_of[sel]
        pid = (hash_utf8_array(flat) % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"token": flat,
                         "doc_id": pa.array(doc_of, pa.int64()),
                         "part": pa.array(pid, pa.int64())})

    empty = pa.table({
        "token": pa.array([], pa.string()),
        "postings": pa.array([], pa.large_list(pa.int64())),
        "df": pa.array([], pa.int64())})

    def _assemble(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0:
            return empty
        tok = tab["token"].combine_chunks()
        doc = np.asarray(tab["doc_id"], dtype=np.int64)
        # sort rows by (token, doc_id); token order via its dictionary
        # encoding to avoid string comparisons in numpy
        enc = pc.dictionary_encode(tok)
        codes = np.asarray(enc.indices, dtype=np.int64)
        # dictionary order is first-appearance; map to lexicographic
        dic = enc.dictionary
        rank = np.empty(len(dic), dtype=np.int64)
        rank[np.asarray(pc.sort_indices(dic), dtype=np.int64)] = \
            np.arange(len(dic))
        key = rank[codes]
        order = np.lexsort((doc, key))
        key_s, doc_s = key[order], doc[order]
        first = np.empty(len(key_s), dtype=bool)
        first[0] = True
        first[1:] = (key_s[1:] != key_s[:-1]) | (doc_s[1:] != doc_s[:-1])
        key_s, doc_s = key_s[first], doc_s[first]
        starts = np.flatnonzero(np.concatenate(
            [[True], key_s[1:] != key_s[:-1]]))
        offsets = np.concatenate([starts, [len(key_s)]])
        df = np.diff(offsets)
        # int64 offsets: a reduce partition can exceed 2^31 pairs at
        # the web scale this module targets
        postings = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), pa.array(doc_s, pa.int64()))
        # argsort(rank) maps lexicographic rank -> dictionary index, so
        # row i's token is the one with lexicographic rank key_s[starts][i]
        out_tok = dic.take(pa.array(
            np.argsort(rank, kind="stable")[key_s[starts]], pa.int64()))
        out = pa.table({"token": out_tok, "postings": postings,
                        "df": pa.array(df, pa.int64())})
        if max_df is not None:
            out = out.filter(pc.less_equal(out["df"], max_df))
        return out

    return hash_partition_map(docs_ds, "part", _assemble, n_parts,
                              map_fn=_pairs, map_chunk_rows=cfg.batch_size)


def bigram_pmi(docs_ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
               text_col: str = "text", k: int = 30, sep: str = " ",
               counters=None) -> pa.Table:
    """Pointwise mutual information for the top-``k`` bigrams:
    pmi(x,y) = ln( p(xy) / (p(x)·p(y)) ) — the collocation measure
    ("new york" scores high, "of the" scores low) built on counts the
    engine already knows how to move cheaply.

    Two passes, neither shuffling the full vocabulary: top_k_ngrams
    finds the k bigrams (combiner exchange), then ONE streaming pass
    counts just the ≤2k member words (broadcast ``pc.is_in`` filter)
    plus the unigram/bigram totals, reduced through a tiny exchange.
    The PMI arithmetic runs driver-side over ≤k rows and mirrors the
    SQL oracle expression term-for-term (each division/multiply is
    IEEE-exact; ln's sub-ulp libm difference is absorbed by the
    1e6-scaled rounding, the repo's float-compare convention).

    Token/bigram definitions mirror SQL ``string_split`` exactly:
    empties kept, bigrams never cross documents, every doc contributes
    len(tokens)−1 bigrams (≥0).  → pa.Table(x, y, n_xy, pmi_e6).
    """
    import ray

    n_parts = cfg.resolved_partitions()

    top = pa.concat_tables([t for t in ray.get(list(
        top_k_ngrams(docs_ds, cfg, text_col=text_col, k=k, n=2,
                     sep=sep).to_arrow_refs())) if len(t)])
    empty_out = pa.table({"x": pa.array([], pa.string()),
                          "y": pa.array([], pa.string()),
                          "n_xy": pa.array([], pa.int64()),
                          "pmi_e6": pa.array([], pa.int64())})
    if len(top) == 0:
        return empty_out
    grams = top["ngram"].to_pylist()
    n_xy = np.asarray(top["n"], dtype=np.int64)
    xs, ys = zip(*(g.split(sep) for g in grams))   # ≤k driver-side rows
    words = pa.array(sorted({*xs, *ys}), pa.string())
    words_ref = ray.put(words)

    def _partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.fill_null(
            t[text_col].combine_chunks(), ""), sep)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()          # empties KEPT (mirrors unnest)
        lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        n_uni, n_bi = int(lens.sum()), int((lens - 1).sum())
        w = _bcast_get(words_ref)
        keep = pc.fill_null(pc.is_in(flat, value_set=w), False)
        sel = flat.filter(keep)
        agg = pa.table({"w": sel}).group_by("w") \
            .aggregate([("w", "count")])
        wc = agg["w"].combine_chunks()
        pid = (hash_utf8_array(wc) % np.uint64(n_parts)).astype(np.int64)
        rows = pa.table({
            "w": wc, "kind": pa.array(np.zeros(len(wc), np.int8)),
            "n": agg["w_count"].cast(pa.int64()),
            "part": pa.array(pid, pa.int64())})
        sent = pa.table({
            "w": pa.array([""] * (2 * n_parts), pa.string()),
            "kind": pa.array(np.repeat(np.array([1, 2], np.int8), n_parts)),
            "n": pa.array(np.repeat(np.array([n_uni, n_bi], np.int64),
                                    n_parts), pa.int64()),
            "part": pa.array(np.tile(np.arange(n_parts, dtype=np.int64), 2)),
        })
        return pa.concat_tables([rows, sent])

    empty = pa.table({"w": pa.array([], pa.string()),
                      "kind": pa.array([], pa.int8()),
                      "n": pa.array([], pa.int64())})

    def _reduce(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0:
            return empty
        agg = tab.group_by(["w", "kind"]).aggregate([("n", "sum")])
        return pa.table({"w": agg["w"], "kind": agg["kind"],
                         "n": agg["n_sum"].cast(pa.int64())})

    parts = [t for t in ray.get(list(
        hash_partition_map(docs_ds, "part", _reduce, n_parts,
                           map_fn=_partial,
                           map_chunk_rows=cfg.batch_size)
        .to_arrow_refs())) if len(t)]
    merged = pa.concat_tables(parts) if parts else empty
    kind = np.asarray(merged["kind"], dtype=np.int8)
    n = np.asarray(merged["n"], dtype=np.int64)
    # every non-empty partition received ALL batches' sentinel rows, so
    # each already holds the GLOBAL total — take one, don't sum across
    n_uni = int(n[kind == 1].max()) if (kind == 1).any() else 0
    n_bi = int(n[kind == 2].max()) if (kind == 2).any() else 0
    wtab = merged.filter(pa.array(kind == 0))
    counts = dict(zip(wtab["w"].to_pylist(),
                      np.asarray(wtab["n"], dtype=np.int64).tolist()))
    if counters is not None:
        counters.add.remote({"pmi_bigrams": len(grams)})
    if n_bi == 0:
        return empty_out
    cx = np.array([counts[x] for x in xs], dtype=np.float64)
    cy = np.array([counts[y] for y in ys], dtype=np.float64)
    # mirrors the oracle expression term-for-term
    pmi = np.log((n_xy.astype(np.float64) / float(n_bi))
                 / ((cx / float(n_uni)) * (cy / float(n_uni))))
    pmi_e6 = pc.round(pc.multiply(pa.array(pmi, pa.float64()), 1e6), 0) \
        .cast(pa.int64())
    return pa.table({"x": pa.array(list(xs), pa.string()),
                     "y": pa.array(list(ys), pa.string()),
                     "n_xy": pa.array(n_xy, pa.int64()),
                     "pmi_e6": pmi_e6})


def doc_surprisal(docs_ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                  id_col: str = "doc_id", text_col: str = "text",
                  sep: str = " ", support_num: int = 1,
                  support_den: int = 1000):
    """Unigram-LM surprisal quality score: per doc, the mean −log₂ of
    each token's corpus probability — fluent boilerplate scores low,
    lexically weird/garbled text scores high.  The LM head is the EXACT
    ≥support heavy-hitter set (provably ≤2/support entries → safe to
    broadcast at ANY corpus size); out-of-head tokens get the standard
    +0.5 smoothing mass.  One heavy_hitters pass, then one ZERO-SHUFFLE
    scoring map (broadcast head lookup via pc.index_in) — never a
    full-vocabulary exchange, unlike a naive count-join.

    Deterministic and SQL-oracle-comparable: the head set and all
    probabilities derive from exact integer counts; only the final mean
    is float (summation-order low bits absorbed by e6 rounding).
    → Dataset(doc_id, n_tokens, surprisal_e6); docs with zero non-empty
    tokens are omitted (mirrors the SQL group-by).
    """
    import ray

    hh = heavy_hitters(docs_ds, cfg, text_col=text_col, sep=sep,
                       support_num=support_num, support_den=support_den,
                       summary_size=None, with_total=True)
    tabs = [t for t in ray.get(list(hh.to_arrow_refs())) if len(t)]
    merged = pa.concat_tables(tabs) if tabs else pa.table(
        {"token": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    tok = merged["token"].combine_chunks()
    cnt = np.asarray(merged["n"], dtype=np.int64)
    is_tot = pc.equal(tok, "").to_numpy(zero_copy_only=False)
    n_total = int(cnt[is_tot].max()) if is_tot.any() else 0
    head_tok = tok.filter(pa.array(~is_tot))
    head_cnt = cnt[~is_tot]
    head_ref = ray.put((head_tok, head_cnt, n_total))

    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "n_tokens": pa.array([], pa.int64()),
                      "surprisal_e6": pa.array([], pa.int64())})

    def _score(t: pa.Table) -> pa.Table:
        htok, hcnt, n_tot = _bcast_get(head_ref)
        if n_tot == 0:
            return empty
        toks = pc.split_pattern(pc.fill_null(
            t[text_col].combine_chunks(), ""), sep)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        offs = np.asarray(toks.offsets, dtype=np.int64)
        offs = offs - offs[0]
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        doc = np.repeat(np.arange(len(t), dtype=np.int64),
                        np.diff(offs))[keep]
        flat = flat.filter(pa.array(keep))
        idx = pc.index_in(flat, value_set=htok)
        miss = pc.is_null(idx).to_numpy(zero_copy_only=False)
        if len(hcnt):
            idx_np = np.asarray(pc.fill_null(idx, 0), dtype=np.int64)
            c = np.where(miss, 0.5, hcnt[idx_np].astype(np.float64))
        else:
            c = np.full(len(miss), 0.5)
        logp = -np.log2(c / float(n_tot))
        n_per = np.zeros(len(t), dtype=np.int64)
        np.add.at(n_per, doc, 1)
        s_per = np.zeros(len(t), dtype=np.float64)
        np.add.at(s_per, doc, logp)
        nz = n_per > 0
        ids = np.asarray(t[id_col], dtype=np.int64)[nz]
        mean = s_per[nz] / n_per[nz]
        e6 = pc.round(pc.multiply(pa.array(mean, pa.float64()), 1e6), 0) \
            .cast(pa.int64())
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "n_tokens": pa.array(n_per[nz], pa.int64()),
                         "surprisal_e6": e6})

    return docs_ds.map_batches(_score, batch_format="pyarrow",
                               zero_copy_batch=True)

