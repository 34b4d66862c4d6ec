"""Text-analysis stages for a training-data pipeline: token counting,
quality scoring, language ID, fingerprinting.

All stateless vectorized ``map_batches`` transforms except language ID
(actor pool holding compiled stopword tables).  Tokenization matches
DuckDB ``string_split(text, ' ')`` so the SQL oracles agree exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# stopword tables for the n-gram/stopword language-ID heuristic
_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "nicht"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pour", "que", "dans"},
    "es": {"el", "la", "los", "de", "que", "y", "es", "en", "un", "una"},
}


def token_counts(ds, text_col: str = "text"):
    """+ n_tokens column: count of ' '-separated tokens (vectorized via
    Arrow's list kernels; equals DuckDB len(string_split(text,' ')))."""

    def _count(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[text_col], "")
        n = pc.list_value_length(pc.split_pattern(texts, pattern=" "))
        return batch.append_column("n_tokens", n.cast(pa.int64()))

    return ds.map_batches(_count, batch_format="pyarrow", zero_copy_batch=True)


def quality_scores(ds, text_col: str = "text"):
    """+ quality columns, all vectorized pyarrow/numpy:
       n_chars_measured, n_tokens, mean_token_len, alpha_ratio
    (mean_token_len = n_chars/n_tokens with the ' ' separators excluded)."""

    def _score(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[text_col], "")
        n_chars = pc.utf8_length(texts).cast(pa.float64())
        toks = pc.split_pattern(texts, pattern=" ")
        n_tok = pc.list_value_length(toks).cast(pa.float64())
        sep_chars = pc.subtract(n_tok, 1)
        tok_chars = pc.max_element_wise(pc.subtract(n_chars, sep_chars), 0)
        mean_len = pc.divide(tok_chars, pc.max_element_wise(n_tok, 1))
        # alpha ratio: fraction of ASCII-alphabetic characters (ASCII
        # class deliberately, to agree exactly with RE2 [[:alpha:]] in
        # the DuckDB oracle)
        alpha = pc.utf8_length(
            pc.replace_substring_regex(texts, pattern=r"[^a-zA-Z]", replacement="")
        ).cast(pa.float64())
        alpha_ratio = pc.divide(alpha, pc.max_element_wise(n_chars, 1))
        batch = batch.append_column("n_chars_measured", n_chars.cast(pa.int64()))
        batch = batch.append_column("n_tokens", n_tok.cast(pa.int64()))
        batch = batch.append_column("mean_token_len", mean_len)
        return batch.append_column("alpha_ratio", alpha_ratio)

    return ds.map_batches(_score, batch_format="pyarrow", zero_copy_batch=True)


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _segment_sum(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Sum ``values`` per list row given Arrow list offsets (int64)."""
    n = len(offsets) - 1
    out = np.zeros(n, dtype=np.float64)
    if len(values) == 0:
        return out
    cs = np.zeros(len(values) + 1, dtype=np.float64)
    np.cumsum(values, out=cs[1:])
    return cs[offsets[1:]] - cs[offsets[:-1]]


def _count_sub(texts, pattern: str):
    """Non-overlapping substring occurrence count via the replace-length
    trick — the same left-to-right greedy semantics as DuckDB
    ``replace``, so the oracle agrees exactly."""
    removed = pc.subtract(
        pc.utf8_length(texts),
        pc.utf8_length(pc.replace_substring(texts, pattern=pattern,
                                            replacement="")))
    return pc.divide(removed.cast(pa.float64()), float(len(pattern)))


def _gopher_stats(texts: pa.Array | pa.ChunkedArray) -> dict:
    """Vectorized Gopher heuristics over a (null-filled) string array —
    shared by ``gopher_rules`` (stats + gate columns) and
    ``quality_filter(gopher_gate=True)`` (gate only)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_chars = pc.utf8_length(texts).cast(pa.float64())

    def _one_chunk(arr):
        return (arr.combine_chunks()
                if isinstance(arr, pa.ChunkedArray) else arr)

    words = _one_chunk(pc.split_pattern(texts, pattern=" "))
    w_offs = np.asarray(words.offsets, dtype=np.int64)
    w_offs = w_offs - w_offs[0]  # sliced arrays carry a base offset
    w_vals = words.flatten()     # values aligned with adjusted offsets
    n_words = (w_offs[1:] - w_offs[:-1]).astype(np.float64)
    # Σ word lengths = n_chars − separators (split on ' ' partitions)
    word_chars = np.maximum(
        np.asarray(n_chars) - (n_words - 1.0), 0.0)
    mean_word_len = word_chars / np.maximum(n_words, 1.0)

    has_alpha = pc.match_substring_regex(w_vals, "[a-zA-Z]")
    alpha_per_word = np.asarray(
        pc.fill_null(has_alpha, False)).astype(np.float64)
    alpha_word_frac = (_segment_sum(alpha_per_word, w_offs)
                       / np.maximum(n_words, 1.0))

    lines = _one_chunk(pc.split_pattern(texts, pattern="\n"))
    l_offs = np.asarray(lines.offsets, dtype=np.int64)
    l_offs = l_offs - l_offs[0]
    l_vals = lines.flatten()
    n_lines = (l_offs[1:] - l_offs[:-1]).astype(np.float64)
    bullet = pc.or_(pc.starts_with(l_vals, pattern="•"),
                    pc.starts_with(l_vals, pattern="-"))
    ellip = pc.or_(pc.ends_with(l_vals, pattern="..."),
                   pc.ends_with(l_vals, pattern="…"))
    bullet_frac = (_segment_sum(
        np.asarray(pc.fill_null(bullet, False)).astype(np.float64), l_offs)
        / np.maximum(n_lines, 1.0))
    ellip_frac = (_segment_sum(
        np.asarray(pc.fill_null(ellip, False)).astype(np.float64), l_offs)
        / np.maximum(n_lines, 1.0))

    n_sym = (np.asarray(_count_sub(texts, "#"))
             + np.asarray(_count_sub(texts, "...")))
    symbol_ratio = n_sym / np.maximum(n_words, 1.0)

    n_stop = np.zeros(len(n_words), dtype=np.int64)
    for w in GOPHER_STOPWORDS:
        present = _segment_sum(
            np.asarray(pc.equal(w_vals, w)).astype(np.float64), w_offs)
        n_stop += (present > 0)

    gate = ((n_words >= 50) & (n_words <= 100_000)
            & (mean_word_len >= 3) & (mean_word_len <= 10)
            & (symbol_ratio < 0.1) & (bullet_frac < 0.9)
            & (ellip_frac < 0.3) & (alpha_word_frac > 0.8)
            & (n_stop >= 2))
    return {"n_words": n_words, "mean_word_len": mean_word_len,
            "bullet_line_frac": bullet_frac,
            "ellipsis_line_frac": ellip_frac,
            "alpha_word_frac": alpha_word_frac,
            "symbol_word_ratio": symbol_ratio,
            "n_stopwords_present": n_stop, "gopher_pass": gate}


def gopher_rules(ds, text_col: str = "text"):
    """Gopher-style document quality heuristics (Rae et al. 2021,
    Appendix A1.1 — public literature), all vectorized Arrow/numpy:

      n_words, mean_word_len          (space-delimited tokens)
      bullet_line_frac                lines starting with '•' or '-'
      ellipsis_line_frac              lines ending with '...' or '…'
      alpha_word_frac                 words containing ≥1 [a-zA-Z]
      symbol_word_ratio               ('#' + '...') occurrences / words
      n_stopwords_present             of the paper's 8 stop words
      gopher_pass                     the paper's conjunctive gate

    Gate: 50 ≤ words ≤ 100 000, 3 ≤ mean_word_len ≤ 10,
    symbol_word_ratio < 0.1, bullet_line_frac < 0.9,
    ellipsis_line_frac < 0.3, alpha_word_frac > 0.8, ≥2 stop words."""

    def _rules(batch: pa.Table) -> pa.Table:
        s = _gopher_stats(pc.fill_null(batch[text_col], ""))
        n_words = s["n_words"]
        mean_word_len = s["mean_word_len"]
        bullet_frac = s["bullet_line_frac"]
        ellip_frac = s["ellipsis_line_frac"]
        alpha_word_frac = s["alpha_word_frac"]
        symbol_ratio = s["symbol_word_ratio"]
        n_stop = s["n_stopwords_present"]
        gate = s["gopher_pass"]

        batch = batch.append_column("n_words",
                                    pa.array(n_words.astype(np.int64)))
        batch = batch.append_column("mean_word_len",
                                    pa.array(mean_word_len, pa.float64()))
        batch = batch.append_column("bullet_line_frac",
                                    pa.array(bullet_frac, pa.float64()))
        batch = batch.append_column("ellipsis_line_frac",
                                    pa.array(ellip_frac, pa.float64()))
        batch = batch.append_column("alpha_word_frac",
                                    pa.array(alpha_word_frac, pa.float64()))
        batch = batch.append_column("symbol_word_ratio",
                                    pa.array(symbol_ratio, pa.float64()))
        batch = batch.append_column("n_stopwords_present", pa.array(n_stop))
        return batch.append_column("gopher_pass", pa.array(gate))

    return ds.map_batches(_rules, batch_format="pyarrow",
                          zero_copy_batch=True)


def repetition_stats(ds, text_col: str = "text"):
    """Gopher/RefinedWeb-style intra-document repetition signals, fully
    vectorized (one lexsort + run-length pass per batch):

      dup_word_frac_e6   = (n_words − distinct_words)·1e6 // n_words
      top_word_frac_e6   = max word count·1e6 // n_words
      top_bigram_frac_e6 = max bigram count·1e6 // n_bigrams (0 if none)

    Fractions are e6 integers (exact integer division) so the DuckDB
    oracle agrees bit-for-bit — the avg_chars pattern.  Tokenization is
    DuckDB ``string_split(text, ' ')`` exactly (split of '' is [''])."""
    from ..functions.hashing import hash_utf8_array, window_hash_stream

    def _rep(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[text_col], "")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        la = pc.split_pattern(texts, pattern=" ")
        offs = np.asarray(la.offsets, dtype=np.int64)
        h = hash_utf8_array(la.values)
        n = (offs[1:] - offs[:-1])          # ≥1 for every doc
        n_docs = len(n)
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), n)

        def _per_doc_runs(keys, docs, n_groups):
            """(distinct count, max run length) per doc for (doc, key)
            runs; docs must be nondecreasing."""
            order = np.lexsort((keys, docs))
            ks, ds_ = keys[order], docs[order]
            new = np.empty(len(ks), dtype=bool)
            new[0] = True
            new[1:] = (ks[1:] != ks[:-1]) | (ds_[1:] != ds_[:-1])
            ridx = np.flatnonzero(new)
            rlen = np.diff(np.append(ridx, len(ks)))
            run_doc = ds_[ridx]
            distinct = np.bincount(run_doc, minlength=n_groups)
            first = np.empty(len(run_doc), dtype=bool)
            first[0] = True
            first[1:] = run_doc[1:] != run_doc[:-1]
            mx = np.zeros(n_groups, dtype=np.int64)
            if len(run_doc):
                mx[run_doc[first]] = np.maximum.reduceat(
                    rlen, np.flatnonzero(first))
            return distinct.astype(np.int64), mx

        distinct, top_word = _per_doc_runs(h, doc_of, n_docs)

        # bigrams: window hash of width 2 over the flat token-hash
        # stream, windows crossing doc boundaries dropped
        if len(h) >= 2:
            bh = window_hash_stream(h, 2)
            valid = doc_of[:-1] == doc_of[1:]
            bh, bdoc = bh[valid], doc_of[:-1][valid]
        else:
            bh = np.empty(0, dtype=np.uint64)
            bdoc = np.empty(0, dtype=np.int64)
        nb = np.maximum(n - 1, 0)
        if len(bh):
            _, top_bigram = _per_doc_runs(bh, bdoc, n_docs)
        else:
            top_bigram = np.zeros(n_docs, dtype=np.int64)

        e6 = np.int64(1_000_000)
        dup_frac = (n - distinct) * e6 // n
        top_w = top_word * e6 // n
        top_b = np.where(nb > 0, top_bigram * e6 // np.maximum(nb, 1), 0)
        return pa.table({
            "doc_id": batch["doc_id"],
            "dup_word_frac_e6": pa.array(dup_frac, pa.int64()),
            "top_word_frac_e6": pa.array(top_w, pa.int64()),
            "top_bigram_frac_e6": pa.array(top_b, pa.int64()),
        })

    return ds.map_batches(_rep, batch_format="pyarrow", zero_copy_batch=True)


# RE2 patterns — pyarrow's replace_substring_regex and DuckDB's
# regexp_replace are both RE2, so the SQL oracle applies the SAME
# patterns and must agree byte-for-byte.
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\d{3}[-.]\d{3}[-.]\d{4}", "<PHONE>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def scrub_pii(ds, text_col: str = "text", out_col: str = "text_scrubbed"):
    """+ ``out_col``: text with emails / phone numbers / IPv4 literals
    replaced by typed placeholders — sequential RE2 passes, vectorized
    over the whole batch (compiled kernels, no Python per row)."""

    def _scrub(batch: pa.Table) -> pa.Table:
        out = pc.fill_null(batch[text_col], "")
        for pat, repl in PII_PATTERNS:
            out = pc.replace_substring_regex(out, pattern=pat,
                                             replacement=repl)
        return batch.append_column(out_col, out)

    return ds.map_batches(_scrub, batch_format="pyarrow", zero_copy_batch=True)


class LangIdStage:
    """Stopword-vote language ID — a stateful actor-pool stage: the
    per-language sorted stopword-hash tables are built once per actor in
    __init__; per batch, one searchsorted membership pass per language
    over the batch's token hashes (no Python loop over docs or tokens).
    Emits lang_pred:string ('und' when no stopword hits; ties go to the
    alphabetically first language)."""

    def __init__(self, text_col: str = "text"):
        from ..functions.hashing import hash_utf8_array
        self.text_col = text_col
        self.langs = sorted(_STOPWORDS)
        self.stop_hashes = [
            np.sort(hash_utf8_array(pa.array(sorted(_STOPWORDS[lang]))))
            for lang in self.langs
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.text import tokenize_arrow
        tok_hashes, offsets = tokenize_arrow(batch[self.text_col])
        n_docs = len(offsets) - 1
        lens = offsets[1:] - offsets[:-1]
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        votes = np.zeros((n_docs, len(self.langs)), dtype=np.int64)
        for li, h in enumerate(self.stop_hashes):
            pos = np.searchsorted(h, tok_hashes)
            pos = np.clip(pos, 0, len(h) - 1)
            ok = h[pos] == tok_hashes
            votes[:, li] = np.bincount(doc_of[ok], minlength=n_docs)
        best = np.argmax(votes, axis=1)
        any_hit = votes.max(axis=1) > 0
        langs_arr = np.array(self.langs + ["und"], dtype=object)
        pred = langs_arr[np.where(any_hit, best, len(self.langs))]
        return batch.append_column("lang_pred",
                                   pa.array(list(pred), type=pa.string()))


def lang_id(ds, text_col: str = "text", concurrency=(1, 4)):
    return ds.map_batches(LangIdStage, batch_format="pyarrow",
                          fn_constructor_args=(text_col,),
                          concurrency=concurrency)


def normalize_text(ds, text_col: str = "text",
                   out_col: str = "text_normalized"):
    """+ ``out_col``: lowercase, whitespace runs collapsed to one
    space, leading/trailing whitespace stripped — the canonical text
    normalization run before exact-hash dedup so trivially-reformatted
    copies collide.  Pure Arrow kernels (utf8_lower +
    replace_substring_regex + trim), zero shuffle; byte-parity with
    DuckDB ``trim(regexp_replace(lower(t), '\\s+', ' ', 'g'))`` is
    pinned in tests."""

    def _norm(batch: pa.Table) -> pa.Table:
        out = pc.utf8_trim_whitespace(pc.replace_substring_regex(
            pc.utf8_lower(pc.fill_null(batch[text_col], "")), r"\s+", " "))
        return batch.append_column(out_col, out)

    return ds.map_batches(_norm, batch_format="pyarrow", zero_copy_batch=True)


def quality_filter(ds, *, text_col: str = "text",
                   min_tokens: int | None = None,
                   max_tokens: int | None = None,
                   min_mean_token_len: float | None = None,
                   max_mean_token_len: float | None = None,
                   min_alpha_ratio: float | None = None,
                   max_dup_word_frac_e6: int | None = None,
                   gopher_gate: bool = False,
                   counters=None, carry_tokens: bool = False):
    """Composite C4/Gopher-style quality gate: keep docs passing every
    provided bound (None = unbounded) over token count, mean token
    length, alphabetic-character ratio and duplicate-word fraction —
    the rule-based cut every crawl pipeline applies before dedup
    (Raffel et al. 2020 §2.2; Rae et al. 2021 A1.1).

    One streaming map, all stats computed inline with the SAME
    arithmetic as quality_scores / repetition_stats (identical doubles,
    so threshold comparisons agree exactly with the SQL oracle); no
    intermediate stats table is materialized.

    ``carry_tokens``: attach the per-doc token-hash cache column
    (functions/text.TOKEN_CACHE_COL) to the output so downstream
    zero-shuffle stages (decontamination, n-gram guard) reuse this
    stage's tokenization instead of re-tokenizing — the tokenize-once
    prefix.  The caller must drop the column before any
    materialize/exchange.

    ``gopher_gate``: additionally require the full conjunctive Gopher
    rule set (``gopher_rules``'s gate — bullet/ellipsis line fractions,
    symbol-to-word ratio, alpha-word fraction, stop-word presence) in
    the same streaming map."""
    from ..functions.text import (TOKEN_CACHE_COL, batch_tokens,
                                  tokens_to_column)

    def _filter(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[text_col], "")
        n_chars = pc.utf8_length(texts).cast(pa.float64()).to_numpy()
        h, offs = batch_tokens(batch, text_col)
        n_tok = (offs[1:] - offs[:-1]).astype(np.int64)
        keep = np.ones(len(batch), dtype=bool)
        if min_tokens is not None:
            keep &= n_tok >= min_tokens
        if max_tokens is not None:
            keep &= n_tok <= max_tokens
        if min_mean_token_len is not None or max_mean_token_len is not None:
            nt = n_tok.astype(np.float64)
            mean_len = np.maximum(n_chars - (nt - 1), 0) / np.maximum(nt, 1)
            if min_mean_token_len is not None:
                keep &= mean_len >= min_mean_token_len
            if max_mean_token_len is not None:
                keep &= mean_len <= max_mean_token_len
        if min_alpha_ratio is not None:
            alpha = pc.utf8_length(pc.replace_substring_regex(
                texts, pattern=r"[^a-zA-Z]", replacement="")) \
                .cast(pa.float64()).to_numpy()
            keep &= alpha / np.maximum(n_chars, 1) >= min_alpha_ratio
        if max_dup_word_frac_e6 is not None:
            doc_of = np.repeat(np.arange(len(batch), dtype=np.int64), n_tok)
            order = np.lexsort((h, doc_of))
            ks, ds_ = h[order], doc_of[order]
            new = np.empty(len(ks), dtype=bool)
            if len(ks):
                new[0] = True
                new[1:] = (ks[1:] != ks[:-1]) | (ds_[1:] != ds_[:-1])
            distinct = np.bincount(ds_[new], minlength=len(batch)) \
                .astype(np.int64) if len(ks) else \
                np.zeros(len(batch), np.int64)
            dup_e6 = (n_tok - distinct) * np.int64(1_000_000) \
                // np.maximum(n_tok, 1)
            keep &= dup_e6 <= max_dup_word_frac_e6
        if gopher_gate:
            keep &= _gopher_stats(texts)["gopher_pass"]
        if counters is not None and not keep.all():
            counters.add.remote(            # settle on read, not here
                {"quality_dropped": int((~keep).sum())})
        if carry_tokens and TOKEN_CACHE_COL not in batch.column_names:
            batch = batch.append_column(TOKEN_CACHE_COL,
                                        tokens_to_column(h, offs))
        return batch.filter(pa.array(keep))

    return ds.map_batches(_filter, batch_format="pyarrow",
                          zero_copy_batch=True)


def winnow_fingerprints(ds, cfg=None, *, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 5, w: int = 4,
                        hash: str = "rabin", numeric: bool = False):
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003): over the document's k-gram hash sequence, every
    window of ``w`` consecutive hashes selects its MINIMUM, rightmost
    position on ties — the STATELESS tie rule, deterministic and
    SQL-expressible (the paper's "robust" variant instead re-selects
    the previously selected hash on ties, which is per-document
    sequential state; on tie-heavy inputs this rule selects a slightly
    denser set).  The distinct selections are the fingerprint set.
    Guarantees any shared run of ≥ w+k−1 tokens contributes at least
    one common fingerprint, at ~1/w the storage of the full stream.

    → Dataset(id, pos:int64 1-based k-gram index, fingerprint:string
    16-hex-char).  ``hash="rabin"``: the production rolling-hash path
    (functions/text.shingle_stream — zero Python per token).
    ``hash="md5"``: the SQL-expressible oracle path — k-gram text →
    first 16 hex chars of md5, the same construction the DuckDB oracle
    writes (mix_sample's md5-oracle-path pattern); selection code is
    shared between the paths.  One streaming map, zero shuffle.
    ``numeric=True`` emits the selection's raw 64-bit value as
    ``fp:int64`` instead of the hex string — the exchange-ready form
    `winnow_overlap_pairs` consumes (the hex string IS this value
    formatted, so the two forms are bijective)."""
    import hashlib

    from ..functions.text import shingle_stream, tokenize_arrow

    if hash not in ("rabin", "md5"):
        raise ValueError("hash must be 'rabin' or 'md5'")

    def _fp(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[text_col], "").combine_chunks()
        if hash == "rabin":
            h, doc, _ = shingle_stream(texts, k)
        else:
            from ..functions.text import word_ngram_strings
            grams, doc = word_ngram_strings(texts, k)
            # md5 is the oracle-parity hash — per-gram hashlib loop is
            # the documented cost of SQL expressibility (oracle path
            # only; production runs the vectorized rabin stream)
            h = np.fromiter(
                (int(hashlib.md5(g.encode()).hexdigest()[:16], 16)
                 for g in grams.to_pylist()),
                dtype=np.uint64, count=len(grams))

        ids = np.asarray(batch[id_col], dtype=np.int64)
        n = len(h)
        if numeric:
            empty = pa.table({id_col: pa.array([], pa.int64()),
                              "pos": pa.array([], pa.int64()),
                              "fp": pa.array([], pa.int64())})
        else:
            empty = pa.table({id_col: pa.array([], pa.int64()),
                              "pos": pa.array([], pa.int64()),
                              "fingerprint": pa.array([], pa.string())})
        if n < w:
            return empty
        # 1-based k-gram position within each doc
        starts_of_doc = np.zeros(n, dtype=np.int64)
        first = np.ones(n, dtype=bool)
        first[1:] = doc[1:] != doc[:-1]
        starts_of_doc = np.repeat(np.flatnonzero(first),
                                  np.diff(np.append(np.flatnonzero(first),
                                                    n)))
        pos = np.arange(n, dtype=np.int64) - starts_of_doc + 1

        sw = np.lib.stride_tricks.sliding_window_view(h, w)
        # rightmost minimum: argmin over the reversed window
        sel_off = (w - 1) - np.argmin(sw[:, ::-1], axis=1)
        ends = np.arange(w - 1, n)
        wstarts = ends - (w - 1)
        valid = doc[ends] == doc[wstarts]       # windows never cross docs
        sel_idx = np.unique(wstarts[valid] + sel_off[valid])
        if numeric:
            return pa.table({
                id_col: pa.array(ids[doc[sel_idx]], pa.int64()),
                "pos": pa.array(pos[sel_idx], pa.int64()),
                "fp": pa.array(h[sel_idx].view(np.int64), pa.int64()),
            })
        return pa.table({
            id_col: pa.array(ids[doc[sel_idx]], pa.int64()),
            "pos": pa.array(pos[sel_idx], pa.int64()),
            "fingerprint": pa.array(
                [format(x, "016x") for x in h[sel_idx]], pa.string()),
        })

    return ds.map_batches(_fp, batch_format="pyarrow", zero_copy_batch=True)


def winnow_crosspairs(left_ds, right_ds, cfg=None, *,
                      id_col: str = "doc_id", text_col: str = "text",
                      k: int = 5, w: int = 4, hash: str = "rabin",
                      min_shared: int = 2, max_df: int = 1000):
    """R-S form of `winnow_overlap_pairs`: (a from left, b from right,
    shared) — probe an increment against an existing corpus for
    PARTIAL overlap (the MOSS-tier counterpart of
    allpairs.crosspairs_jaccard; the LSH tier's incremental_near_dup
    and the exact tier's incremental_dedup complete the family).
    Sides ride the id's low bit exactly as in the exact join
    (left = 2*id, right = 2*id+1 — overlapping id spaces safe); only
    cross-parity pairs survive emission; the df noise cut applies to
    the UNION corpus, mirroring what a single re-run over
    old+new would compute."""
    from .allpairs import decode_sides, tag_side

    union = tag_side(left_ds, 0, id_col, "winnow_crosspairs").union(
        tag_side(right_ds, 1, id_col, "winnow_crosspairs"))
    scored = winnow_overlap_pairs(union, cfg, id_col=id_col,
                                  text_col=text_col, k=k, w=w,
                                  hash=hash, min_shared=min_shared,
                                  max_df=max_df, _cross_parity=True)

    def _decode(t: pa.Table) -> pa.Table:
        left, right = decode_sides(np.asarray(t["a"], dtype=np.int64),
                                   np.asarray(t["b"], dtype=np.int64))
        return pa.table({"a": pa.array(left, pa.int64()),
                         "b": pa.array(right, pa.int64()),
                         "shared": t["shared"]})

    return scored.map_batches(_decode, batch_format="pyarrow",
                              zero_copy_batch=True)


def winnow_overlap_pairs(ds, cfg=None, *, id_col: str = "doc_id",
                         text_col: str = "text", k: int = 5, w: int = 4,
                         hash: str = "rabin", min_shared: int = 2,
                         max_df: int = 1000, _cross_parity: bool = False):
    """MOSS-style overlap detection (Schleimer et al. §5): pairs of
    documents sharing >= ``min_shared`` distinct winnowed fingerprints
    → Dataset(a, b, shared:int64), a < b.  Position-aware where
    MinHash is not: any shared token run of length >= w+k−1 leaves at
    least one common fingerprint, so partial overlap (a quoted
    paragraph, a template section) is caught even when whole-doc
    Jaccard is far below any LSH threshold.

    ``max_df`` is the paper's noise threshold: fingerprints selected
    by MORE than ``max_df`` documents carry no pair evidence (they are
    corpus boilerplate, and their pair lists are quadratic) — the SQL
    oracle mirrors the same HAVING cut, so the exclusion is part of
    the checked semantics, not a silent cap.

    Physical plan: winnow (zero shuffle, per-doc batch-local, so the
    per-batch distinct (doc, fp) IS the global distinct) → exchange 1
    keyed hash(fp) (each fingerprint's doc list lands whole: the df
    cut and the pair emission are partition-local) → vectorized run
    scan (lsh._all_pairs_of_runs) → exchange 2 keyed hash(pair) sums
    per-partition partial shared-counts and applies ``min_shared``."""
    from ..config import DEFAULT_CONFIG
    from ..functions.hashing import splitmix64
    from ..functions.shuffle import hash_partition_map
    from .lsh import _all_pairs_of_runs

    cfg = cfg or DEFAULT_CONFIG
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    n_parts = cfg.resolved_partitions()
    fps = winnow_fingerprints(ds, cfg, id_col=id_col, text_col=text_col,
                              k=k, w=w, hash=hash, numeric=True)

    def _dedup_route(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col], dtype=np.int64)
        fp = np.asarray(t["fp"], dtype=np.int64)
        pk = np.unique(np.stack([fp, ids], axis=1), axis=0)
        part = (pk[:, 0].view(np.uint64) % np.uint64(n_parts)) \
            .astype(np.int64)
        return pa.table({"fp": pa.array(pk[:, 0], pa.int64()),
                         "id": pa.array(pk[:, 1], pa.int64()),
                         "part": pa.array(part, pa.int64())})

    def _emit(group: pa.Table | None) -> pa.Table:
        if group is None or len(group) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"a": z, "b": z, "n": z, "part": z})
        fp = np.asarray(group["fp"], dtype=np.int64)
        ids = np.asarray(group["id"], dtype=np.int64)
        # global (fp, id) distinct: both keys are co-located here (the
        # map-side unique is only a per-chunk combiner — a doc's rows
        # can split across map chunks)
        pk = np.unique(np.stack([fp, ids], axis=1), axis=0)
        fp, ids = pk[:, 0], pk[:, 1]
        # df cut: drop over-common fingerprints BEFORE pair emission
        first = np.ones(len(fp), dtype=bool)
        first[1:] = fp[1:] != fp[:-1]
        starts = np.flatnonzero(first)
        run_len = np.diff(np.append(starts, len(fp)))
        keep_run = run_len <= max_df
        keep = np.repeat(keep_run, run_len)
        fp, ids = fp[keep], ids[keep]
        if not len(fp):
            z = pa.array([], pa.int64())
            return pa.table({"a": z, "b": z, "n": z, "part": z})
        lo, hi = _all_pairs_of_runs(fp, ids)
        if _cross_parity and len(lo):
            cross = ((lo ^ hi) & 1) == 1
            lo, hi = lo[cross], hi[cross]
        if not len(lo):
            z = pa.array([], pa.int64())
            return pa.table({"a": z, "b": z, "n": z, "part": z})
        pk, cnt = np.unique(np.stack([lo, hi], axis=1), axis=0,
                            return_counts=True)
        a, b = pk[:, 0], pk[:, 1]
        part = (splitmix64(a.view(np.uint64)
                           * np.uint64(0x9E3779B97F4A7C15)
                           ^ b.view(np.uint64))
                % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64()),
                         "part": pa.array(part, pa.int64())})

    def _sum(group: pa.Table | None) -> pa.Table:
        z = pa.array([], pa.int64())
        if group is None or len(group) == 0:
            return pa.table({"a": z, "b": z, "shared": z})
        a = np.asarray(group["a"], dtype=np.int64)
        b = np.asarray(group["b"], dtype=np.int64)
        n = np.asarray(group["n"], dtype=np.int64)
        pk, inv = np.unique(np.stack([a, b], axis=1), axis=0,
                            return_inverse=True)
        sums = np.zeros(len(pk), dtype=np.int64)
        np.add.at(sums, inv, n)
        sel = sums >= min_shared
        return pa.table({"a": pa.array(pk[sel, 0], pa.int64()),
                         "b": pa.array(pk[sel, 1], pa.int64()),
                         "shared": pa.array(sums[sel], pa.int64())})

    routed = hash_partition_map(fps, "part", _emit, n_parts,
                                map_fn=_dedup_route,
                                map_chunk_rows=cfg.batch_size)
    return hash_partition_map(routed, "part", _sum, n_parts)


def corpus_report(ds, *, text_col: str = "text"):
    """→ one-row Dataset(n_docs, n_tokens, n_chars, min_tokens,
    max_tokens, mean_tokens): the whole-corpus summary every build
    prints.  Per-batch partials (one 6-value row per batch leaves the
    map side) merged in a single tiny reduce — the corpus is touched
    once, nothing corpus-sized moves or lands on the driver."""
    from ..functions.shuffle import hash_partition_map

    def _partial(t: pa.Table) -> pa.Table:
        texts = pc.fill_null(t[text_col], "")
        n_tok = pc.list_value_length(
            pc.split_pattern(texts, pattern=" ")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        n_chars = pc.utf8_length(texts).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "n_docs": pa.array([len(t)], pa.int64()),
            "n_tokens": pa.array([int(n_tok.sum())], pa.int64()),
            "n_chars": pa.array([int(n_chars.sum())], pa.int64()),
            "min_tokens": pa.array(
                [int(n_tok.min()) if len(t) else 0], pa.int64()),
            "max_tokens": pa.array(
                [int(n_tok.max()) if len(t) else 0], pa.int64()),
            "part": pa.array([0], pa.int64()),
        })

    empty = pa.table({
        "n_docs": pa.array([0], pa.int64()),
        "n_tokens": pa.array([0], pa.int64()),
        "n_chars": pa.array([0], pa.int64()),
        "min_tokens": pa.array([0], pa.int64()),
        "max_tokens": pa.array([0], pa.int64()),
        "mean_tokens": pa.array([0.0], pa.float64()),
    })

    def _merge(tab: pa.Table | None) -> pa.Table:
        if tab is not None and len(tab) and tab.num_columns:
            # empty-batch partials carry min=max=0 sentinels: drop them
            # or they corrupt the global min
            tab = tab.filter(pc.greater(tab["n_docs"], 0))
        if tab is None or len(tab) == 0 or tab.num_columns == 0:
            return empty
        nd = int(np.asarray(tab["n_docs"], np.int64).sum())
        nt = int(np.asarray(tab["n_tokens"], np.int64).sum())
        nc = int(np.asarray(tab["n_chars"], np.int64).sum())
        return pa.table({
            "n_docs": pa.array([nd], pa.int64()),
            "n_tokens": pa.array([nt], pa.int64()),
            "n_chars": pa.array([nc], pa.int64()),
            "min_tokens": pa.array(
                [int(np.asarray(tab["min_tokens"], np.int64).min())],
                pa.int64()),
            "max_tokens": pa.array(
                [int(np.asarray(tab["max_tokens"], np.int64).max())],
                pa.int64()),
            "mean_tokens": pa.array([nt / nd if nd else 0.0], pa.float64()),
        })

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return hash_partition_map(partials, "part", _merge, 1)
