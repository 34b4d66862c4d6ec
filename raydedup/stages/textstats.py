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
