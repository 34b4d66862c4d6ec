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
    per-language token tables are built once per actor in __init__.
    Emits lang_pred:string ('und' when no stopword hits)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.langs = sorted(_STOPWORDS)
        self.table: dict[str, int] = {}
        for li, lang in enumerate(self.langs):
            for w in _STOPWORDS[lang]:
                self.table.setdefault(w, 0)
                self.table[w] |= 1 << li

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd
        texts = pc.fill_null(batch[self.text_col], "").to_pylist()
        preds = []
        for t in texts:
            votes = [0] * len(self.langs)
            for w in t.split(" "):
                mask = self.table.get(w)
                if mask:
                    for li in range(len(self.langs)):
                        if mask >> li & 1:
                            votes[li] += 1
            best = max(range(len(self.langs)), key=votes.__getitem__)
            preds.append(self.langs[best] if votes[best] > 0 else "und")
        return batch.append_column("lang_pred", pa.array(preds, type=pa.string()))


def lang_id(ds, text_col: str = "text", concurrency=(1, 4)):
    return ds.map_batches(LangIdStage, batch_format="pyarrow",
                          fn_constructor_args=(text_col,),
                          concurrency=concurrency)
