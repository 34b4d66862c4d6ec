"""URL canonicalization + crawl URL-dedup.

``canonicalize_urls`` applies the crawl-frontier normalization every
web pipeline runs before URL-level dedup: drop fragments, strip
tracking query params (utm_*, fbclid, gclid), tidy the separators the
removal leaves behind, strip trailing slashes.  The normalization is
expressed as a fixed ordered chain of RE2 ``replace_substring_regex``
steps so the DuckDB oracle (``regexp_replace(..., 'g')``) is
byte-identical — the same both-engines-RE2 contract ``scrub_pii``
pinned.  (A production build adds host lowercasing / default-port
removal with a structural parser; the testdata URLs carry no scheme,
so the regex chain is the whole contract here.)

``url_dedup`` keeps ONE page per canonical URL — the earliest
``(ts_col, id_col)`` capture, the crawl-snapshot collapse that runs
before any content dedup: one hash exchange on the canonical string
(dup groups land whole in one partition), per-partition sort +
run-length first.  Same physical plan as ``exact_dedup``; at 10^12
pages the URL string is the only column that must travel with the key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions.hashing import hash_utf8_array, splitmix64
from ..functions.shuffle import hash_partition_map

# ordered (pattern, replacement) chain; mirrored EXACTLY in the SQL
# oracle — do not reorder
CANONICAL_STEPS = (
    (r"#.*$", ""),                                  # fragment
    (r"(utm_[a-z]+|fbclid|gclid)=[^&]*&?", ""),     # tracking params
    (r"\?&", "?"),                                  # '?&rest' → '?rest'
    (r"[?&]+$", ""),                                # dangling separators
    (r"/+$", ""),                                   # trailing slash
)


def canonical_url_array(urls) -> pa.Array:
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    out = pc.fill_null(urls, "")
    for pat, rep in CANONICAL_STEPS:
        out = pc.replace_substring_regex(out, pat, rep)
    return out


def canonicalize_urls(ds, url_col: str = "url",
                      out_col: str = "canonical_url"):
    """Append ``out_col`` — one streaming map, zero shuffle."""

    def _canon(t: pa.Table) -> pa.Table:
        return t.append_column(out_col, canonical_url_array(t[url_col]))

    return ds.map_batches(_canon, batch_format="pyarrow",
                          zero_copy_batch=True)


def url_dedup(ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
              url_col: str = "url", ts_col: str | None = None,
              id_col: str = "doc_id"):
    """Keep one row per canonical URL: min ``(ts_col, id_col)`` (or min
    ``id_col`` when ``ts_col`` is None).  Original columns pass through;
    ``canonical_url`` is carried in the output."""
    n_parts = cfg.resolved_partitions()
    canon = canonicalize_urls(ds, url_col=url_col)
    schema = ds.schema()
    out_cols = list(schema.names) + ["canonical_url"]
    types = dict(zip(schema.names, schema.types))
    types["canonical_url"] = pa.string()

    def _tag(t: pa.Table) -> pa.Table:
        h = hash_utf8_array(t["canonical_url"].combine_chunks())
        part = (np.asarray(splitmix64(h)) % np.uint64(n_parts)).astype(
            np.int64)
        return t.append_column("part", pa.array(part, pa.int64()))

    empty = pa.table({c: pa.array([], types[c]) for c in out_cols})
    sort_keys = ([("canonical_url", "ascending")]
                 + ([(ts_col, "ascending")] if ts_col else [])
                 + [(id_col, "ascending")])

    def _keep(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0:
            return empty
        tab = tab.sort_by(sort_keys)
        idx = np.asarray(
            pc.dictionary_encode(tab["canonical_url"].combine_chunks())
            .indices, dtype=np.int64)
        first = np.empty(len(idx), dtype=bool)
        first[0] = True
        first[1:] = idx[1:] != idx[:-1]
        return tab.filter(pa.array(first)).select(out_cols)

    tagged = canon.map_batches(_tag, batch_format="pyarrow",
                               zero_copy_batch=True)
    return hash_partition_map(tagged, "part", _keep, n_parts)
