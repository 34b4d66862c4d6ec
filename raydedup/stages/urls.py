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


def crawl_diff(old_ds, new_ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
               url_col: str = "url", text_col: str = "text"):
    """Snapshot diff between two crawls of the same frontier:
    → Dataset(url:string, status:string) with status ∈ {'added',
    'removed', 'changed'}; urls whose content is byte-identical in both
    snapshots are omitted.  The incremental-crawl planning table: what
    must be re-fetched, what disappeared, what changed.

    Physical plan: each side collapses to (url, 128-bit content hash,
    side) in a streaming map — page text never leaves its scan task —
    then ONE hash exchange on the url routes both sides' row for a url
    to the same partition, where a vectorized sorted-run walk emits the
    verdicts.  Both inputs are assumed url-unique (run url_dedup
    first); per-url work is O(1), so there is no skew surface.
    """
    from .dedup import with_text_hash

    n_parts = cfg.resolved_partitions()

    def _project(side: int):
        def _p(t: pa.Table) -> pa.Table:
            urls = pc.fill_null(t[url_col], "").combine_chunks()
            h = hash_utf8_array(urls)
            part = (splitmix64(h) % np.uint64(n_parts)).astype(np.int64)
            return pa.table({
                "url": urls,
                "h1": t["text_hash"], "h2": t["text_hash2"],
                "side": pa.array(np.full(len(t), side, np.int8)),
                "part": pa.array(part, pa.int64()),
            })
        return _p

    sides = with_text_hash(old_ds, text_col).map_batches(
        _project(0), batch_format="pyarrow", zero_copy_batch=True,
    ).union(with_text_hash(new_ds, text_col).map_batches(
        _project(1), batch_format="pyarrow", zero_copy_batch=True))

    empty = pa.table({"url": pa.array([], pa.string()),
                      "status": pa.array([], pa.string())})

    def _diff(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0:
            return empty
        tab = tab.sort_by([("url", "ascending"), ("side", "ascending")])
        urls = tab["url"].combine_chunks()
        side = np.asarray(tab["side"], dtype=np.int8)
        h1 = np.asarray(tab["h1"], dtype=np.int64)
        h2 = np.asarray(tab["h2"], dtype=np.int64)
        n = len(tab)
        first = np.ones(n, dtype=bool)
        if n > 1:
            first[1:] = ~np.asarray(
                pc.equal(urls.slice(1), urls.slice(0, n - 1)))
        starts = np.flatnonzero(first)
        lens = np.diff(np.append(starts, n))
        # init to 3 ('same'): a url violating the url-unique
        # precondition (run length > 2) then drops deterministically
        status = np.full(n, 3, dtype=np.int8)        # 0 add 1 rm 2 chg 3 same
        solo = starts[lens == 1]
        status[solo] = np.where(side[solo] == 1, 0, 1)
        # a 2-run must be one row per SIDE — a same-side duplicate
        # (url-unique violation) stays status 3 and drops, like the
        # run-length>2 case
        both = starts[lens == 2]
        both = both[(side[both] == 0) & (side[both + 1] == 1)]
        changed = (h1[both] != h1[both + 1]) | (h2[both] != h2[both + 1])
        status[both] = np.where(changed, 2, 3)
        keep = np.flatnonzero(first & np.isin(status, (0, 1, 2)))
        if not len(keep):
            return empty
        names = np.array(["added", "removed", "changed"])
        return pa.table({
            "url": urls.take(pa.array(keep, pa.int64())),
            "status": pa.array(names[status[keep]], pa.string()),
        })

    return hash_partition_map(sides, "part", _diff, n_parts)


def snapshot_drift(old_ds, new_ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                   url_col: str = "url", text_col: str = "text",
                   threshold: float = 0.8):
    """→ Dataset(url, intersection, union, jaccard, drift): for every
    url present in BOTH snapshots with byte-different content, the
    exact k-shingle Jaccard between the old and new text and a drift
    class — 'minor_edit' (J >= threshold) or 'rewritten'
    (J < threshold; includes pages too short to shingle, J = 0).  The
    fuzzy companion to ``crawl_diff``'s exact 'changed' verdict: an
    incremental crawl requeues rewritten pages at high priority while
    minor edits keep their refresh cadence.

    Physical plan: each side computes its sorted k-shingle SET in the
    scan task (functions/text.shingle_batch — the same kernel as the
    near-dup surface) plus the 128-bit content hash, and ships
    (url, set-blob, h1, h2) through ONE url-hash exchange; per
    partition a vectorized sorted run-walk aligns the two sides, and
    only the byte-changed pairs' blobs go through pairwise_jaccard
    (the verify kernel).  Raw text never crosses the exchange — only
    the uint64-LE blobs, the repo's standard shuffle wire format.
    Both inputs are assumed url-unique (run url_dedup first); a url
    violating that drops deterministically, as in crawl_diff.
    """
    from ..functions.setops import pairwise_jaccard
    from ..functions.text import binary_to_sets, sets_to_binary, \
        shingle_batch
    from .dedup import with_text_hash

    n_parts = cfg.resolved_partitions()
    k = cfg.k_shingle

    def _project(side: int):
        def _p(t: pa.Table) -> pa.Table:
            urls = pc.fill_null(t[url_col], "").combine_chunks()
            h = hash_utf8_array(urls)
            part = (splitmix64(h) % np.uint64(n_parts)).astype(np.int64)
            vals, offs = shingle_batch(
                pc.fill_null(t[text_col], "").combine_chunks(), k)
            return pa.table({
                "url": urls,
                "h1": t["text_hash"], "h2": t["text_hash2"],
                "set": sets_to_binary(vals, offs),
                "side": pa.array(np.full(len(t), side, np.int8)),
                "part": pa.array(part, pa.int64()),
            })
        return _p

    sides = with_text_hash(old_ds, text_col).map_batches(
        _project(0), batch_format="pyarrow", zero_copy_batch=True,
    ).union(with_text_hash(new_ds, text_col).map_batches(
        _project(1), batch_format="pyarrow", zero_copy_batch=True))

    empty = pa.table({"url": pa.array([], pa.string()),
                      "intersection": pa.array([], pa.int64()),
                      "union": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64()),
                      "drift": pa.array([], pa.string())})

    def _drift(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0:
            return empty
        tab = tab.sort_by([("url", "ascending"), ("side", "ascending")])
        urls = tab["url"].combine_chunks()
        h1 = np.asarray(tab["h1"], dtype=np.int64)
        h2 = np.asarray(tab["h2"], dtype=np.int64)
        n = len(tab)
        first = np.ones(n, dtype=bool)
        if n > 1:
            first[1:] = ~np.asarray(
                pc.equal(urls.slice(1), urls.slice(0, n - 1)))
        starts = np.flatnonzero(first)
        lens = np.diff(np.append(starts, n))
        both = starts[lens == 2]
        # a 2-run must be one row per SIDE — a url duplicated within
        # one snapshot (url-unique contract violation) also makes a
        # 2-run, and scoring old-vs-old would fabricate a drift row
        side = np.asarray(tab["side"], dtype=np.int64)
        both = both[(side[both] == 0) & (side[both + 1] == 1)]
        changed = both[(h1[both] != h1[both + 1])
                       | (h2[both] != h2[both + 1])]
        if not len(changed):
            return empty
        sel_a = pa.array(changed, pa.int64())
        sel_b = pa.array(changed + 1, pa.int64())
        blob = tab["set"].combine_chunks()
        a_vals, a_offs = binary_to_sets(blob.take(sel_a))
        b_vals, b_offs = binary_to_sets(blob.take(sel_b))
        inter, union, j = pairwise_jaccard(a_vals, a_offs, b_vals, b_offs)
        drift = np.where(j >= threshold, "minor_edit", "rewritten")
        return pa.table({
            "url": urls.take(sel_a),
            "intersection": pa.array(inter, pa.int64()),
            "union": pa.array(union, pa.int64()),
            "jaccard": pa.array(j, pa.float64()),
            "drift": pa.array(drift.astype(object), pa.string()),
        })

    return hash_partition_map(sides, "part", _drift, n_parts)


# asset/media extensions a text-corpus frontier drops before fetching;
# matched against the path with an optional ?query / #fragment tail.
# RE2 on both sides: pc.match_substring_regex here, DuckDB
# regexp_matches in the oracle — keep the pattern in sync by hand.
BINARY_EXT_RE = (r"\.(?:jpe?g|png|gif|webp|svg|ico|css|js|woff2?|ttf|"
                 r"mp[34]|avi|mov|zip|gz|tar|exe|dmg|iso|pdf)([?#]|$)")
_SCHEME_RE = r"^https?://"


def filter_urls(ds, url_col: str = "url", *, require_http: bool = True,
                drop_extensions: bool = True, max_len: int = 2048):
    """Crawl-frontier URL filter: keep fetchable text-page URLs.
    Drops non-http(s) schemes, asset/media extensions
    (``BINARY_EXT_RE``), and overlong URLs (> ``max_len`` chars —
    crawler-trap query strings).  One streaming map, zero shuffle;
    all three predicates are vectorized RE2 / length kernels."""

    def _filter(t: pa.Table) -> pa.Table:
        urls = pc.fill_null(t[url_col], "")
        keep = pc.less_equal(pc.utf8_length(urls), max_len)
        if require_http:
            keep = pc.and_(keep, pc.match_substring_regex(urls, _SCHEME_RE))
        if drop_extensions:
            keep = pc.and_(keep, pc.invert(
                pc.match_substring_regex(urls, BINARY_EXT_RE)))
        return t.filter(keep)

    return ds.map_batches(_filter, batch_format="pyarrow",
                          zero_copy_batch=True)
