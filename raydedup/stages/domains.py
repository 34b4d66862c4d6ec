"""Domain/host-level operators for crawl curation.

Web-corpus pipelines aggregate and filter at HOST granularity: a
domain's doc count and average quality decide whether it is a content
farm, and blocklists (spam/adult/SEO domains) are applied before any
expensive per-document work.  Hosts are extracted with the same frozen
RE2 chain discipline as stages/urls.py (byte-identical to the DuckDB
``regexp_extract`` oracle).

Physical plans: host extraction is a pure Arrow map; ``domain_stats``
is the standard combiner exchange (per-batch Arrow group-by partials →
one hash exchange on the host → sum — one row per distinct host per
batch travels); ``filter_domains`` broadcasts the blocklist by closure
(blocklists are small by definition) and filters with one exact
``pc.is_in`` per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions.hashing import hash_utf8_array
from ..functions.shuffle import hash_partition_map

# host = everything between an optional scheme and the first '/'
_HOST_RE = r"^(?:https?://)?(?P<host>[^/]+)"


def with_host(ds, url_col: str = "url", out_col: str = "host"):
    """Append the host extracted from ``url_col`` ('' when the URL has
    no host-shaped prefix, matching DuckDB regexp_extract's miss)."""

    def _extract(t: pa.Table) -> pa.Table:
        s = pc.extract_regex(pc.fill_null(t[url_col], ""), _HOST_RE)
        host = pc.fill_null(pc.struct_field(s, "host"), "")
        return t.append_column(out_col, host)

    return ds.map_batches(_extract, batch_format="pyarrow",
                          zero_copy_batch=True)


def domain_stats(ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                 url_col: str = "url", text_col: str = "text"):
    """→ Dataset(host, n_docs:int64, sum_tokens:int64) — per-host doc
    count and whitespace-token volume (the content-farm triage table)."""
    n_parts = cfg.num_partitions
    hosted = with_host(ds, url_col=url_col)

    def _partial(t: pa.Table) -> pa.Table:
        toks = pc.list_value_length(
            pc.split_pattern(pc.fill_null(t[text_col], ""), " "))
        g = pa.table({"host": t["host"],
                      "n_tokens": toks.cast(pa.int64())}) \
            .group_by("host").aggregate([("n_tokens", "sum"),
                                         ("n_tokens", "count")])
        h = hash_utf8_array(g["host"].combine_chunks())
        return pa.table({
            "host": g["host"],
            "n_docs": g["n_tokens_count"].cast(pa.int64()),
            "sum_tokens": g["n_tokens_sum"].cast(pa.int64()),
            "_part": pa.array((h % np.uint64(n_parts)).astype(np.int64),
                              pa.int64()),
        })

    def _reduce(t: pa.Table | None) -> pa.Table:
        if t is None or len(t) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"host": pa.array([], pa.string()),
                             "n_docs": z, "sum_tokens": z})
        g = t.group_by("host").aggregate([("n_docs", "sum"),
                                          ("sum_tokens", "sum")])
        return pa.table({"host": g["host"],
                         "n_docs": g["n_docs_sum"].cast(pa.int64()),
                         "sum_tokens": g["sum_tokens_sum"].cast(pa.int64())})

    return hash_partition_map(hosted, "_part", _reduce, n_parts,
                              map_fn=_partial,
                              map_chunk_rows=cfg.batch_size)


def _trim_topk_per_host(tab: pa.Table, k: int) -> pa.Table:
    """Keep each host's top-``k`` rows by (n_tokens desc, doc_id asc)
    and attach the 1-based rank.  Pure Arrow sort + numpy run walk —
    shared by the map-side combiner and the reduce side (per-batch
    top-k is a valid combiner for grouped top-k: a row outside its
    batch's host-top-k can never enter the global host-top-k)."""
    srt = tab.sort_by([("host", "ascending"), ("n_tokens", "descending"),
                       ("doc_id", "ascending")])
    hosts = srt["host"].combine_chunks()
    first = np.ones(len(srt), dtype=bool)
    if len(srt) > 1:
        first[1:] = ~np.asarray(
            pc.equal(hosts.slice(1), hosts.slice(0, len(srt) - 1)))
    starts = np.flatnonzero(first)
    lens = np.diff(np.append(starts, len(srt)))
    rank = (np.arange(len(srt), dtype=np.int64)
            - np.repeat(starts, lens) + 1)
    mask = rank <= k
    sel = pa.array(np.flatnonzero(mask), pa.int64())
    return pa.table({
        "host": hosts.take(sel),
        "doc_id": srt["doc_id"].combine_chunks().take(sel),
        "n_tokens": srt["n_tokens"].combine_chunks().take(sel),
        "rank": pa.array(rank[mask], pa.int64()),
    })


def host_top_docs(ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                  url_col: str = "url", text_col: str = "text",
                  id_col: str = "doc_id", k: int = 3):
    """→ Dataset(host, doc_id, n_tokens, rank): each host's top-``k``
    documents by whitespace-token count (n_tokens desc, doc_id asc
    tie-break) — the grouped-top-k pattern (SQL ``row_number() OVER
    (PARTITION BY host ...)``) a curation pipeline uses to pull
    representative pages per domain.

    Physical plan: grouped top-k is a monotone combiner, so the map
    side trims each batch to its own per-host top-k BEFORE the
    exchange — at most k rows per distinct host per batch travel —
    then one hash exchange on the host and the same trim again."""
    n_parts = cfg.resolved_partitions()
    hosted = with_host(ds, url_col=url_col)

    def _partial(t: pa.Table) -> pa.Table:
        toks = pc.list_value_length(
            pc.split_pattern(pc.fill_null(t[text_col], ""), " "))
        trimmed = _trim_topk_per_host(pa.table({
            "host": t["host"],
            "doc_id": t[id_col].cast(pa.int64()),
            "n_tokens": toks.cast(pa.int64()),
        }), k).drop_columns(["rank"])
        h = hash_utf8_array(trimmed["host"].combine_chunks())
        return trimmed.append_column(
            "_part", pa.array((h % np.uint64(n_parts)).astype(np.int64),
                              pa.int64()))

    empty = pa.table({"host": pa.array([], pa.string()),
                      "doc_id": pa.array([], pa.int64()),
                      "n_tokens": pa.array([], pa.int64()),
                      "rank": pa.array([], pa.int64())})

    def _reduce(t: pa.Table | None) -> pa.Table:
        if t is None or len(t) == 0:
            return empty
        return _trim_topk_per_host(t, k)

    return hash_partition_map(hosted, "_part", _reduce, n_parts,
                              map_fn=_partial,
                              map_chunk_rows=cfg.batch_size)


def filter_domains(ds, blocklist, url_col: str = "url",
                   keep_host_col: str | None = "host"):
    """Drop every row whose host is in ``blocklist`` (exact string
    match after extraction).  The blocklist ships by closure — it is a
    curated list, small by definition; a corpus-derived drop set should
    go through domain_stats + a threshold instead."""
    vset = pa.array(sorted(set(blocklist)), pa.string())
    hosted = with_host(ds, url_col=url_col)

    def _filter(t: pa.Table) -> pa.Table:
        bad = pc.fill_null(pc.is_in(t["host"], value_set=vset), False)
        out = t.filter(pc.invert(bad))
        if keep_host_col is None:
            out = out.drop_columns(["host"])
        elif keep_host_col != "host":
            out = out.rename_columns(
                [keep_host_col if c == "host" else c
                 for c in out.column_names])
        return out

    return hosted.map_batches(_filter, batch_format="pyarrow",
                              zero_copy_batch=True)
