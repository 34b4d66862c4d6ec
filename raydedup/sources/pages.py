"""The Common-Crawl-style ``pages`` table (BASELINE.json input_hint):

    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

Two sources:
  * ``read_pages`` / ``pages_from_documents`` — map the driver testdata
    ``documents`` table into the pages shape (FIXTURES.md §5).
  * html→text extraction — the frozen, versioned extraction function
    whose output must be byte-identical per url (north_rule invariant).
    The html wrapper is exactly invertible so the invariant is testable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

EXTRACTOR_VERSION = "raydedup-extract-v1"
_PREFIX = b"<html><body><p>"
_SUFFIX = b"</p></body></html>"
_EPOCH_US = 1704067200_000_000  # 2024-01-01T00:00:00Z in microseconds


def wrap_html(texts: pa.Array) -> pa.Array:
    """text → html binary (deterministic wrapper; inverse of extract_text)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    joined = pc.binary_join_element_wise(
        pa.scalar(_PREFIX.decode()), texts, pa.scalar(_SUFFIX.decode()), ""
    )
    return joined.cast(pa.binary())


def extract_text(html: pa.Array) -> pa.Array:
    """html binary → text string.  FROZEN (EXTRACTOR_VERSION): the
    north_rule requires byte-identical extracted text per url across
    runs; any change to this function must bump the version, which is
    stamped into checkpoint manifests."""
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    s = html.cast(pa.large_string())
    # strip the known wrapper; unknown layouts pass through unchanged
    pre, suf = _PREFIX.decode(), _SUFFIX.decode()
    has_prefix = pc.starts_with(s, pre)
    stripped = pc.utf8_replace_slice(s, start=0, stop=len(pre), replacement="")
    s = pc.if_else(has_prefix, stripped, s)
    ends = pc.ends_with(s, suf)
    trimmed = pc.utf8_replace_slice(s, start=-len(suf), stop=2**30, replacement="")
    return pc.if_else(ends, trimmed, s).cast(pa.string())


def pages_from_documents_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id,text,lang,source,...) → pages(url, warc_ts, html,
    text, lang) + doc_id carried for oracles."""
    doc_id = np.asarray(batch["doc_id"], dtype=np.int64)
    src = batch["source"].to_pylist()
    url = pa.array([f"{s}/{d}" for s, d in zip(src, doc_id)], type=pa.string())
    ts = pa.array(_EPOCH_US + doc_id * 1_000_000, type=pa.timestamp("us"))
    return pa.table({
        "doc_id": batch["doc_id"],
        "url": url,
        "warc_ts": ts,
        "html": wrap_html(batch["text"]),
        "text": batch["text"],
        "lang": batch["lang"],
    })


def pages_from_documents(sf_dir: str):
    """Read the driver ``documents`` table and shape it into pages."""
    import ray.data as rd
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet")
    return docs.map_batches(pages_from_documents_batch, batch_format="pyarrow",
                            zero_copy_batch=True)


def extract_text_stage(pages_ds):
    """pages(html,...) → + extracted_text column (map_batches, stateless)."""

    def _extract(batch: pa.Table) -> pa.Table:
        return batch.append_column("extracted_text", extract_text(batch["html"]))

    return pages_ds.map_batches(_extract, batch_format="pyarrow", zero_copy_batch=True)
