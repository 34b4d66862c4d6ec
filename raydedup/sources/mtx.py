"""MatrixMarket-style edge-list fixtures + format conversion.

The reference's file surface (SURVEY.md §2.1): an ``.mtx`` text
reader/writer pair (readMtxToCSR.cpp:49-115, 249-283), a binary format
with a self-describing header (CSRFileHeader, readMtxToCSR.hpp:44-64),
a header inspector (readCSRHeader.cpp) and an any-to-any converter with
reverse-edge / weight-drop controls (fileConvert.cpp).  Re-expressed:

* mtx text ↔ ``Dataset[{src, dst, weight}]`` — test-fixture scale,
  preserving the reference's header semantics (symmetry → undirected,
  ``pattern`` → unweighted, 1-indexed coordinates).
* Parquet with key-value metadata as the self-describing binary format
  (counts + flags in the schema metadata = the CSRFileHeader).
* ``inspect`` / ``convert`` as library functions (CLI in tools/).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

META_PREFIX = b"raydedup."


def read_mtx(path: str):
    """MTX file → (Dataset[{src,dst,weight}] 0-indexed, header dict).

    Header contract (readMtxToCSR.cpp:56-87): ``%%MatrixMarket matrix
    coordinate <field> <symmetry>``; field=pattern → unweighted (weight
    1.0, readMtxToCSR.cpp:41-44); symmetry=symmetric → undirected.
    Coordinates are 1-indexed in the file, shifted to 0 on read
    (readMtxToCSR.cpp:161-162).
    """
    import ray.data as rd

    with open(path) as f:
        first = f.readline().strip()
    parts = first.split()
    if len(parts) < 5 or not first.startswith("%%MatrixMarket"):
        raise ValueError(f"not a MatrixMarket header: {first!r}")
    field, symmetry = parts[3], parts[4]
    header = {
        "is_weighted": field != "pattern",
        "is_directed": symmetry != "symmetric",
    }

    # driver-side parse (the reference reads MTX single-threaded too,
    # readMtxToCSR.cpp:49): MTX is a test-fixture format here — the
    # production interchange format is Parquet.  Line-parallel parsing
    # can't distinguish the size line from a 3-token coordinate line
    # without global line numbers.
    src, dst, w = [], [], []
    size_seen = False
    with open(path) as f:
        f.readline()  # banner
        for line in f:
            s = line.strip()
            if not s or s.startswith("%"):
                continue
            if not size_seen:
                size_seen = True  # the "rows cols nnz" size line
                continue
            toks = s.split()
            src.append(int(toks[0]) - 1)
            dst.append(int(toks[1]) - 1)
            w.append(float(toks[2]) if len(toks) > 2 and header["is_weighted"]
                     else 1.0)
    tab = pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64()),
        "weight": pa.array(w, pa.float64()),
    })
    return rd.from_arrow(tab), header


def write_mtx(ds, path: str, *, is_weighted: bool = True,
              is_directed: bool = True, num_verts: int | None = None):
    """Dataset[{src,dst[,weight]}] → MTX text file.  Output is re-sorted
    destination-major (the reference's ``mtx_less`` contract,
    readMtxToCSR.cpp:22-32, 272-273) and shifted to 1-indexing.
    Symmetric output keeps one direction only (main.cpp:307-312)."""
    out = ds
    if not is_directed:
        import pyarrow.compute as pc
        out = out.map_batches(
            lambda t: t.filter(pc.less_equal(t["src"], t["dst"])),
            batch_format="pyarrow",
        )
    df = out.sort(["dst", "src"]).to_pandas()   # dest-major ordering
    if num_verts is not None:
        nv = num_verts
    else:
        nv = int(max(df["src"].max(), df["dst"].max()) + 1) if len(df) else 0
    field = "real" if is_weighted else "pattern"
    symmetry = "general" if is_directed else "symmetric"
    with open(path, "w") as f:
        f.write(f"%%MatrixMarket matrix coordinate {field} {symmetry}\n")
        f.write(f"{nv} {nv} {len(df)}\n")
        if is_weighted and "weight" in df.columns:
            for s, d, w in zip(df["src"], df["dst"], df["weight"]):
                f.write(f"{s + 1} {d + 1} {w:g}\n")
        else:
            for s, d in zip(df["src"], df["dst"]):
                f.write(f"{s + 1} {d + 1}\n")


def write_edges_parquet(ds, path: str, *, is_weighted: bool,
                        is_directed: bool, has_reverse_edges: bool,
                        is_zero_indexed: bool = True):
    """Edge Dataset → Parquet with the CSRFileHeader flags as key-value
    schema metadata (readMtxToCSR.hpp:44-64 reborn as Arrow metadata)."""
    import ray

    tabs = [ray.get(r) for r in ds.to_arrow_refs()]
    tab = pa.concat_tables([t for t in tabs if len(t)])
    n_verts = int(max(tab["src"].to_pandas().max() if len(tab) else 0,
                      tab["dst"].to_pandas().max() if len(tab) else 0) + 1) \
        if len(tab) else 0
    meta = {
        b"raydedup.format_version": b"2",
        b"raydedup.num_verts": str(n_verts).encode(),
        b"raydedup.num_edges": str(len(tab)).encode(),
        b"raydedup.is_weighted": str(int(is_weighted)).encode(),
        b"raydedup.is_directed": str(int(is_directed)).encode(),
        b"raydedup.has_reverse_edges": str(int(has_reverse_edges)).encode(),
        b"raydedup.is_zero_indexed": str(int(is_zero_indexed)).encode(),
    }
    tab = tab.replace_schema_metadata({**(tab.schema.metadata or {}), **meta})
    pq.write_table(tab, path)


def inspect_parquet(path: str) -> dict:
    """readCSRHeader analogue: schema + raydedup.* metadata + row count."""
    md = pq.read_metadata(path)
    schema = pq.read_schema(path)
    out = {
        "num_rows": md.num_rows,
        "num_row_groups": md.num_row_groups,
        "columns": {f.name: str(f.type) for f in schema},
    }
    kv = schema.metadata or {}
    for k, v in kv.items():
        if k.startswith(META_PREFIX):
            out[k.decode()[len("raydedup."):]] = v.decode()
    return out


_CSR_VERSION = 2
_CSR_FLAG_BITS = ("is_weighted", "is_zero_indexed", "is_directed",
                  "has_reverse_edges", "is_vertex_t64", "is_edge_t64",
                  "is_weight_t64")


def read_csr_header(path: str) -> dict:
    """Parse the reference's binary ``.csr`` 32-byte header
    (CSRFileHeader, readMtxToCSR.hpp:44-64): three little-endian int64s
    (version, numVerts, numEdges) followed by an int64-aligned bitfield
    (bit 0 = isWeighted ... bit 6 = isWeightT64, x86 bitfield order)."""
    with open(path, "rb") as f:
        raw = f.read(32)
    if len(raw) < 32:
        raise ValueError(f"{path}: truncated .csr header")
    version, nv, ne, flags = np.frombuffer(raw, dtype="<i8")
    if version != _CSR_VERSION:
        raise ValueError(f"{path}: unsupported .csr format version {version}")
    out = {"format_version": int(version), "num_verts": int(nv),
           "num_edges": int(ne)}
    for i, name in enumerate(_CSR_FLAG_BITS):
        out[name] = bool((int(flags) >> i) & 1)
    return out


def read_csr_binary(path: str):
    """Reference binary ``.csr`` → (edge pa.Table(src,dst[,weight]),
    header dict).  Mirrors FileToCSR/CSRFileReader
    (readMtxToCSR.cpp:338-395): offsets are stored in the EDGE type,
    indices in the vertex type, weights in float/double per the header's
    width flags.  Edge rows come out 0-indexed (dst shifted down when
    the header says 1-indexed), source-major — the same normal form
    read_mtx produces.  Driver-side by design: this is the reference's
    fixture/interchange format, not the corpus path."""
    header = read_csr_header(path)
    et = "<i8" if header["is_edge_t64"] else "<i4"
    vt = "<i8" if header["is_vertex_t64"] else "<i4"
    wt = "<f8" if header["is_weight_t64"] else "<f4"
    nv, ne = header["num_verts"], header["num_edges"]
    with open(path, "rb") as f:
        f.seek(32)
        offsets = np.fromfile(f, dtype=et, count=nv + 1).astype(np.int64)
        indices = np.fromfile(f, dtype=vt, count=ne).astype(np.int64)
        weights = (np.fromfile(f, dtype=wt, count=ne).astype(np.float64)
                   if header["is_weighted"] else None)
    if len(offsets) != nv + 1 or len(indices) != ne:
        raise ValueError(f"{path}: truncated .csr payload")
    src = np.repeat(np.arange(nv, dtype=np.int64),
                    np.diff(offsets)) if nv else np.empty(0, np.int64)
    dst = indices if header["is_zero_indexed"] else indices - 1
    cols = {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
    if weights is not None:
        cols["weight"] = pa.array(weights, pa.float64())
    return pa.table(cols), header


def write_csr_binary(path: str, tab: pa.Table, *, is_weighted: bool,
                     is_directed: bool, has_reverse_edges: bool,
                     num_verts: int | None = None,
                     vertex_t64: bool = False, edge_t64: bool = False,
                     weight_t64: bool = False) -> dict:
    """Edge table (0-indexed src/dst[, weight]) → reference binary
    ``.csr`` (CSRToFile, readMtxToCSR.cpp:285-336): header + offsets
    (edge type) + indices (vertex type) + optional weights.  Rows are
    CSR-ified source-major; the file is written 0-indexed."""
    import pandas as pd

    df = tab.select(["src", "dst"] + (["weight"] if is_weighted else [])) \
        .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    if num_verts is not None:
        nv = num_verts
    else:
        nv = int(max(df["src"].max(), df["dst"].max()) + 1) if len(df) else 0
    ne = len(df)
    counts = np.bincount(df["src"].to_numpy(), minlength=nv) if nv \
        else np.empty(0, np.int64)
    offsets = np.zeros(nv + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    # auto-promote widths: a silent .astype('<i4') wrap would corrupt
    # the file (the reference selects widths via its template flags)
    if ne >= 2 ** 31:
        edge_t64 = True
    if nv > 2 ** 31:          # vertex ids go up to nv-1
        vertex_t64 = True
    flags = (int(is_weighted) | (1 << 1)                 # always 0-indexed
             | (int(is_directed) << 2) | (int(has_reverse_edges) << 3)
             | (int(vertex_t64) << 4) | (int(edge_t64) << 5)
             | (int(weight_t64) << 6))
    et = "<i8" if edge_t64 else "<i4"
    vt = "<i8" if vertex_t64 else "<i4"
    wt = "<f8" if weight_t64 else "<f4"
    with open(path, "wb") as f:
        np.asarray([_CSR_VERSION, nv, ne, flags], dtype="<i8").tofile(f)
        offsets.astype(et).tofile(f)
        df["dst"].to_numpy().astype(vt).tofile(f)
        if is_weighted:
            df["weight"].to_numpy().astype(wt).tofile(f)
    return read_csr_header(path)


def convert(in_path: str, out_path: str, *, keep_reverse_edges: bool = False,
            drop_weights: bool = False, cfg=None):
    """fileConvert analogue: any↔any between .mtx and .parquet with
    reverse-edge generation/removal and weight drop (fileConvert.cpp:28-174;
    env overrides CONVERT_FORCE_* become keyword args)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ..config import DEFAULT_CONFIG
    from ..stages.graph import symmetrize

    cfg = cfg or DEFAULT_CONFIG
    if in_path.endswith(".mtx"):
        ds, header = read_mtx(in_path)
        is_weighted = header["is_weighted"] and not drop_weights
        is_directed = header["is_directed"]
    elif in_path.endswith(".csr"):
        tab, header = read_csr_binary(in_path)
        ds = rd.from_arrow(tab)
        is_weighted = header["is_weighted"] and not drop_weights
        is_directed = header["is_directed"]
    elif in_path.endswith(".parquet"):
        info = inspect_parquet(in_path)
        ds = rd.read_parquet(in_path)
        is_weighted = info.get("is_weighted", "1") == "1" and not drop_weights
        is_directed = info.get("is_directed", "1") == "1"
    else:
        raise ValueError(f"unknown input format: {in_path}")

    if drop_weights and "weight" in ds.schema().names:
        ds = ds.map_batches(
            lambda t: t.drop_columns(["weight"]), batch_format="pyarrow")

    if keep_reverse_edges and not is_directed:
        ds = symmetrize(ds, cfg)
    elif not keep_reverse_edges and not is_directed:
        ds = ds.map_batches(
            lambda t: t.filter(pc.less_equal(t["src"], t["dst"])),
            batch_format="pyarrow",
        )

    if out_path.endswith(".mtx"):
        write_mtx(ds, out_path, is_weighted=is_weighted,
                  is_directed=is_directed or keep_reverse_edges)
    elif out_path.endswith(".csr"):
        import ray
        tab = pa.concat_tables(
            [t for t in (ray.get(r) for r in ds.to_arrow_refs()) if len(t)]
            or [pa.table({"src": pa.array([], pa.int64()),
                          "dst": pa.array([], pa.int64())})])
        write_csr_binary(out_path, tab, is_weighted=is_weighted,
                         is_directed=is_directed,
                         has_reverse_edges=keep_reverse_edges)
    elif out_path.endswith(".parquet"):
        write_edges_parquet(ds, out_path, is_weighted=is_weighted,
                            is_directed=is_directed,
                            has_reverse_edges=keep_reverse_edges)
    else:
        raise ValueError(f"unknown output format: {out_path}")
