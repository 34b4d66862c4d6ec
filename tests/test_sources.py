"""Source/sink parity tests: MTX fixtures, parquet headers, conversion
(the reference's file-format surface, SURVEY.md §2.1)."""

import os

import numpy as np
import pyarrow as pa
import pytest

from raydedup.config import PipelineConfig

CFG = PipelineConfig(num_partitions=2)

MTX_GENERAL = """%%MatrixMarket matrix coordinate real general
% a comment line
4 4 5
1 2 1.5
2 1 1.5
1 3 2.0
3 4 0.5
4 4 9.0
"""

MTX_PATTERN_SYM = """%%MatrixMarket matrix coordinate pattern symmetric
3 3 3
1 2
2 3
1 3
"""


class TestMtx:
    def test_read_general_weighted(self, ray_session, tmp_path):
        from raydedup.sources.mtx import read_mtx
        p = tmp_path / "g.mtx"
        p.write_text(MTX_GENERAL)
        ds, header = read_mtx(str(p))
        assert header == {"is_weighted": True, "is_directed": True}
        df = ds.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
        # 1-indexed input shifted to 0-indexed (readMtxToCSR.cpp:161)
        assert df["src"].tolist() == [0, 0, 1, 2, 3]
        assert df["dst"].tolist() == [1, 2, 0, 3, 3]
        assert df["weight"].tolist() == [1.5, 2.0, 1.5, 0.5, 9.0]

    def test_read_pattern_symmetric(self, ray_session, tmp_path):
        from raydedup.sources.mtx import read_mtx
        p = tmp_path / "s.mtx"
        p.write_text(MTX_PATTERN_SYM)
        ds, header = read_mtx(str(p))
        assert header == {"is_weighted": False, "is_directed": False}
        df = ds.to_pandas()
        assert (df["weight"] == 1.0).all()  # pattern → unit weights
        assert len(df) == 3

    def test_roundtrip_dest_major(self, ray_session, tmp_path):
        from raydedup.sources.mtx import read_mtx, write_mtx
        p1 = tmp_path / "in.mtx"
        p1.write_text(MTX_GENERAL)
        ds, header = read_mtx(str(p1))
        p2 = tmp_path / "out.mtx"
        write_mtx(ds, str(p2), is_weighted=True, is_directed=True)
        # output body must be destination-major (readMtxToCSR.cpp:272)
        body = [l for l in p2.read_text().splitlines()[2:] if l]
        coords = [tuple(map(float, l.split()[:2])) for l in body]
        assert coords == sorted(coords, key=lambda c: (c[1], c[0]))
        ds2, _ = read_mtx(str(p2))
        a = ds.to_pandas().sort_values(["src", "dst"]).values.tolist()
        b = ds2.to_pandas().sort_values(["src", "dst"]).values.tolist()
        assert a == b

    def test_parquet_header_inspect(self, ray_session, tmp_path):
        from raydedup.sources.mtx import (inspect_parquet, read_mtx,
                                          write_edges_parquet)
        p1 = tmp_path / "in.mtx"
        p1.write_text(MTX_GENERAL)
        ds, _ = read_mtx(str(p1))
        out = str(tmp_path / "edges.parquet")
        write_edges_parquet(ds, out, is_weighted=True, is_directed=True,
                            has_reverse_edges=False)
        info = inspect_parquet(out)
        assert info["num_rows"] == 5
        assert info["num_verts"] == "4"
        assert info["num_edges"] == "5"
        assert info["is_weighted"] == "1"
        assert info["is_directed"] == "1"
        assert info["has_reverse_edges"] == "0"
        assert info["format_version"] == "2"

    def test_convert_mtx_to_parquet_and_back(self, ray_session, tmp_path):
        from raydedup.sources.mtx import convert, read_mtx
        p1 = tmp_path / "in.mtx"
        p1.write_text(MTX_PATTERN_SYM)
        pq_path = str(tmp_path / "edges.parquet")
        convert(str(p1), pq_path, keep_reverse_edges=True)
        mtx_path = str(tmp_path / "back.mtx")
        convert(pq_path, mtx_path, keep_reverse_edges=True)
        ds2, _ = read_mtx(mtx_path)
        df = ds2.to_pandas()
        # symmetric input with reverse edges generated: 3 edges → 6
        assert len(df) == 6

    def test_convert_drop_weights(self, ray_session, tmp_path):
        from raydedup.sources.mtx import convert, inspect_parquet
        p1 = tmp_path / "in.mtx"
        p1.write_text(MTX_GENERAL)
        out = str(tmp_path / "e.parquet")
        convert(str(p1), out, drop_weights=True)
        info = inspect_parquet(out)
        assert "weight" not in info["columns"]
        assert info["is_weighted"] == "0"


class TestCSRBinary:
    """Reference binary .csr format (CSRFileHeader layout,
    readMtxToCSR.hpp:44-64 / CSRToFile readMtxToCSR.cpp:285-336)."""

    def _edges(self):
        import pyarrow as pa
        return pa.table({
            "src": pa.array([0, 0, 1, 2, 3], pa.int64()),
            "dst": pa.array([1, 2, 2, 3, 0], pa.int64()),
            "weight": pa.array([1.5, 2.0, 0.25, 1.0, 3.0], pa.float64()),
        })

    def test_roundtrip_weighted(self, tmp_path):
        from raydedup.sources.mtx import read_csr_binary, write_csr_binary
        p = str(tmp_path / "g.csr")
        hdr = write_csr_binary(p, self._edges(), is_weighted=True,
                               is_directed=True, has_reverse_edges=False)
        assert hdr["format_version"] == 2
        assert hdr["num_verts"] == 4 and hdr["num_edges"] == 5
        assert hdr["is_weighted"] and hdr["is_directed"]
        assert not hdr["has_reverse_edges"]
        assert hdr["is_zero_indexed"]
        tab, hdr2 = read_csr_binary(p)
        assert hdr2 == hdr
        df = tab.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
        want = self._edges().to_pandas().sort_values(["src", "dst"]) \
            .reset_index(drop=True)
        assert (df["src"] == want["src"]).all()
        assert (df["dst"] == want["dst"]).all()
        # float32 storage (is_weight_t64=False default, like the
        # reference's default -DDISABLE_DP_WEIGHT build)
        import numpy as np
        assert np.allclose(df["weight"], want["weight"], atol=1e-6)

    def test_roundtrip_64bit_types(self, tmp_path):
        from raydedup.sources.mtx import read_csr_binary, write_csr_binary
        p = str(tmp_path / "g64.csr")
        write_csr_binary(p, self._edges(), is_weighted=True,
                         is_directed=False, has_reverse_edges=True,
                         vertex_t64=True, edge_t64=True, weight_t64=True)
        tab, hdr = read_csr_binary(p)
        assert hdr["is_vertex_t64"] and hdr["is_edge_t64"] \
            and hdr["is_weight_t64"]
        assert (tab["weight"].to_numpy()
                == self._edges().to_pandas().sort_values(["src", "dst"])
                ["weight"].to_numpy()).all()

    def test_header_binary_layout_matches_reference(self, tmp_path):
        # byte-level check of the 32-byte header: 3 LE int64 + bitfield
        import numpy as np
        from raydedup.sources.mtx import write_csr_binary
        p = str(tmp_path / "h.csr")
        write_csr_binary(p, self._edges(), is_weighted=True,
                         is_directed=True, has_reverse_edges=False)
        raw = np.fromfile(p, dtype="<i8", count=4)
        assert raw[0] == 2 and raw[1] == 4 and raw[2] == 5
        # bit0 weighted=1, bit1 zeroIndexed=1, bit2 directed=1 → 0b111
        assert raw[3] == 0b0111

    def test_convert_csr_mtx_roundtrip(self, ray_session, tmp_path):
        from raydedup.sources.mtx import convert, read_csr_binary
        p1 = tmp_path / "in.mtx"
        p1.write_text(MTX_GENERAL)
        csr = str(tmp_path / "g.csr")
        convert(str(p1), csr)
        tab, hdr = read_csr_binary(csr)
        back = str(tmp_path / "back.mtx")
        convert(csr, back)
        from raydedup.sources.mtx import read_mtx
        ds1, _ = read_mtx(str(p1))
        ds2, _ = read_mtx(back)
        a = ds1.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
        b = ds2.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
        assert (a[["src", "dst"]] == b[["src", "dst"]]).all().all()

    def test_cli_inspect_csr(self, tmp_path, capsys):
        import json
        from raydedup.__main__ import cmd_inspect
        from raydedup.sources.mtx import write_csr_binary

        class A:
            pass

        a = A()
        p = str(tmp_path / "g.csr")
        write_csr_binary(p, self._edges(), is_weighted=False,
                         is_directed=True, has_reverse_edges=False)
        a.path = p
        cmd_inspect(a)
        out = json.loads(capsys.readouterr().out)
        assert out["num_verts"] == 4 and not out["is_weighted"]
