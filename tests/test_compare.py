"""compareCoords-analogue tests + char-ngram kernel checks."""

import numpy as np
import pyarrow as pa
import pytest

from raydedup.config import PipelineConfig

CFG = PipelineConfig(num_partitions=2)


def _ds(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "a": pa.array([r[0] for r in rows], pa.int64()),
        "b": pa.array([r[1] for r in rows], pa.int64()),
        "jaccard": pa.array([r[2] for r in rows], pa.float64()),
    }))


class TestCompareScores:
    def test_identical(self, ray_session):
        from raydedup.pipelines.compare import compare_scores
        rows = [(0, 1, 0.5), (1, 2, 0.25), (3, 4, 1.0)]
        rep = compare_scores(_ds(rows), _ds(rows), tol=1e-9, cfg=CFG)
        assert rep["matched"] == 3 and rep["warnings"] == 0

    def test_mismatch_missing_added(self, ray_session):
        from raydedup.pipelines.compare import compare_scores
        gold = [(0, 1, 0.5), (1, 2, 0.25), (3, 4, 1.0)]
        test = [(0, 1, 0.5), (1, 2, 0.35), (5, 6, 0.1)]
        rep = compare_scores(_ds(gold), _ds(test), tol=1e-3, cfg=CFG)
        assert rep["matched"] == 2          # (0,1) ok, (1,2) mismatched
        assert rep["mismatched"] == 1
        assert rep["missing"] == 1          # (3,4) gold-only
        assert rep["added"] == 1            # (5,6) test-only
        assert rep["warnings"] == 3
        assert rep["max_abs_diff"] == pytest.approx(0.1)

    def test_within_tolerance(self, ray_session):
        from raydedup.pipelines.compare import compare_scores
        gold = [(0, 1, 0.5)]
        test = [(0, 1, 0.5 + 1e-8)]
        rep = compare_scores(_ds(gold), _ds(test), tol=1e-6, cfg=CFG)
        assert rep["warnings"] == 0


class TestCharNgram:
    def test_matches_python_sets(self):
        from raydedup.functions.text import char_ngram_batch
        texts = ["abcde", "ab", "", "aaaa", "hello world"]
        vals, offs = char_ngram_batch(pa.array(texts), 3)
        for i, t in enumerate(texts):
            want = {t[j:j + 3] for j in range(len(t) - 2)} if len(t) >= 3 else set()
            got = vals[offs[i]:offs[i + 1]]
            assert len(got) == len(want), t
            # values are the packed bytes themselves — decode and compare
            dec = {bytes([int(v) >> 16 & 255, int(v) >> 8 & 255,
                          int(v) & 255]).decode() for v in got}
            assert dec == want, t

    def test_sliced_input(self):
        from raydedup.functions.text import char_ngram_batch
        arr = pa.array(["xxxxx", "abcdef", "zzz"])
        v_all, o_all = char_ngram_batch(arr, 3)
        v_sl, o_sl = char_ngram_batch(arr.slice(1, 2), 3)
        assert (v_sl == v_all[o_all[1]:o_all[3]]).all()


class TestMismatchSamples:
    def test_samples_localize_offenders(self, ray_session):
        import ray.data as rd
        import pyarrow as pa
        from raydedup.pipelines.compare import compare_scores
        gold = rd.from_arrow(pa.table(
            {"a": [1, 2, 3], "b": [4, 5, 6], "jaccard": [0.5, 0.7, 0.9]}))
        test = rd.from_arrow(pa.table(
            {"a": [1, 2, 7], "b": [4, 5, 8], "jaccard": [0.5, 0.75, 0.1]}))
        rep = compare_scores(gold, test, tol=1e-3)
        kinds = {(s["kind"], s["a"], s["b"]) for s in rep["samples"]}
        assert kinds == {("mismatch", 2, 5), ("missing", 3, 6),
                         ("added", 7, 8)}
        mism = next(s for s in rep["samples"] if s["kind"] == "mismatch")
        assert mism["gold"] == 0.7 and mism["test"] == 0.75
        miss = next(s for s in rep["samples"] if s["kind"] == "missing")
        assert miss["test"] is None

    def test_samples_capped_and_deterministic(self, ray_session):
        import numpy as np
        import ray.data as rd
        import pyarrow as pa
        from raydedup.pipelines.compare import compare_scores
        n = 200
        gold = rd.from_arrow(pa.table(
            {"a": np.arange(n), "b": np.arange(n) + 1000,
             "jaccard": np.full(n, 0.5)}))
        test = rd.from_arrow(pa.table(
            {"a": np.arange(n), "b": np.arange(n) + 1000,
             "jaccard": np.full(n, 0.9)}))
        r1 = compare_scores(gold, test, tol=1e-3, max_samples=5)
        r2 = compare_scores(gold, test, tol=1e-3, max_samples=5)
        assert len(r1["samples"]) == 5 and r1["samples"] == r2["samples"]
        assert r1["mismatched"] == n
