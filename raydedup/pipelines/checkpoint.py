"""Stage-granular checkpointing with per-partition lineage + counters.

Ray Data cannot resume a half-done shuffle (SURVEY.md §7), so
resumability is built at stage boundaries: every stage's output is
written to partitioned Parquet under ``<root>/<stage>/data/`` with a
``_MANIFEST.json`` recording the signature-relevant config hash, the
extractor version, row count, per-file row counts (the per-partition
lineage), and a completeness flag.  A resumed run re-reads any stage
whose manifest matches and is complete, and recomputes from the first
stage that doesn't — the analogue at job scale of the reference's CSR
side-dump + reload (main.cpp:124-135, 313-332).

Writes are atomic: data lands in ``data.tmp/`` and is renamed to
``data/`` before the manifest is written; a crash mid-write leaves no
valid manifest, so the stage simply recomputes.
"""

from __future__ import annotations

import json
import os
import shutil

from ..config import PipelineConfig
from ..functions.text import SHINGLE_KERNEL_VERSION
from ..sources.pages import EXTRACTOR_VERSION

MANIFEST = "_MANIFEST.json"


class CheckpointManager:
    def __init__(self, root: str, cfg: PipelineConfig):
        self.root = root
        self.cfg = cfg
        self.events: list[tuple[str, str]] = []  # (stage, "hit"|"computed")
        os.makedirs(root, exist_ok=True)

    def _paths(self, stage: str):
        d = os.path.join(self.root, stage)
        return d, os.path.join(d, "data"), os.path.join(d, MANIFEST)

    def is_complete(self, stage: str) -> bool:
        _, data_dir, man_path = self._paths(stage)
        if not os.path.exists(man_path):
            return False
        try:
            with open(man_path) as f:
                man = json.load(f)
        except (json.JSONDecodeError, OSError):
            return False
        return (man.get("complete") is True
                and man.get("config_hash") == self.cfg.config_hash()
                and man.get("extractor_version") == EXTRACTOR_VERSION
                and man.get("shingle_kernel_version", 1)  # pre-field = v1
                == SHINGLE_KERNEL_VERSION
                and os.path.isdir(data_dir))

    def stage(self, name: str, compute_fn, counters=None):
        """Return the stage's Dataset, recomputing only when no valid
        checkpoint exists.  ``compute_fn() -> Dataset``.

        ``counters``: a dict, or a zero-arg callable evaluated AFTER the
        stage's data is fully written (so fire-and-forget counter-actor
        increments from the stage's tasks have landed) — its result goes
        into the manifest's ``counters`` slot along with the stage wall
        time."""
        import time

        import ray.data as rd

        stage_dir, data_dir, man_path = self._paths(name)
        if self.is_complete(name):
            self.events.append((name, "hit"))
            return rd.read_parquet(data_dir)

        t0 = time.perf_counter()
        ds = compute_fn()
        tmp_dir = data_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(data_dir, ignore_errors=True)
        os.makedirs(stage_dir, exist_ok=True)
        ds.write_parquet(tmp_dir)
        os.rename(tmp_dir, data_dir)
        wall_s = round(time.perf_counter() - t0, 3)

        files = sorted(f for f in os.listdir(data_dir)
                       if f.endswith(".parquet"))
        import pyarrow.parquet as pq
        per_file = {f: pq.read_metadata(os.path.join(data_dir, f)).num_rows
                    for f in files}
        ctr = dict(counters() if callable(counters) else (counters or {}))
        ctr["wall_s"] = wall_s
        manifest = {
            "stage": name,
            "complete": True,
            "config_hash": self.cfg.config_hash(),
            "extractor_version": EXTRACTOR_VERSION,
            "shingle_kernel_version": SHINGLE_KERNEL_VERSION,
            "rows": int(sum(per_file.values())),
            "partitions": per_file,          # per-partition lineage
            "counters": ctr,
        }
        with open(man_path + ".tmp", "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.rename(man_path + ".tmp", man_path)
        self.events.append((name, "computed"))
        return rd.read_parquet(data_dir)

    def manifest(self, stage: str) -> dict | None:
        _, _, man_path = self._paths(stage)
        if not os.path.exists(man_path):
            return None
        with open(man_path) as f:
            return json.load(f)


def near_dup_pipeline_checkpointed(docs, cfg: PipelineConfig, ckpt_root: str,
                                   id_col: str = "doc_id",
                                   text_col: str = "text"):
    """The flagship pipeline with stage checkpoints: signatures →
    candidate pairs → verified pairs → component labels.  Re-running
    with the same config resumes after the last complete stage; any
    config change invalidates every stage (config hash mismatch).

    Returns (labels_ds, manager) so callers can inspect lineage.
    """
    from ..stages.cc import connected_components
    from ..stages.lsh import candidate_pairs, explode_bands
    from ..stages.signatures import signatures
    from ..stages.verify import verify_pairs
    from ..state import RunCounters

    mgr = CheckpointManager(ckpt_root, cfg)
    rc = RunCounters()
    mgr.run_counters = rc
    _snap: dict = {}

    def _delta():
        """Counter-actor values accrued since the previous stage — each
        manifest records only its own stage's increments."""
        cur = {k: v for k, v in rc.get().items()
               if not k.startswith("time_")}
        d = {k: v - _snap.get(k, 0) for k, v in cur.items()
             if v - _snap.get(k, 0)}
        _snap.clear()
        _snap.update(cur)
        return d

    sig = mgr.stage(
        "signatures",
        lambda: signatures(docs, cfg, id_col=id_col, text_col=text_col,
                           with_simhash=False),
        counters=_delta,
    )
    cands = mgr.stage(
        "candidates",
        lambda: candidate_pairs(explode_bands(sig, cfg, id_col=id_col), cfg,
                                id_col=id_col, counters=rc.actor),
        counters=_delta,
    )
    pairs = mgr.stage(
        "verified_pairs",
        lambda: verify_pairs(cands, sig, cfg, id_col=id_col),
        counters=lambda: {"candidates_in": cands.count(), **_delta()},
    )
    labels = mgr.stage(
        "components",
        lambda: connected_components(pairs.select_columns(["a", "b"]), cfg,
                                     counters=rc.actor),
        counters=lambda: {"pairs_in": pairs.count(), **_delta()},
    )
    return labels, mgr
