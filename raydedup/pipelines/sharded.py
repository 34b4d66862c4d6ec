"""Shard-resumable corpus runs: partitioned Parquet output, one
directory per input shard, so a failed 100-TB job skips finished shards
on restart instead of starting over.

A shard is a GROUP OF INPUT FILES (parquet fragments) — the natural
restart granularity for a crawl corpus, where input files are the unit
object storage already provides.  Each shard runs the caller's
transform as its own bounded Ray Data pipeline (the cluster's streaming
executor parallelizes within the shard), writes to ``<shard>.tmp`` and
renames, then drops a manifest recording the input files+sizes, row
count, config hash and transform version.  A shard is skipped on resume
only when its manifest is complete AND still matches config, transform
version and the exact input file list/sizes — a changed or torn shard
recomputes.  Processing shards sequentially on the driver bounds the
object-store working set to one shard regardless of corpus size.

This is the job-level complement of pipelines/checkpoint.py (which is
stage-granular within one pipeline run).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from ..config import DEFAULT_CONFIG, PipelineConfig

MANIFEST = "_MANIFEST.json"


def _expand(input_paths) -> list[str]:
    if isinstance(input_paths, str):
        input_paths = [input_paths]
    files: list[str] = []
    for p in input_paths:
        if os.path.isdir(p):
            files.extend(os.path.join(p, f) for f in os.listdir(p)
                         if f.endswith(".parquet"))
        else:
            files.append(p)
    return sorted(files)


def _input_sig(files: list[str]) -> dict[str, int]:
    return {os.path.basename(f): os.path.getsize(f) for f in files}


def _shard_dir(out_root: str, s: int) -> str:
    return os.path.join(out_root, f"shard={s:05d}")


def _is_complete(sdir: str, cfg: PipelineConfig, transform_version: int,
                 files: list[str]) -> bool:
    man_path = os.path.join(sdir, MANIFEST)
    if not os.path.exists(man_path):
        return False
    try:
        with open(man_path) as f:
            man = json.load(f)
    except (json.JSONDecodeError, OSError):
        return False
    return (man.get("complete") is True
            and man.get("config_hash") == cfg.config_hash()
            and man.get("transform_version") == transform_version
            and man.get("input_files") == _input_sig(files))


def sharded_run(input_paths, out_root: str, transform_fn,
                cfg: PipelineConfig = DEFAULT_CONFIG, *,
                n_shards: int | None = None, columns=None,
                transform_version: int = 1, counters=None) -> dict:
    """Run ``transform_fn(Dataset) -> Dataset`` over every input shard,
    writing ``out_root/shard=NNNNN/`` per shard; returns
    ``{"computed": [...], "skipped": [...], "rows": N}``.

    ``n_shards`` defaults to min(#input files, cfg partitions); a shard
    never splits a file, so at most #files shards exist.
    """
    import ray.data as rd

    files = _expand(input_paths)
    if not files:
        raise ValueError(f"no parquet files under {input_paths!r}")
    if n_shards is None:
        n_shards = cfg.resolved_partitions()
    n_shards = max(1, min(n_shards, len(files)))
    groups = [files[s::n_shards] for s in range(n_shards)]

    os.makedirs(out_root, exist_ok=True)
    computed, skipped, total_rows = [], [], 0
    for s, grp in enumerate(groups):
        sdir = _shard_dir(out_root, s)
        if _is_complete(sdir, cfg, transform_version, grp):
            skipped.append(s)
            continue
        t0 = time.perf_counter()
        out = transform_fn(rd.read_parquet(grp, columns=columns))
        tmp = sdir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(sdir, ignore_errors=True)
        out.write_parquet(tmp)
        os.rename(tmp, sdir)
        import pyarrow.parquet as pq
        rows = sum(pq.read_metadata(os.path.join(sdir, f)).num_rows
                   for f in os.listdir(sdir) if f.endswith(".parquet"))
        man = {
            "complete": True,
            "shard": s,
            "config_hash": cfg.config_hash(),
            "transform_version": transform_version,
            "input_files": _input_sig(grp),
            "rows": int(rows),
            "wall_s": round(time.perf_counter() - t0, 3),
        }
        man_path = os.path.join(sdir, MANIFEST)
        with open(man_path + ".tmp", "w") as f:
            json.dump(man, f, indent=1, sort_keys=True)
        os.rename(man_path + ".tmp", man_path)
        computed.append(s)
        total_rows += rows
    if counters is not None:
        counters.add.remote({"sharded_computed": len(computed),
                             "sharded_skipped": len(skipped)})
    return {"computed": computed, "skipped": skipped,
            "rows": total_rows + sum(
                (m or {}).get("rows", 0)
                for m in (shard_manifest(out_root, s) for s in skipped))}


def shard_manifest(out_root: str, s: int) -> dict | None:
    man_path = os.path.join(_shard_dir(out_root, s), MANIFEST)
    if not os.path.exists(man_path):
        return None
    with open(man_path) as f:
        return json.load(f)


def read_sharded(out_root: str):
    """Dataset over every COMPLETE shard directory (torn shards — data
    present but no manifest — are excluded, matching what a resumed run
    would recompute)."""
    import ray.data as rd
    dirs = sorted(
        os.path.join(out_root, d) for d in os.listdir(out_root)
        if d.startswith("shard=")
        and os.path.exists(os.path.join(out_root, d, MANIFEST)))
    if not dirs:
        raise ValueError(f"no complete shards under {out_root}")
    files = [os.path.join(d, f) for d in dirs for f in sorted(os.listdir(d))
             if f.endswith(".parquet")]
    return rd.read_parquet(files)
