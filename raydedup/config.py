"""Pipeline configuration.

The reference engine's user-extension surface is a set of env vars and
compile-time gates (``JACCARD_FORCE_*``, ``CONVERT_FORCE_*`` — see
/root/reference/main.cpp:40-61,139-155 and fileConvert.cpp:43-47).  Here
the whole surface is one frozen dataclass: every stage takes a
``PipelineConfig`` so "same shingle/signature config" is a well-defined,
hashable statement (the recall gate of BASELINE.json depends on it).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field, replace


@dataclass(frozen=True)
class PipelineConfig:
    # --- shingling ---
    k_shingle: int = 5              # word-level k-gram shingles
    # --- MinHash ---
    num_perms: int = 128            # signature length
    # "oph": one-permutation hashing + rotation densification (one O(M)
    #   pass — the scale default; same LSH collision family);
    # "perm": 128 independent permutation functions (the literal
    #   k-permutation construction; ~50x more hashing work)
    minhash_mode: str = "oph"
    # --- LSH banding: bands * rows_per_band must == num_perms ---
    bands: int = 32
    rows_per_band: int = 4
    # --- SimHash ---
    simhash_bits: int = 64
    simhash_hamming_max: int = 3    # max Hamming distance for simhash dup pairs
    # --- verification ---
    verify_threshold: float = 0.8   # exact-Jaccard acceptance threshold
    # --- determinism ---
    seed: int = 42
    # --- skew handling ---
    band_bucket_cap: int = 512      # max docs considered per LSH bucket (B^2 blowup cap)
    # --- connected components ---
    cc_max_iters: int = 50
    # --- execution ---
    batch_size: int = 1024          # rows per map_batches call for text
    # stages: ~300-token docs × 1024 keeps each task's working set inside
    # shared L3 — 2048 measured 2x slower at 32 concurrent workers
    minhash_perm_chunk: int = 16    # perms computed per vectorized pass (memory cap)
    num_partitions: int = 32        # hash-join / shuffle partition cap

    def resolved_partitions(self) -> int:
        """Join/shuffle partition count: the configured value, floored at
        8.  Deliberately NOT scaled by the live CPU count — partitioning
        is a property of the DATA (blocks must fit worker heaps), and a
        cluster-size-dependent partition count would make the same job
        physically different at N vs 4N nodes (reduce tasks beyond the
        CPU count simply queue; they are raw tasks, not actors)."""
        return max(8, self.num_partitions)

    def __post_init__(self) -> None:
        if self.bands * self.rows_per_band != self.num_perms:
            raise ValueError(
                f"bands*rows_per_band ({self.bands}*{self.rows_per_band}) "
                f"!= num_perms ({self.num_perms})"
            )

    # Pure execution tuning: changing these cannot change any output, so
    # they are excluded from config_hash (everything else invalidates
    # checkpoints — see CheckpointManager.is_complete).
    #
    # INVARIANT this rests on: batch_size doubles as the fused
    # exchanges' map_chunk_rows (hash_partition_map(map_fn=...)), so
    # every fused map_fn MUST be strictly per-row-deterministic — its
    # output for a row may not depend on which other rows share the
    # chunk.  A future map_fn with cross-row state must either be kept
    # out of checkpointed stages or batch_size must move out of
    # _TUNING_ONLY (stale checkpoints would otherwise survive a
    # batch-size change that alters results).
    _TUNING_ONLY = ("batch_size", "minhash_perm_chunk", "num_partitions")

    def config_hash(self) -> str:
        """Stable hash of every result-affecting config field; stamped into
        checkpoint manifests + parquet metadata (the analogue of the
        reference's CSRFileHeader flags, readMtxToCSR.hpp:44-64).

        Hashes all fields EXCEPT the execution-tuning knobs in
        ``_TUNING_ONLY`` so that a new output-affecting field added later
        invalidates old checkpoints by default.
        """
        sig = {
            k: v
            for k, v in asdict(self).items()
            if k not in self._TUNING_ONLY
        }
        return hashlib.sha256(json.dumps(sig, sort_keys=True).encode()).hexdigest()[:16]

    def with_(self, **kw) -> "PipelineConfig":
        return replace(self, **kw)


DEFAULT_CONFIG = PipelineConfig()
