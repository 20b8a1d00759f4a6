"""Checkpoint/resume manifest for iterative jobs.

Every iteration of an iterative kernel (PageRank, CC, LP, coloring) may
write its state DataFrame as a parquet snapshot plus a JSON manifest line:

    {checkpoint_dir}/
      manifest.jsonl            # one line per completed iteration
      iter_00007/state.parquet  # the iterate

A line is appended only AFTER the parquet write finishes, so a killed job
leaves either a complete iteration or nothing — resume picks the last
complete line and continues mid-loop (north-rule requirement: "resumable
from checkpoint with per-partition lineage + metrics"). Per-partition
lineage = the parquet files themselves (one per partition) referenced by the
manifest entry; metrics (L1/L-inf residual, rows shuffled, wall time) ride
in the same line.

The reference has no analogue (its state is a single in-RAM array); this is
the distributed replacement for its O(1) mutable state.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession


@dataclass
class IterationMetrics:
    iteration: int
    l1_residual: float
    linf_residual: float
    rows_shuffled: int
    wall_s: float
    extra: dict[str, Any] = field(default_factory=dict)


class CheckpointManager:
    """Writes/reads iteration snapshots + manifest for one iterative run."""

    def __init__(self, checkpoint_dir: str | None, interval: int = 5):
        self.dir = checkpoint_dir
        self.interval = max(1, interval)
        if self.dir:
            os.makedirs(self.dir, exist_ok=True)

    @property
    def manifest_path(self) -> str:
        assert self.dir
        return os.path.join(self.dir, "manifest.jsonl")

    def should_snapshot(self, iteration: int) -> bool:
        return bool(self.dir) and iteration % self.interval == 0

    def write(self, state: DataFrame, metrics: IterationMetrics,
              snapshot: bool | None = None) -> None:
        """Append a manifest line; optionally persist the iterate as parquet."""
        if not self.dir:
            return
        snap = self.should_snapshot(metrics.iteration) if snapshot is None else snapshot
        entry = asdict(metrics)
        entry["ts"] = time.time()
        if snap:
            path = self._iter_path(metrics.iteration)
            state.write.mode("overwrite").parquet(path)
            entry["snapshot"] = path
            entry["partitions"] = [
                f for f in sorted(os.listdir(path)) if f.endswith(".parquet")
            ]
        with open(self.manifest_path, "a") as fh:
            fh.write(json.dumps(entry) + "\n")

    def _iter_path(self, iteration: int) -> str:
        assert self.dir
        return os.path.join(self.dir, f"iter_{iteration:05d}", "state.parquet")

    def entries(self) -> list[dict[str, Any]]:
        if not self.dir or not os.path.exists(self.manifest_path):
            return []
        with open(self.manifest_path) as fh:
            return [json.loads(line) for line in fh if line.strip()]

    def latest_snapshot(self) -> dict[str, Any] | None:
        """Last manifest entry that has a readable parquet snapshot."""
        for entry in reversed(self.entries()):
            path = entry.get("snapshot")
            if path and os.path.exists(os.path.join(path, "_SUCCESS")):
                return entry
        return None

    def resume(self, spark: SparkSession,
               required_columns: tuple[str, ...] | None = None,
               ) -> tuple[DataFrame, int] | None:
        """(state, iteration) of the last complete snapshot, or None.

        ``required_columns`` guards against resuming a checkpoint written
        by a DIFFERENT strategy (e.g. min-label CC writes (id, component)
        state while star CC writes (src, dst) edge state): a mismatch
        raises a descriptive ValueError here instead of an opaque
        AnalysisException deep inside the resumed iteration."""
        entry = self.latest_snapshot()
        if entry is None:
            return None
        df = spark.read.parquet(entry["snapshot"])
        if required_columns and not set(required_columns) <= set(df.columns):
            raise ValueError(
                f"checkpoint snapshot '{entry['snapshot']}' holds columns "
                f"{sorted(df.columns)} but this operator resumes "
                f"{sorted(required_columns)} state — the directory was "
                "probably written by a different strategy; resume it with "
                "the strategy that wrote it")
        return df, int(entry["iteration"])
