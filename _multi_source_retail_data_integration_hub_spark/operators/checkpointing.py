"""Lineage-truncation helper shared by iterative/multi-consumer plans.

Two truncation modes, one switch:

- ``checkpoint_dir=None`` -> ``localCheckpoint``: blocks live on
  executor local storage. Fast (no replication, no FS round-trip) and
  self-cleaning (ContextCleaner reclaims blocks when the DataFrame is
  garbage-collected) — but NOT fault-tolerant: losing an executor loses
  its blocks, and because the lineage was truncated Spark cannot
  recompute them, so the job dies and must restart from the beginning.
  Right for bench/audit queries and anything cheap to rerun.

- ``checkpoint_dir="/reliable/fs/path"`` -> reliable ``checkpoint``:
  blocks are written to a fault-tolerant filesystem (HDFS/S3/local dir
  on local mode). An executor loss costs only the re-read of the
  checkpointed partitions — the 100-TB-scale recovery story for
  multi-hour production sinks, at the price of one extra write+read of
  the materialized data. Files persist after the job (Spark only
  auto-cleans with ``spark.cleaner.referenceTracking.cleanCheckpoints``)
  so production schedulers should point this at a per-run directory
  they prune.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame, checkpoint_dir: str | None = None) -> DataFrame:
    """Materialize ``df`` once and truncate its lineage.

    See the module docstring for the durability trade-off. The reliable
    path sets the SparkContext checkpoint dir (a context-global setting;
    last caller wins, which is safe because the dir only namespaces
    where block files land).
    """
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=True)
    sc = df.sparkSession.sparkContext
    sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=True)
