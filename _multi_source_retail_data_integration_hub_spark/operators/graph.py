"""Connected components over a pair list — the clustering step that
turns near-duplicate PAIRS (LSH candidates, cosine near-dups, exact
hash matches) into dedup DECISIONS: every document gets a cluster id
(the minimum doc id in its component) and a pipeline keeps one canonical
doc per cluster.

Algorithm: iterative min-label propagation. Each round every node
adopts the smallest label among itself and its neighbors; convergence
takes O(component diameter) rounds — for dedup graphs components are
tiny chains (original + its mutations), so 3-5 rounds in practice.
Each round is one equi-join + one min-aggregation (both plain shuffles
Catalyst plans as hash joins/aggs), and ``localCheckpoint`` truncates
the lineage so the plan doesn't grow exponentially with iterations.
The result is the unique fixpoint — deterministic regardless of
iteration order or partitioning.

This is genuinely iterative (not SQL-expressible in one pass); the
DuckDB oracle twin replays it with a recursive CTE, which IS
expressible because test components are small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .checkpointing import materialize


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, cluster_id) for every node appearing in ``pairs``.

    ``cluster_id`` = min node id in the connected component. Nodes with
    no edges don't appear (callers union singletons back if they need
    total coverage). Raises if the propagation hasn't converged after
    ``max_iter`` rounds (diameter > max_iter — raise the budget).

    ``checkpoint_dir``: unset, per-round materialization uses
    ``localCheckpoint`` (fast; an executor loss kills the job, which
    then restarts from the pair list — acceptable for audit queries).
    For production dedup over a 100 TB corpus pass a reliable FS path:
    each round's labels are then checkpointed durably, so an executor
    loss mid-propagation re-reads the last round instead of restarting
    the whole fixpoint. See ``operators.checkpointing``.
    """
    e = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = materialize(sym.distinct(), checkpoint_dir)

    labels = materialize(
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node")),
        checkpoint_dir,
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        # the convergence flag rides along in the SAME round (labels
        # only ever decrease, so changed == nbr_label < label) — the
        # count below reads the checkpointed result instead of paying
        # an extra old-vs-new join + shuffle per iteration
        new_labels = materialize(
            labels.join(nbr_min, labels.node == nbr_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
                (F.coalesce("nbr_label", F.col("label")) < F.col("label")).alias(
                    "chg"
                ),
            ),
            checkpoint_dir,
        )
        changed = new_labels.where("chg").count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            return labels.select("node", F.col("label").alias("cluster_id"))
    raise RuntimeError(
        f"connected_components: no fixpoint after {max_iter} rounds "
        "(component diameter exceeds budget)"
    )
