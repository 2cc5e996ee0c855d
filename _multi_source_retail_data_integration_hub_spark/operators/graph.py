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
    assume_distinct: bool = False,
) -> DataFrame:
    """(node, cluster_id) for every node appearing in ``pairs``.

    ``assume_distinct``: the caller guarantees ``pairs`` rows are
    unique and canonically oriented (src < dst) — the symmetric union
    is then duplicate-free by construction and the operator skips its
    dedup pass (a full 2|E| shuffle). Unlike pagerank, duplicates can
    never change THIS result (min-label propagation is idempotent over
    repeated neighbors); they only inflate every round's join — so the
    flag is a pure performance contract.

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
    if not assume_distinct:
        sym = sym.distinct()
    sym = materialize(sym, checkpoint_dir)

    labels = materialize(
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node")),
        checkpoint_dir,
    )
    # NOTE on broadcasting: pagerank_fixed_point broadcasts its |V|-row
    # rank table per round because its edge lists are large (every
    # (customer, supplier) trade). Near-dup pair graphs here are SMALL
    # by construction (LSH candidates), and an A/B at sf0.1 measured
    # the per-round count+broadcast OVERHEAD above the exchange saving
    # (q53 1.8 -> 2.1 s) — so the shuffled join stays.
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


def pagerank_fixed_point(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = 1_000_000,
    checkpoint_dir: str | None = None,
    broadcast_node_limit: int = 1_000_000,
    assume_distinct: bool = False,
    assume_symmetric: bool = False,
) -> DataFrame:
    """PageRank in FIXED-POINT integer arithmetic: (node, rank_fp)
    after ``iterations`` rounds, rank_fp in units of 1/``scale``.

    ``assume_distinct``: the caller guarantees (src, dst) rows are
    already unique — skips the operator's dedup pass (a full edge-list
    shuffle) and its materialization, so the caller should hand over an
    edge frame that is cheap to re-execute (e.g. a projection of a
    checkpointed table): it feeds the out-degree aggregation, the node
    derivation and the contribution join. Ranks would silently double-
    count duplicated edges, hence opt-in only.

    ``assume_symmetric``: the caller guarantees every node appears in
    the ``src`` column (true for any symmetrized edge list) — the node
    set then falls out of the out-degree aggregation's keys instead of
    a 2|E|-row src∪dst union+distinct pass. A node appearing only as
    ``dst`` would vanish from the ranking, hence opt-in only.

    Why integers: PageRank's update is a float SUM over incoming
    contributions, and float summation order is engine- and
    partitioning-dependent — the classic source of run-to-run drift
    and the reason iterative float algorithms are hard to verify
    differentially. Holding ranks in BIGINT micro-units makes every
    operation (truncating division by out-degree, damping as
    ``(d * sum) div 100``, exact integer SUM) associative and
    deterministic: any engine, any partitioning, any summation order
    produces bit-identical ranks. Error vs real-valued PageRank is
    bounded by iterations/scale (~1e-6 per round here) — far below
    ranking noise. BIGINT headroom: total mass stays ~scale * N, safe
    past N = 1e9 nodes.

    Dangling nodes (no out-edges) leak their mass — the plain variant;
    per-iteration cost is one join + one aggregation on the edge list
    (the same shuffle shape as connected_components), lineage truncated
    per round via ``materialize``. Unnormalized start: every node
    begins at ``scale`` (rank mass 1.0).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not assume_distinct:
        e = materialize(e.distinct(), checkpoint_dir)
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
    if assume_symmetric:
        # every node is a src, so the out-degree table's key set IS the
        # node set: one |E|->|V| aggregation replaces the union+distinct
        # (and outdeg is materialized since nodes projects off it per
        # round; the non-symmetric path leaves it lazy — one consumer)
        outdeg = materialize(outdeg, checkpoint_dir)
        nodes = outdeg.select(F.col("src").alias("node"))
        n_nodes = outdeg.count()  # on the materialized table: cheap
    else:
        nodes = materialize(
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct(),
            checkpoint_dir,
        )
        n_nodes = nodes.count()
    base = (100 - damping_pct) * scale // 100
    ranks = nodes.withColumn("rank_fp", F.lit(scale).cast("bigint"))
    # (src, dst, deg) is static across iterations — materialize once or
    # every round re-pays the outdeg aggregation + join shuffles
    contrib_edges = materialize(e.join(outdeg, "src"), checkpoint_dir)
    # The rank table is |V| rows vs the edge list's |E| — broadcast it
    # (and the aggregated incoming table, also <= |V|) while |V| fits,
    # turning both per-iteration joins shuffle-free on the edge side.
    # AQE can't infer this on its own here: checkpointed RDD scans
    # carry no stats. Past the limit the joins fall back to shuffles
    # on (src)/(node), the correct plan for billion-node graphs.
    # Default 1M nodes ~= tens of MB serialized (string node + bigint)
    # — sized to stay well under executor/driver broadcast budgets; a
    # 10M-node broadcast re-sent every iteration would be hundreds of
    # MB replicated per round (r5 ADVICE).
    small = n_nodes <= broadcast_node_limit
    _b = F.broadcast if small else (lambda df: df)
    # Per-round materialization policy (r13, guide §1.2/§5): with a
    # reliable ``checkpoint_dir`` every round is durably checkpointed —
    # that durability (resume from the last round after executor loss)
    # is the caller's explicit request and stays. WITHOUT one, the old
    # per-round eager localCheckpoint bought no durability and cost one
    # blocking driver round-trip + block write per iteration; the
    # iterations now CHAIN LAZILY (each rank table feeds exactly one
    # consumer — the next round's join — so nothing is recomputed) and
    # the whole fixpoint executes as one job on top of the three
    # materialized static tables. Lineage is truncated every
    # ``_TRUNCATE_EVERY`` rounds so a large ``iterations`` cannot grow
    # an unbounded plan.
    _TRUNCATE_EVERY = 4
    for it in range(1, iterations + 1):
        incoming = (
            contrib_edges.join(_b(ranks), contrib_edges.src == ranks.node)
            .select("dst", F.expr("rank_fp div deg").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("in_fp"))
        )
        ranks = nodes.join(_b(incoming), nodes.node == incoming.dst, "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({damping_pct} * coalesce(in_fp, 0)) div 100")
            )
            .cast("bigint")
            .alias("rank_fp"),
        )
        if checkpoint_dir is not None or (
            it % _TRUNCATE_EVERY == 0 and it < iterations
        ):
            ranks = materialize(ranks, checkpoint_dir)
    return ranks
