"""Connected components (operators/graph.py): hand-built graphs pin
the fixpoint semantics; q53's recursive-CTE oracle proves engine parity
on real near-dup data."""

import pytest

from _multi_source_retail_data_integration_hub_spark.operators.graph import (
    connected_components,
)


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["node"]: r["cluster_id"]
        for r in connected_components(df, **kw).collect()
    }


def test_two_components_and_chain(spark):
    # component {1,2,3,4} is a chain discovered transitively; {10,11}
    # is separate; node 99 has no edges and must not appear.
    got = _cc(spark, [(2, 1), (2, 3), (4, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_cycle_and_self_loop(spark):
    got = _cc(spark, [(1, 2), (2, 3), (3, 1), (5, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 5: 5}


def test_long_chain_exceeding_budget_raises(spark):
    chain = [(i, i + 1) for i in range(30)]
    with pytest.raises(RuntimeError, match="fixpoint"):
        connected_components(
            spark.createDataFrame(chain, "id_a long, id_b long"), max_iter=2
        ).collect()


def test_long_chain_converges_within_budget(spark):
    chain = [(i, i + 1) for i in range(12)]
    got = _cc(spark, chain)
    assert set(got.values()) == {0}


def test_reliable_checkpoint_path(spark, tmp_path):
    # checkpoint_dir switches per-round materialization from
    # localCheckpoint to reliable FS checkpoints: same fixpoint, and
    # checkpoint files actually land under the directory.
    ckpt = str(tmp_path / "cc_ckpt")
    got = _cc(spark, [(2, 1), (2, 3), (10, 11)], checkpoint_dir=ckpt)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    written = list((tmp_path / "cc_ckpt").rglob("*"))
    assert any(p.is_file() for p in written)
