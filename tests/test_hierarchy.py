"""Hierarchy operators on a hand-built tree (SURVEY.md §2.9).

Tree under test (ids; parent arrows):

    1
    ├── 2
    │   ├── 4
    │   └── 5
    └── 3
        └── 6
            └── 7
    9 → 8 (orphan chain: 8's parent 99 does not exist)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from experts_etl_spark.operators.hierarchy import (
    nested_set_labels,
    prune_unreachable,
    tree_closure,
)

ROWS = [
    (1, None),
    (2, 1),
    (3, 1),
    (4, 2),
    (5, 2),
    (6, 3),
    (7, 6),
    (8, 99),   # orphan: parent missing
    (9, 8),    # orphan subtree child
]


def tree_df(spark):
    return spark.createDataFrame(ROWS, ["id", "parent_id"])


def test_tree_closure_depths_and_reachability(spark):
    out = tree_closure(
        tree_df(spark), "id", "parent_id", is_root=F.col("parent_id").isNull()
    )
    got = {r.node_id: (r.depth, r.root_id) for r in out.collect()}
    assert got == {
        1: (0, 1), 2: (1, 1), 3: (1, 1), 4: (2, 1),
        5: (2, 1), 6: (2, 1), 7: (3, 1),
    }  # 8 and 9 unreachable


def test_prune_unreachable_drops_orphan_subtree(spark):
    kept = prune_unreachable(
        tree_df(spark), "id", "parent_id", is_root=F.col("parent_id").isNull()
    )
    assert sorted(r.id for r in kept.collect()) == [1, 2, 3, 4, 5, 6, 7]


def test_nested_set_labels_classic_invariants(spark):
    out = nested_set_labels(
        tree_df(spark), "id", "parent_id", is_root=F.col("parent_id").isNull()
    )
    lab = {r.node_id: (r.lft, r.rgt) for r in out.collect()}
    # Root spans the whole tree: lft=1, rgt=2*7
    assert lab[1] == (1, 14)
    # Preorder is path order: 1, 2, 4, 5, 3, 6, 7 (children sorted by id)
    assert lab[2] == (2, 7)
    assert lab[4] == (3, 4)
    assert lab[5] == (5, 6)
    assert lab[3] == (8, 13)
    assert lab[6] == (9, 12)
    assert lab[7] == (10, 11)
    # Nested-set invariants: parent strictly contains child intervals
    for child, parent in [(2, 1), (4, 2), (5, 2), (3, 1), (6, 3), (7, 6)]:
        assert lab[parent][0] < lab[child][0] <= lab[child][1] < lab[parent][1]


def test_tree_closure_cycle_guard_terminates(spark):
    cyc = spark.createDataFrame(
        [(1, None), (2, 3), (3, 2)], ["id", "parent_id"]
    )
    out = tree_closure(
        cyc, "id", "parent_id", is_root=F.col("parent_id").isNull(), max_depth=5
    )
    assert sorted(r.node_id for r in out.collect()) == [1]
