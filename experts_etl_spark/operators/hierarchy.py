"""Hierarchy / tree operators (SURVEY.md §2.9).

The reference walks the org tree row-at-a-time: a DFS over
``parent_pure_uuid`` adjacency with a visited-set cycle guard
(transformer_loaders/pure_api_internal_org.py:117-134) and an MPTT
nested-set mirror kept in sync per node
(transformer_loaders/pure_api_internal_org.py:136-199).

Here the tree is computed set-at-a-time with an iterative BFS frontier
join: every iteration advances ALL nodes at one depth in a single
distributed join, so the number of Spark jobs is the tree *depth*, not
the node count.  Org-style trees are shallow (depth ≤ ~10) and small
relative to fact tables, so each frontier is broadcast-joined against
the adjacency and the loop costs depth × one broadcast join.

Scale notes (100 TB posture):

- The adjacency (id, parent) is a dim table — cache it once.
- ``localCheckpoint`` truncates the lineage each level; without it the
  plan doubles per iteration and the final DAG is exponential.
- A ``max_depth`` guard replaces the reference's visited-set cycle
  check: a cycle can never terminate a frontier loop, so we stop at
  max_depth and (optionally) report the leftovers as cyclic/orphaned.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tree_closure(
    nodes: DataFrame,
    id_col: str,
    parent_col: str,
    is_root: Column,
    max_depth: int = 50,
    with_path: bool = False,
    checkpoint: bool = True,
) -> DataFrame:
    """G1: BFS over an adjacency-list tree → (node_id, depth, root_id
    [, path]).

    Reference: DFS from the MPTT root over ``parent_pure_uuid``
    (transformer_loaders/pure_api_internal_org.py:117-134).  Nodes not
    reachable from a root (orphaned subtrees, cycles) are absent from
    the result — exactly the reference's visited-set semantics.

    ``path`` is the '/'-joined, zero-padded id chain from the root;
    lexicographic order on it is DFS preorder, which makes nested-set
    labels derivable downstream (see :func:`nested_set_labels`).
    """
    pad = F.format_string("%012d", F.col(id_col).cast("bigint"))
    base_cols = [
        F.col(id_col).alias("node_id"),
        F.lit(0).alias("depth"),
        F.col(id_col).alias("root_id"),
    ]
    if with_path:
        base_cols.append(pad.alias("path"))
    frontier = nodes.filter(is_root).select(*base_cols)
    if checkpoint:
        frontier = frontier.localCheckpoint(eager=True)

    adjacency = nodes.select(
        F.col(id_col).alias("_child_id"), F.col(parent_col).alias("_parent_id")
    ).filter(F.col("_parent_id").isNotNull() & (F.col("_child_id") != F.col("_parent_id")))
    adjacency = adjacency.cache()

    out = [frontier]
    for _ in range(max_depth):
        step_cols = [
            F.col("_child_id").alias("node_id"),
            (F.col("depth") + 1).alias("depth"),
            F.col("root_id"),
        ]
        if with_path:
            step_cols.append(
                F.concat_ws(
                    "/", F.col("path"), F.format_string("%012d", F.col("_child_id").cast("bigint"))
                ).alias("path")
            )
        frontier = (
            adjacency.join(
                F.broadcast(frontier.withColumnRenamed("node_id", "_parent_id")),
                "_parent_id",
            ).select(*step_cols)
        )
        if checkpoint:
            # Frontiers are tree levels — tiny next to the fact tables.
            # Coalescing before the eager checkpoint keeps the per-level
            # job at a handful of tasks instead of one per adjacency
            # partition (the loop runs `depth` jobs back-to-back).
            frontier = frontier.coalesce(8).localCheckpoint(eager=True)
        if frontier.isEmpty():
            break
        out.append(frontier)

    result = out[0]
    for f in out[1:]:
        result = result.unionByName(f)
    # Every frontier that referenced the adjacency is already an eager
    # localCheckpoint (or the caller opted out of caching value anyway),
    # so release the cached partitions instead of accumulating one
    # cached adjacency per invocation in executor storage.
    adjacency.unpersist(blocking=False)
    return result


def prune_unreachable(
    nodes: DataFrame,
    id_col: str,
    parent_col: str,
    is_root: Column,
    max_depth: int = 50,
) -> DataFrame:
    """G2: tree sync — keep only nodes reachable from a root, dropping
    whole orphaned subtrees (reference deletes MPTT nodes whose org
    vanished, transformer_loaders/pure_api_internal_org.py:190-199).

    This is stronger than a parent-exists check: when an interior node
    is deleted its entire subtree becomes unreachable even though every
    remaining child still has a stored parent id.
    """
    reachable = tree_closure(nodes, id_col, parent_col, is_root, max_depth).select(
        F.col("node_id").alias(id_col)
    )
    return nodes.join(F.broadcast(reachable), [id_col], "left_semi")


def nested_set_labels(
    nodes: DataFrame,
    id_col: str,
    parent_col: str,
    is_root: Column,
    max_depth: int = 50,
) -> DataFrame:
    """G2: derive MPTT nested-set (lft, rgt) labels from adjacency.

    The reference maintains lft/rgt incrementally per node via the MPTT
    library (transformer_loaders/pure_api_internal_org.py:136-188); we
    recompute the whole labeling declaratively:

    - DFS preorder = row_number over lexicographic path order;
    - subtree size: a node's path components ARE its ancestor chain, so
      ``explode(split(path)) → groupBy → count`` yields every node's
      descendant count (self included) in one linear shuffle — no
      quadratic path-prefix join;
    - ``lft = 2*preorder - depth - 1``, ``rgt = lft + 2*size - 1``
      (the classic closed form: each edge on the root path contributes
      one open bracket, everything visited earlier contributes two).

    The global row_number is a single-partition window — acceptable
    because org trees are dims (≤ millions of nodes), never fact-sized.
    """
    closed = tree_closure(
        nodes, id_col, parent_col, is_root, max_depth, with_path=True
    )
    from pyspark.sql import Window

    pre = F.row_number().over(Window.orderBy("path"))
    labeled = closed.select(
        "node_id", "depth", "path", pre.alias("preorder")
    )
    sizes = (
        closed.select(F.explode(F.split("path", "/")).alias("_anc"))
        .groupBy("_anc")
        .agg(F.count(F.lit(1)).alias("subtree_size"))
    )
    lft = 2 * F.col("preorder") - F.col("depth") - 1
    return (
        labeled.join(
            sizes,
            F.format_string("%012d", F.col("node_id").cast("bigint")) == F.col("_anc"),
        )
        .select(
            "node_id",
            "depth",
            lft.alias("lft"),
            (lft + 2 * F.col("subtree_size") - 1).alias("rgt"),
        )
    )
