"""Connected components over candidate-duplicate pairs — the transitive-
closure step that turns pairwise dedup hits into clusters with one canonical
representative (large-scale dedup pipelines always end here: A~B, B~C ⇒
{A,B,C} keep min).

Algorithm: iterative min-label propagation (a bounded number of
join+aggregate rounds). Each round every node adopts the smallest label in
its neighborhood; converges in O(diameter) rounds — near-dup graphs are
unions of small cliques, so a handful of rounds suffices. Each round is two
shuffles (join + groupBy); no driver-side state beyond the loop counter and
an optional convergence check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iterations: int = 10,
    check_convergence: bool = True,
) -> DataFrame:
    """Input: undirected edges (a, b). Output: (node, component) where
    component is the minimum node id reachable from `node`.

    Nodes appearing in no edge are absent (callers union isolated nodes
    back as their own component if needed).
    """
    # both orientations from ONE scan of `pairs` (an explode, not a union of
    # two branches) — pairs is typically an expensive dedup pipeline and a
    # union would recompute it twice
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(a_col).alias("u"), F.col(b_col).alias("v")),
                    F.struct(F.col(b_col).alias("u"), F.col(a_col).alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
    )
    # self-edges make every node its own neighbor so labels persist
    nodes = edges.select("u").distinct()
    edges = edges.unionByName(nodes.select("u", F.col("u").alias("v"))).persist()
    labels = nodes.select("u", F.col("u").alias("component")).persist()
    numeric_ids = labels.schema["component"].dataType.typeName() in (
        "byte", "short", "integer", "long", "float", "double", "decimal"
    )
    prev_sum = None
    try:
        for _ in range(max_iterations):
            # each node adopts the min label among its neighbors' labels;
            # persist each round or the lineage (and recompute cost) grows
            # with every iteration — the classic iterative-join trap
            new_labels = (
                edges.join(labels.withColumnRenamed("u", "v"), "v")
                .groupBy("u")
                .agg(F.min("component").alias("component"))
                .persist()
            )
            if check_convergence and numeric_ids:
                # self-edges guarantee labels are non-increasing, so the label
                # sum strictly decreases until the fixpoint: one tiny aggregate
                # per round instead of a join-based changed-rows check
                cur_sum = new_labels.agg(F.sum("component")).first()[0]
                labels.unpersist()
                labels = new_labels
                if cur_sum == prev_sum:
                    break
                prev_sum = cur_sum
            elif check_convergence:
                changed = (
                    new_labels.alias("n")
                    .join(labels.alias("o"), "u")
                    .filter(F.col("n.component") != F.col("o.component"))
                    .limit(1)
                    .count()
                )
                labels.unpersist()
                labels = new_labels
                if changed == 0:
                    break
            else:
                labels.unpersist()
                labels = new_labels
        # materialize the final frame so callers are not affected by the
        # persisted-lineage cleanup below
        return labels.select(F.col("u").alias("node"), "component").localCheckpoint(eager=True)
    finally:
        edges.unpersist()
        labels.unpersist()


def dedup_clusters(
    pairs: DataFrame, a_col: str = "a", b_col: str = "b", max_iterations: int = 10
) -> DataFrame:
    """Cluster summary: (component, cluster_size) with component = the
    canonical (minimum) member — the keep-list's complement."""
    comp = connected_components(pairs, a_col, b_col, max_iterations)
    return comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
