"""Connected components over candidate-duplicate pairs — the transitive-
closure step that turns pairwise dedup hits into clusters with one canonical
representative (large-scale dedup pipelines always end here: A~B, B~C ⇒
{A,B,C} keep min).

Algorithm: two physical strategies behind one API —

1. **Driver-local union-find** when the edge list is small (≤
   `local_threshold` edges, measured by a count on the already-persisted
   edge frame). After LSH banding the candidate-pair graph is orders of
   magnitude smaller than the corpus (pairs only exist where signatures
   collide), so at any scale the *closure* input is usually tiny even when
   the corpus is 100 TB; a single collect + union-find beats several
   shuffle rounds of scheduling overhead by a wide margin.
2. **Iterative min-label propagation** otherwise (a bounded number of
   join+aggregate rounds). Each round every node adopts the smallest label
   in its neighborhood; converges in O(diameter) rounds — near-dup graphs
   are unions of small cliques, so a handful of rounds suffices. Each
   round is two shuffles (join + groupBy); no driver-side state beyond the
   loop counter and an optional convergence check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _local_union_find(edges) -> list:
    """Union-find with path compression over collected (u, v) rows; returns
    [(node, min_member_of_component)] sorted for deterministic output."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for u, v in edges:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[rv] = ru
    rep: dict = {}
    for node in parent:
        r = find(node)
        if r not in rep or node < rep[r]:
            rep[r] = node
    return sorted((node, rep[find(node)]) for node in parent)


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iterations: int = 10,
    check_convergence: bool = True,
    local_threshold: int = 2_000_000,
) -> DataFrame:
    """Input: undirected edges (a, b). Output: (node, component) where
    component is the minimum node id reachable from `node`.

    Nodes appearing in no edge are absent (callers union isolated nodes
    back as their own component if needed).

    `local_threshold`: if the (distinct-ignored) edge count is at or below
    this, the closure runs as driver-side union-find on the collected
    edges (~50 B/edge driver memory; the default ≈100 MB). Set to 0 to
    force the distributed path.
    """
    src = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    if local_threshold > 0:
        # size probe and data fetch in ONE evaluation of the (typically
        # expensive) pairs pipeline: collect at most threshold+1 edges; if
        # the limit wasn't hit we already hold the whole edge list.
        # persist FIRST so an overflowing probe leaves the partitions it
        # computed cached for the distributed path instead of throwing the
        # whole evaluation away
        src = src.persist()
        probe = src.limit(local_threshold + 1).collect()
        if len(probe) <= local_threshold:
            src.unpersist()
            rows = _local_union_find((r["u"], r["v"]) for r in probe)
            from pyspark.sql.types import StructField, StructType

            node_type = pairs.schema[a_col].dataType
            out_schema = StructType(
                [
                    StructField("node", node_type, True),
                    StructField("component", node_type, True),
                ]
            )
            from penr_oz_agent_memory_rust_spark.localdata import local_df

            # coalesce(1): a few-hundred-row result split across the default
            # parallelism makes every downstream stage pay 32 tasks of
            # scheduling for nothing
            out = local_df(pairs.sparkSession, rows, out_schema).coalesce(1)
            # side-channel for dedup_clusters: the rows are already on the
            # driver, so cluster sizes can be counted without a shuffle
            out._spark_graft_local_components = rows
            return out
    # both orientations from ONE scan of `src` (an explode, not a union of
    # two branches, which would recompute the input twice)
    edges = (
        src.select(
            F.explode(
                F.array(
                    F.struct(F.col("u"), F.col("v")),
                    F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
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
        if local_threshold > 0:
            src.unpersist()


def dedup_clusters(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iterations: int = 10,
    local_threshold: int = 2_000_000,
) -> DataFrame:
    """Cluster summary: (component, cluster_size) with component = the
    canonical (minimum) member — the keep-list's complement."""
    comp = connected_components(
        pairs, a_col, b_col, max_iterations, local_threshold=local_threshold
    )
    local_rows = getattr(comp, "_spark_graft_local_components", None)
    if local_rows is not None:
        # closure already ran on the driver — finish the tiny aggregation
        # there too instead of shuffling a few hundred rows across 32 tasks
        from collections import Counter

        from pyspark.sql.types import LongType, StructField, StructType

        sizes = Counter(component for _, component in local_rows)
        node_type = comp.schema["component"].dataType
        out_schema = StructType(
            [
                StructField("component", node_type, True),
                StructField("cluster_size", LongType(), False),
            ]
        )
        from penr_oz_agent_memory_rust_spark.localdata import local_df

        return local_df(pairs.sparkSession, sorted(sizes.items()), out_schema).coalesce(1)
    return comp.groupBy("component").agg(F.count("*").alias("cluster_size"))


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    salt: str = "split",
    a_col: str = "a",
    b_col: str = "b",
    max_iterations: int = 10,
) -> DataFrame:
    """★ leakage-safe train/heldout split: assign each document by the
    portable hash of its near-dup COMPONENT representative, so a document
    and all its near-duplicates land on the SAME side — the eval-hygiene
    property a row-level hash split cannot give (a train doc whose
    near-twin sits in the eval set leaks the answer). Docs in no pair are
    their own singleton component. Output: (id, rep, split).

    Scale shape: connected components over the candidate pairs (size-probed
    driver union-find or distributed min-label propagation), one left join
    of the corpus ids against the node->component map (components only
    exist for docs IN pairs — the map is far smaller than the corpus), and
    a pure-expression md5 bucket. Deterministic and engine-portable, hence
    oracle-checkable."""
    from penr_oz_agent_memory_rust_spark.functions import hashing

    comp = connected_components(pairs, a_col, b_col, max_iterations).withColumnRenamed(
        "node", id_col
    )
    rep = F.coalesce(F.col("component"), F.col(id_col))
    bucket = (
        hashing.md5_long(F.concat(F.lit(f"{salt}|"), rep.cast("string"))) % 100
    )
    return (
        docs.select(id_col)
        .join(comp, id_col, "left")
        .select(
            id_col,
            rep.alias("rep"),
            F.when(bucket < train_pct, F.lit("train"))
            .otherwise(F.lit("heldout"))
            .alias("split"),
        )
    )


def leakage_safe_kfold(
    docs: DataFrame,
    pairs: DataFrame,
    k: int,
    id_col: str = "doc_id",
    salt: str = "kfold",
    a_col: str = "a",
    b_col: str = "b",
    max_iterations: int = 10,
) -> DataFrame:
    """★ leakage-safe k-fold assignment: fold = portable-md5(salt|component
    representative) mod k, so a document and ALL its near-duplicates share
    one fold — cross-validation's exchangeability assumption survives
    near-dup contamination (the k-fold generalization of
    leakage_safe_split; same scale shape: components over pairs, one left
    join, pure-expression bucketing). Deterministic across engines and
    runs. Output: (id, rep, fold) with fold in [0, k)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from penr_oz_agent_memory_rust_spark.functions import hashing

    comp = connected_components(pairs, a_col, b_col, max_iterations).withColumnRenamed(
        "node", id_col
    )
    rep = F.coalesce(F.col("component"), F.col(id_col))
    fold = hashing.md5_long(F.concat(F.lit(f"{salt}|"), rep.cast("string"))) % k
    return (
        docs.select(id_col)
        .join(comp, id_col, "left")
        .select(id_col, rep.alias("rep"), fold.cast("int").alias("fold"))
    )
