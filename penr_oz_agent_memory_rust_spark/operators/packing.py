"""Sequence packing: greedy token-budget bin packing for training batches
(★ beyond-reference pipeline op).

Context-window packing wants documents grouped into bins of at most
`token_budget` tokens with as little padding as possible. Optimal bin
packing is NP-hard and inherently sequential, so the Spark shape is
bucketed greedy first-fit-decreasing:

  - each doc lands in a deterministic hash bucket (md5-derived, salted);
  - within a bucket, an Arrow-batched applyInPandas packs docs
    first-fit-decreasing — the classic 11/9·OPT + 1 guarantee applies
    per bucket;
  - bin ids are (bucket << 32) | local_index, so ids are globally unique
    without any cross-bucket coordination.

Packing quality degrades only marginally vs. a global pack (buckets are
random samples of the same length distribution), while the work
parallelizes perfectly: `n_buckets` tasks, each holding corpus/n_buckets
docs. At 100 TB raise n_buckets so a bucket's (id, n_tokens) pairs fit a
task — the payload text never enters the packer, only the token counts.

Oracle-checked since r7: the per-bucket greedy loop replays in DuckDB as
a recursive CTE whose per-bucket row carries the remaining-capacity list
and advances one doc per step (see the `sequence_packing` oracle in
__spark_entry__.py); the invariants (budget respected, every doc packed
exactly once, determinism) are additionally pinned in
tests/test_packing.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def pack_sequences(
    docs: DataFrame,
    token_budget: int,
    id_col: str = "doc_id",
    token_count_col: str | None = None,
    text_col: str = "text",
    n_buckets: int = 32,
    salt: str = "",
) -> DataFrame:
    """Assign each doc to a packed bin: returns (id, n_tokens, bin_id).

    Docs longer than the budget get a singleton bin (never dropped — the
    caller decides whether to truncate). token_count_col defaults to a
    whitespace count computed on the fly so callers can pass raw docs.
    """
    if token_budget < 1:
        raise ValueError(f"token_budget must be >= 1, got {token_budget}")
    from penr_oz_agent_memory_rust_spark.operators import text_ops

    toks = (
        F.col(token_count_col).cast("bigint")
        if token_count_col
        else text_ops.token_count_ws(F.col(text_col)).cast("bigint")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 6), 16, 10)
        .cast("bigint")
        % n_buckets
    )
    src = docs.select(
        F.col(id_col).alias("id"), toks.alias("n_tokens"), bucket.alias("__bucket")
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(pdf["__bucket"].iloc[0])
        # first-fit-decreasing; doc_id tiebreak keeps the order total
        pdf = pdf.sort_values(["n_tokens", "id"], ascending=[False, True])
        remaining: list[int] = []  # remaining capacity per local bin
        assigned: list[int] = []
        for t in pdf["n_tokens"]:
            t = int(t)
            for i, r in enumerate(remaining):
                if r >= t:
                    remaining[i] = r - t
                    assigned.append(i)
                    break
            else:
                # new bin; oversize docs become immediately-full singletons
                remaining.append(max(0, token_budget - t))
                assigned.append(len(remaining) - 1)
        out = pdf[["id", "n_tokens"]].copy()
        out["bin_id"] = [(b << 32) | i for i in assigned]
        return out

    id_type = dict(docs.dtypes)[id_col]
    return src.groupBy("__bucket").applyInPandas(
        pack, schema=f"id {id_type}, n_tokens bigint, bin_id bigint"
    )


def bin_stats(packed: DataFrame, token_budget: int) -> DataFrame:
    """Per-bin packing summary: doc count, token total, fill ratio."""
    return packed.groupBy("bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.sum("n_tokens") / F.lit(token_budget), 6).alias("fill_ratio"),
    )


def token_offset_shards(
    docs: DataFrame,
    tokens_per_shard: int,
    id_col: str = "doc_id",
    token_count_col: str | None = None,
    text_col: str = "text",
    salt: str = "",
) -> DataFrame:
    """Contiguous concat-and-chunk layout: documents are laid end-to-end in
    deterministic md5(salt||id) order and a doc belongs to the shard where
    its FIRST token falls (shard = token_offset div tokens_per_shard) — the
    layout used when sequences are built by concatenation + fixed-stride
    chunking rather than per-doc bin packing. Unlike pack_sequences this is
    a pure window expression, so it is SQL-oracle-checkable.

    Output: (id, n_tokens, token_offset, shard). The token offset is a
    cumulative sum over ONE global md5 ordering — computed per hash bucket
    with broadcast offsets, the same no-global-window shape as
    export.exact_global_rank, but accumulating token counts instead of row
    counts.

    NOTE: the input is scanned twice (eager per-bucket token-sum job at
    construction time, window pass at action time) — it must be
    deterministic under re-evaluation; persist non-deterministic inputs
    first (see export.exact_global_rank)."""
    if tokens_per_shard < 1:
        raise ValueError(f"tokens_per_shard must be >= 1, got {tokens_per_shard}")
    from penr_oz_agent_memory_rust_spark.operators import text_ops
    from pyspark.sql import Window

    toks = (
        F.col(token_count_col).cast("bigint")
        if token_count_col
        else text_ops.token_count_ws(F.col(text_col)).cast("bigint")
    )
    key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    bucket = F.substring(key, 1, 2)
    src = docs.select(
        F.col(id_col).alias("id"),
        toks.alias("n_tokens"),
        key.alias("__k"),
        bucket.alias("__bucket"),
    )
    counts = (
        src.groupBy("__bucket").agg(F.sum("n_tokens").alias("t")).collect()
    )
    offsets, acc = [], 0
    for r in sorted(counts, key=lambda r: r["__bucket"]):
        offsets.append((r["__bucket"], acc))
        acc += r["t"]
    spark = docs.sparkSession
    off = spark.createDataFrame(offsets or [("", 0)], "__bucket string, __off bigint")
    w = (
        Window.partitionBy("__bucket")
        .orderBy("__k", "id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        src.join(F.broadcast(off), "__bucket")
        .withColumn(
            "token_offset",
            F.col("__off") + F.coalesce(F.sum("n_tokens").over(w), F.lit(0)),
        )
        .withColumn("shard", F.expr(f"token_offset div {tokens_per_shard}"))
        .select("id", "n_tokens", "token_offset", "shard")
    )
