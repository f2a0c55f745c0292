"""Training-data export: deterministic shuffle, exact global ranking, and
fixed-size shard assignment/writing (★ beyond-reference pipeline ops).

A 100 TB training run wants the corpus (a) globally shuffled so no shard is
a topical clump, (b) reproducibly — the same salt must yield the same order
on any cluster size — and (c) cut into fixed-row shards so data loaders can
address work by shard index.

Scale design:
  - The shuffle key is `md5(salt || id)` — a pure column expression, so the
    "shuffle" is a sort by a uniform key, not an RDD-level random shuffle:
    deterministic, and Catalyst-visible.
  - The exact global rank AVOIDS the classic scale-killer
    `row_number() OVER (ORDER BY ...)` (a single partition holding the
    whole table). Rows are bucketed by a PREFIX of the shuffle key (a pure
    expression, so it survives recomputation — no reliance on physical
    partition ids or cached range boundaries); bucket counts are tiny
    (one bigint per bucket), prefix-summed on the driver, and rejoined by
    broadcast. Global rank = bucket offset + local row_number within the
    bucket. The md5 key is uniform, so buckets are balanced by
    construction; `bucket_chars` scales the bucket count (16^c) to keep
    per-bucket row counts executor-sized at any corpus size.
  - Shard = rank div rows_per_shard, so every shard except the last has
    exactly `rows_per_shard` rows — a contract the loader can rely on
    (oracle: the same row_number arithmetic in ANSI SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import Window

SHUFFLE_KEY = "__shuffle_key"


def deterministic_shuffle_key(df: DataFrame, id_col: str, salt: str = "") -> DataFrame:
    """Attach the reproducible shuffle key md5(salt || id). Sorting by
    (key, id) is a salt-parameterized total order: same salt => same order
    on any cluster; new salt => an independent permutation."""
    return df.withColumn(
        SHUFFLE_KEY, F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    )


def exact_global_rank(
    df: DataFrame,
    key_col: str,
    tiebreak_col: str,
    rank_col: str = "rank",
    bucket_chars: int = 2,
) -> DataFrame:
    """0-based exact global rank over (key_col, tiebreak_col) without a
    global window.

    The bucket is the first `bucket_chars` hex chars of key_col — a pure
    expression, so every re-evaluation lands each row in the same bucket
    (unlike spark_partition_id after a sampled range partitioning, which
    can shift between the count pass and the rank pass). Bucket order is
    lexicographic, identical to key order, so
    rank = (rows in all earlier buckets) + local row_number - 1.

    Driver-side data: one count per bucket (16^bucket_chars bigints).
    Executor-side: one hash shuffle on the bucket + a per-bucket sort; at
    100 TB pick bucket_chars=4 (65 536 buckets) to keep each bucket's
    window task ~corpus/65 536 rows.

    NOTE: the input is scanned twice — an EAGER per-bucket count job runs
    at DataFrame-construction time, then the rank pass at action time.
    The input must therefore be deterministic under re-evaluation (no
    un-seeded sample/rand/limit upstream); persist such an input first.
    """
    bucket = F.substring(F.col(key_col), 1, bucket_chars)
    src = df.withColumn("__bucket", bucket)
    counts = src.groupBy("__bucket").count().collect()
    offsets, acc = [], 0
    for r in sorted(counts, key=lambda r: r["__bucket"]):
        offsets.append((r["__bucket"], acc))
        acc += r["count"]
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, "__bucket string, __offset bigint")
    w = Window.partitionBy("__bucket").orderBy(key_col, tiebreak_col)
    return (
        src.join(F.broadcast(off_df), "__bucket")
        .withColumn("__local", F.row_number().over(w))
        .withColumn(rank_col, (F.col("__offset") + F.col("__local") - 1).cast("bigint"))
        .drop("__bucket", "__offset", "__local")
    )


def assign_shards(
    df: DataFrame,
    id_col: str,
    rows_per_shard: int,
    salt: str = "",
    shard_col: str = "shard",
    pos_col: str = "pos_in_shard",
    bucket_chars: int = 2,
) -> DataFrame:
    """Deterministic fixed-size shard assignment: global shuffle order by
    (md5(salt||id), id), then shard = rank div rows_per_shard and
    pos_in_shard = rank mod rows_per_shard. Every shard except the last has
    exactly rows_per_shard rows."""
    if rows_per_shard < 1:
        raise ValueError(f"rows_per_shard must be >= 1, got {rows_per_shard}")
    keyed = deterministic_shuffle_key(df, id_col, salt)
    return assign_shards_by_key(
        keyed,
        SHUFFLE_KEY,
        id_col,
        rows_per_shard,
        shard_col=shard_col,
        pos_col=pos_col,
        bucket_chars=bucket_chars,
        drop_key=True,
    )


def assign_shards_by_key(
    df: DataFrame,
    key_col: str,
    tiebreak_col: str,
    rows_per_shard: int,
    shard_col: str = "shard",
    pos_col: str = "pos_in_shard",
    bucket_chars: int = 2,
    drop_key: bool = False,
) -> DataFrame:
    """Fixed-size shards over ANY precomputed string sort key — e.g. a
    zero-padded quality score for curriculum ordering (easy shards first)
    instead of the md5 shuffle key. Same bucketed exact-rank machinery;
    with a non-uniform key the buckets skew (a quality spike concentrates
    rows in few key prefixes), which costs balance in the rank windows but
    never correctness — the per-bucket counts are exact."""
    if rows_per_shard < 1:
        raise ValueError(f"rows_per_shard must be >= 1, got {rows_per_shard}")
    ranked = exact_global_rank(
        df, key_col, tiebreak_col, rank_col="__rank", bucket_chars=bucket_chars
    )
    out = (
        # integral `div`, not double division: exact for any rank, while a
        # double quotient would lose exactness past 2^53 rows
        ranked.withColumn(shard_col, F.expr(f"__rank div {rows_per_shard}"))
        .withColumn(pos_col, (F.col("__rank") % rows_per_shard).cast("bigint"))
        .drop("__rank")
    )
    return out.drop(key_col) if drop_key else out


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    rows_per_shard: int,
    salt: str = "",
    fmt: str = "parquet",
) -> int:
    """Write the corpus as `path/shard=N/*.<fmt>`, one fixed-size shard
    per directory, rows within a shard carrying their loader position.
    fmt="json" emits JSONL shards (the tokenizer-ready interchange format
    most training loaders read); any Spark batch format name works.

    The pre-write `repartition(n, shard)` clusters each shard into one
    task so each directory holds one file of exactly rows_per_shard rows
    (last shard short) — without it, every task would append a sliver to
    every shard directory (files = tasks x shards). Returns the shard
    count."""
    sharded = assign_shards(df, id_col, rows_per_shard, salt).persist()
    try:
        max_shard = sharded.agg(F.max("shard")).first()[0]
        if max_shard is None:  # empty input: write an empty dir, 0 shards
            (
                sharded.limit(0)
                .write.mode("overwrite")
                .partitionBy("shard")
                .format(fmt)
                .save(path)
            )
            return 0
        n_shards = int(max_shard) + 1
        (
            sharded.repartition(n_shards, "shard")
            .sortWithinPartitions("shard", "pos_in_shard")
            .write.mode("overwrite")
            .partitionBy("shard")
            .format(fmt)
            .save(path)
        )
        return n_shards
    finally:
        sharded.unpersist(blocking=False)
