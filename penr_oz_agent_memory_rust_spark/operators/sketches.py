"""Count-min sketch frequency estimation (★ north-star pipeline operator).

Heavy-hitter vocabulary tracking with BOUNDED memory: the sketch is a
depth × width counter table (a few thousand rows regardless of corpus
size), so token-frequency surveillance over a 100 TB corpus costs one
explode + one hash-aggregate into a constant-size table — the thing an
exact `groupBy(token)` cannot promise when the vocabulary itself scales
with the data (URLs, n-grams, typos).

Estimates are the classic CMS guarantee: est >= true count, and
est <= true + eps*N with probability 1-delta for width = e/eps,
depth = ln(1/delta). With the portable seeded-md5 hash family the whole
computation is DETERMINISTIC, so unlike most sketches it is
oracle-checkable in SQL (the DuckDB twin computes the identical table and
min — not merely the same distribution).

The identification step here estimates counts for a candidate set (the
corpus's distinct tokens, or any external watchlist) via a broadcast join
against the counter table. Identifying heavy hitters with NO candidate
enumeration needs the dyadic-range CMS variant; out of scope — candidate
sets are how corpus pipelines use it (estimate THESE tokens' frequencies
cheaply, then act).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from penr_oz_agent_memory_rust_spark.functions import hashing


def _cms_bucketed(
    df: DataFrame, item_col: str, width: int, depth: int, keep: list[str]
) -> DataFrame:
    """(keep..., d, bucket) rows via double hashing (Kirsch-Mitzenmacher,
    same family as the Bloom filter): ONE md5 per input row computed
    BEFORE the depth explode (projecting it after would re-evaluate the
    md5 once per depth row — the measured hot spot of the gate), the d
    variants derived arithmetically. h1 + d*h2 stays inside bigint
    (h < 2^60, d small) and mirrors exactly in SQL."""
    h = hashing.md5_long(F.col(item_col))
    pre = df.select(
        *keep,
        h.alias("__h"),
        (F.shiftright(h, 17).bitwiseOR(F.lit(1))).alias("__h2"),
    ).select(
        *keep,
        "__h",
        "__h2",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    )
    return pre.select(
        *keep,
        "d",
        F.pmod(
            F.col("__h") + F.col("d").cast("bigint") * F.col("__h2"), F.lit(width)
        ).alias("bucket"),
    )


def cms_counter_table(
    items: DataFrame, item_col: str, width: int = 2048, depth: int = 4
) -> DataFrame:
    """The depth × width counter table over item OCCURRENCES:
    (d, bucket, c). One explode of depth rows per occurrence, one
    hash-aggregate with map-side partial combine; output is bounded by
    depth*width rows no matter the input size."""
    rows = _cms_bucketed(items, item_col, width, depth, keep=[])
    return rows.groupBy("d", "bucket").agg(F.count("*").alias("c"))


def cms_estimate(
    candidates: DataFrame,
    counter_table: DataFrame,
    item_col: str,
    width: int = 2048,
    depth: int = 4,
) -> DataFrame:
    """Point estimates for a candidate set: est(item) = min over d of the
    item's bucket counter. The counter table (depth*width rows) broadcasts;
    candidates explode into depth probe rows each and aggregate back —
    never the other way around. Output: (item_col, est)."""
    probes = _cms_bucketed(candidates, item_col, width, depth, keep=[item_col])
    joined = probes.join(F.broadcast(counter_table), ["d", "bucket"], "left")
    return joined.groupBy(item_col).agg(
        F.min(F.coalesce("c", F.lit(0))).alias("est")
    )


def hll_registers(
    items: DataFrame, item_col: str, m: int = 64
) -> DataFrame:
    """HyperLogLog registers over the portable 60-bit md5 hash:
    bucket = h mod m, w = h div m (60 - log2(m) bits), register =
    max over items of rho(w) = (#leading zeros of w in its field) + 1 —
    computed with INTEGER ops only (bit length via the bin() string, which
    both engines define identically), so the registers are bit-identical
    across engines. Dense output: exactly m rows (bucket, r), absent
    buckets at 0 via a range spine."""
    import math

    b = int(math.log2(m))
    w_bits = 60 - b
    h = hashing.md5_long(F.col(item_col))
    w = F.shiftright(h, b)  # integer shift — float division would lose
    # precision above 2^53 and corrupt registers
    rho = F.when(w == 0, F.lit(w_bits + 1)).otherwise(
        F.lit(w_bits + 1) - F.length(F.bin(w))
    )
    regs = (
        items.select(F.pmod(h, F.lit(m)).alias("bucket"), rho.alias("__r"))
        .groupBy("bucket")
        .agg(F.max("__r").alias("r"))
    )
    spine = items.sparkSession.range(m).select(F.col("id").alias("bucket"))
    return spine.join(regs, "bucket", "left").select(
        "bucket", F.coalesce("r", F.lit(0)).alias("r")
    )


def hll_distinct(
    items: DataFrame, item_col: str, m: int = 64
) -> DataFrame:
    """★ HyperLogLog distinct-count estimate (Flajolet et al. 2007) as one
    row (est double, 6dp). Unlike approx_count_distinct this sketch is
    DETERMINISTIC and engine-portable (md5 hash family, integer register
    math), so the estimate itself is oracle-checkable — and the m-row
    register table is mergeable across partitions/days by element-wise
    max, the property count-distinct rollup pipelines need.

    Standard corrections: alpha_m * m^2 / sum(2^-r); small-range linear
    counting m*ln(m/V) when est <= 2.5m and zero registers exist. One
    hash-aggregate into m rows (map-side partial max), then a 1-row fold.
    """
    import math

    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1 + 1.079 / m)
    )
    regs = hll_registers(items, item_col, m)
    agg = regs.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("__z"),
        F.sum(F.when(F.col("r") == 0, 1).otherwise(0)).alias("__v"),
    )
    raw = F.lit(alpha * m * m) / F.col("__z")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("__v"))
    est = F.when((raw <= F.lit(2.5 * m)) & (F.col("__v") > 0), linear).otherwise(raw)
    return agg.select(F.round(est, 6).alias("est"))


def cms_heavy_hitters(
    items: DataFrame,
    item_col: str,
    k: int = 20,
    width: int = 2048,
    depth: int = 4,
) -> DataFrame:
    """Top-k items by CMS-estimated frequency (est desc, item asc
    tiebreak): counter table + estimates for the distinct items +
    bounded-heap top-k. Deterministic, hence oracle-checkable; est is an
    upper bound on the true count (equal when the item's buckets are
    collision-free in at least one row)."""
    from penr_oz_agent_memory_rust_spark.operators.topk import top_k

    table = cms_counter_table(items, item_col, width=width, depth=depth)
    cands = items.select(item_col).distinct()
    est = cms_estimate(cands, table, item_col, width=width, depth=depth)
    return top_k(est, "est", k, tiebreak=item_col).select(item_col, "est")
