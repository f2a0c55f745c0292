from __future__ import annotations

from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.operators.linkage import (
    best_match,
    block_key,
    fuzzy_pairs,
)


def _names(spark, rows):
    return spark.createDataFrame(rows, "id bigint, name string")


def test_blocking_gates_comparisons(spark):
    df = _names(
        spark,
        [
            (1, "red bolt"),
            (2, "rad bolt"),  # same block (bolt), distance 1
            (3, "red gear"),  # different noun -> never compared
            (4, "crimson bolt"),  # same noun, different length band
        ],
    )
    out = fuzzy_pairs(df, "id", "name", max_distance=2).collect()
    assert [(r.id_a, r.id_b, r.distance) for r in out] == [(1, 2, 1)]


def test_distance_threshold_and_ordering(spark):
    df = _names(spark, [(1, "blue bolt"), (2, "glue bolt"), (3, "bole bolt")])
    out = fuzzy_pairs(df, "id", "name", max_distance=2)
    got = {(r.id_a, r.id_b): r.distance for r in out.collect()}
    # all share a block; pairs emitted once with id_a < id_b; the
    # glue/bole pair (distance 3) falls outside the threshold
    assert set(got) == {(1, 2), (1, 3)}
    assert got[(1, 2)] == 1 and got[(1, 3)] == 2


def test_max_block_cap_drops_degenerate_blocks(spark):
    rows = [(i, f"x{i % 2} bolt") for i in range(20)] + [(100, "lone gear"), (101, "lune gear")]
    df = _names(spark, rows)
    out = fuzzy_pairs(df, "id", "name", max_distance=3, max_block=5)
    got = [(r.id_a, r.id_b) for r in out.collect()]
    assert got == [(100, 101)]  # the 20-row bolt block was capped away


def test_best_match_struct_min(spark):
    df = _names(
        spark, [(1, "red bolt"), (2, "rad bolt"), (3, "red belt"), (4, "red bolt")]
    )
    pairs = fuzzy_pairs(df, "id", "name", max_distance=2)
    bm = {r.id_a: (r.id_b, r.distance) for r in best_match(pairs).collect()}
    # 1's best is exact dup 4 (distance 0)
    assert bm[1] == (4, 0)


def test_block_key_custom_token(spark):
    df = spark.createDataFrame([("alpha beta",)], "name string").select(
        block_key(F.col("name"), token_index=1).alias("k")
    )
    assert df.collect()[0].k.startswith("alpha|")


def test_fuzzy_pairs_subset_of_blocks_property(spark):
    import random

    from penr_oz_agent_memory_rust_spark.operators.linkage import block_key

    rnd = random.Random(3)
    adjs = ["red", "blue", "tiny", "big", "old"]
    nouns = ["bolt", "gear", "ring"]
    rows = [
        (i, f"{rnd.choice(adjs)} {rnd.choice(nouns)}") for i in range(200)
    ]
    df = _names(spark, rows)
    pairs = fuzzy_pairs(df, "id", "name", max_distance=3).collect()
    keyed = {
        r.id: r.k
        for r in df.select("id", block_key(F.col("name")).alias("k")).collect()
    }
    for p in pairs:
        assert p.id_a < p.id_b
        assert keyed[p.id_a] == keyed[p.id_b]  # candidates only within a block
        assert 0 <= p.distance <= 3
