"""Blocked fuzzy record linkage / entity resolution (★ north-star).

Training-data use: catalog and metadata tables feeding a corpus pipeline
carry near-identical entity strings (product names, author spellings,
venue titles) that exact dedup misses; linking them is the classic
entity-resolution problem. The scalable shape is BLOCKING: a cheap
deterministic key (here: a token of the name plus a length band) gates
which pairs are ever compared, so the quadratic edit-distance step runs
only inside blocks — the same candidate-generation-then-verify pattern as
MinHash-LSH dedup (operators/dedup.py), with edit distance as the
verifier instead of Jaccard.

Scale shape: one hash-partition by block key, per-block self-join (a < b
kills mirror/self pairs), `levenshtein` evaluated JVM-side inside
whole-stage codegen, and a `max_block` stop-cap that drops degenerate
blocks (the "Smith" problem) exactly like the stop-bucket caps in the LSH
paths. No Python, no driver collect, no all-pairs join anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def block_key(name: Column, token_index: int = -1, band: int = 4) -> Column:
    """Default blocking key: one token of the lowercased name (last by
    default — for 'adjective noun' style names the head noun) plus the
    name-length band, so only same-family, similar-length names meet."""
    toks = F.split(F.lower(name), " ")
    tok = F.element_at(toks, token_index)
    return F.concat_ws(
        "|", tok, F.floor(F.length(name) / band).cast("string")
    )


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    key: Column | None = None,
    max_distance: int = 2,
    max_block: int | None = 1000,
) -> DataFrame:
    """Candidate pairs (id_a, id_b, name_a, name_b, block, distance) with
    id_a < id_b and levenshtein(name_a, name_b) <= max_distance.

    Blocks larger than `max_block` are dropped entirely (stop-block cap) —
    at corpus scale a degenerate key would otherwise quadratically swamp
    the stage; the cap is the documented recall trade, mirroring
    dedup.py's stop-shingle caps.
    """
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.col(name_col).alias("name"),
        (key if key is not None else block_key(F.col(name_col))).alias("block"),
    )
    if max_block is not None:
        sizes = keyed.groupBy("block").agg(F.count("*").alias("__bn"))
        keyed = keyed.join(
            sizes.filter(F.col("__bn") <= max_block).select("block"), "block"
        )
    a = keyed.select(
        "block", F.col("id").alias("id_a"), F.col("name").alias("name_a")
    )
    b = keyed.select(
        "block", F.col("id").alias("id_b"), F.col("name").alias("name_b")
    )
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("distance", F.levenshtein("name_a", "name_b"))
        .filter(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "name_a", "name_b", "block", "distance")
    )


def best_match(pairs: DataFrame) -> DataFrame:
    """Per left id, the single best fuzzy match: lowest distance, then
    lowest id_b — a struct-min aggregation (no window, one shuffle)."""
    return (
        pairs.groupBy("id_a")
        .agg(F.min(F.struct("distance", "id_b", "name_b")).alias("m"))
        .select(
            "id_a",
            F.col("m.id_b").alias("id_b"),
            F.col("m.name_b").alias("name_b"),
            F.col("m.distance").alias("distance"),
        )
    )
