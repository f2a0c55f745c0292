"""Int8 and 1-bit embedding quantization — the 4×/32× storage/IO levers for
100 TB vector tables.

Int8 scheme: symmetric per-vector max-abs scaling — q[i] = round(v[i] / s · 127)
with s = max|v|, stored as (array<tinyint>, scale float). Dequantized cosine
error for unit-norm embeddings is ~0.4% absolute, far below typical ranking
gaps; exact re-scoring of a top-k' candidate set (k' > k) restores exact
ranking when needed.

Binary scheme: sign bits (v[i] > 0) packed 32-per-word into array<bigint>,
scored by Hamming distance — `bit_count(xor)` stays entirely inside
whole-stage codegen, and the scan reads dim/32 longs instead of dim floats
(32× less I/O for float32 embeddings). For random unit vectors the expected
angle error of the sign sketch is the SimHash bound (Charikar 2002):
P[bit differs] = θ/π, so Hamming distance is an unbiased angle estimator and
candidate recall at 4× over-fetch is high; `binary_search_rerank` restores
exact cosine order over the candidates. Everything is native column
expressions — quantization happens in the write path's projection, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from penr_oz_agent_memory_rust_spark.functions import similarity
from penr_oz_agent_memory_rust_spark.operators.topk import top_k


def quantize_expr(vec: Column) -> tuple[Column, Column]:
    """Returns (q, scale): q int8 array, scale = max|v| / 127 (0 for the
    zero vector — dequantizes back to zeros)."""
    max_abs = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    scale = (max_abs / F.lit(127.0)).cast("float")
    q = F.transform(
        vec,
        lambda x: F.when(max_abs > 0, F.round(x / max_abs * 127).cast("tinyint")).otherwise(
            F.lit(0).cast("tinyint")
        ),
    )
    return q, scale


def quantize_table(
    vectors: DataFrame, vec_col: str = "embedding", keep_original: bool = False
) -> DataFrame:
    q, scale = quantize_expr(F.col(vec_col))
    out = vectors.withColumn("q_vec", q).withColumn("q_scale", scale)
    return out if keep_original else out.drop(vec_col)


def dequantize_expr(q: Column, scale: Column) -> Column:
    return F.transform(q, lambda x: (x.cast("float") * scale).cast("float"))


def quantized_search(
    quantized: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    round_to: int | None = 6,
) -> DataFrame:
    """Top-k cosine over the quantized table: dequantize in the scan
    projection and score with the f64 kernel (rounded for deterministic
    cross-engine comparison). Approximate by the quantization error only —
    the quantize/dequantize arithmetic itself is deterministic, so this
    whole query is oracle-checkable in SQL."""
    import math

    deq = dequantize_expr(F.col("q_vec"), F.col("q_scale"))
    qlit = similarity.query_vec_lit(query_vec)
    # prenormed form: the query norm is a Python double (same sequential
    # f64 fold as the aggregate expression, bit-identical), and the row
    # side appears exactly 3x (dot, norm-in-condition, norm-in-value)
    # instead of ~5x — interpreted HOFs evaluate once per occurrence, so
    # occurrence count IS the cost model here. The dim guard checks the
    # stored q_vec, not the dequantized expression.
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    na = similarity.norm_f64(deq)
    score = F.when(
        (F.size("q_vec") == F.lit(len(query_vec))) & (na > 0) & (F.lit(qn) > 0),
        similarity.dot_f64(deq, qlit) / (na * F.lit(qn)),
    )
    if round_to is not None:
        score = F.round(score, round_to)
    scored = quantized.withColumn("score", score).filter(F.col("score").isNotNull())
    return top_k(scored, "score", k, tiebreak=id_col).select(id_col, "score")


# ------------------------------------------------------------- binary (1-bit)

BITS_PER_WORD = 32
# 32 sign bits per bigint word (not 64): the MSB-first doubling fold below and
# the DuckDB oracle's pow(2, 31-j) sum both stay exactly representable — and
# far from bigint overflow — at 32 bits, while bit_count(xor) cost is
# identical per packed bit.


def n_words(dim: int) -> int:
    return (dim + BITS_PER_WORD - 1) // BITS_PER_WORD


def binarize_expr(vec: Column, dim: int) -> Column:
    """Pack sign bits (v > 0; ties at 0 and out-of-range tail are 0) into
    array<bigint>, 32 bits per word, MSB-first: bit for dimension i lands at
    weight 2^(31 - i%32) inside word i//32. Pure fold — `F.get` is 0-based
    and null out of range, so the tail word needs no special case."""
    bit = lambda i: (  # noqa: E731
        F.when(F.get(vec, i) > 0, F.lit(1).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    )
    words = [
        F.aggregate(
            F.sequence(F.lit(w * BITS_PER_WORD), F.lit(w * BITS_PER_WORD + BITS_PER_WORD - 1)),
            F.lit(0).cast("bigint"),
            lambda acc, i: acc * 2 + bit(i),
        )
        for w in range(n_words(dim))
    ]
    return F.array(*words)


def binarize_py(vec: list[float]) -> list[int]:
    """Driver-side twin of `binarize_expr` for the query vector."""
    words = []
    for w in range(n_words(len(vec))):
        acc = 0
        for j in range(BITS_PER_WORD):
            i = w * BITS_PER_WORD + j
            acc = acc * 2 + (1 if i < len(vec) and vec[i] > 0 else 0)
        words.append(acc)
    return words


def binarize_table(
    vectors: DataFrame, vec_col: str = "embedding", dim: int | None = None,
    keep_original: bool = False,
) -> DataFrame:
    """Write-path projection: add `b_vec` (packed sign bits). `dim` must be
    the fixed embedding width; pass it explicitly or probe one row first."""
    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])
    out = vectors.withColumn("b_vec", binarize_expr(F.col(vec_col), dim))
    return out if keep_original else out.drop(vec_col)


def hamming_expr(a: Column, b: Column) -> Column:
    """Σ popcount(a XOR b) over the packed words — whole-stage codegen."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("bigint")


def binary_search(
    binarized: DataFrame, query_vec: list[float], k: int = 10, id_col: str = "vec_id"
) -> DataFrame:
    """Top-k by Hamming distance over the packed table. The scan reads only
    `b_vec` (dim/32 longs per row); ascending orderBy().limit() is a
    TakeOrderedAndProject — per-partition bounded heaps, zero shuffle."""
    qwords = binarize_py(query_vec)
    qlit = F.array(*[F.lit(w).cast("bigint") for w in qwords])
    scored = binarized.filter(F.size("b_vec") == len(qwords)).withColumn(
        "hamming", hamming_expr(F.col("b_vec"), qlit)
    )
    return (
        scored.orderBy(F.col("hamming").asc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "hamming")
    )


def binary_search_rerank(
    binarized: DataFrame,
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    rerank_k: int = 40,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Two-stage exact-ish ANN: Hamming top-`rerank_k` candidates from the
    packed scan, then exact f64 cosine over only those candidates (one
    broadcast semi-join against the full-precision table), final top-`k`.
    Both stages are deterministic, so the whole pipeline is oracle-checkable;
    it is 'approximate' only in that the true top-k must survive the
    candidate stage (SimHash recall, 4× over-fetch)."""
    import math

    from pyspark.sql.functions import broadcast

    from penr_oz_agent_memory_rust_spark.functions import similarity

    cand = binary_search(binarized, query_vec, k=rerank_k, id_col=id_col).select(id_col)
    full = vectors.join(broadcast(cand), id_col, "inner")
    qlit = similarity.query_vec_lit(query_vec)
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    na = similarity.norm_f64(F.col(vec_col))
    score = F.when(
        (F.size(vec_col) == F.lit(len(query_vec))) & (na > 0) & (F.lit(qn) > 0),
        similarity.dot_f64(F.col(vec_col), qlit) / (na * F.lit(qn)),
    )
    if round_to is not None:
        score = F.round(score, round_to)
    scored = full.withColumn("score", score).filter(F.col("score").isNotNull())
    return top_k(scored, "score", k, tiebreak=id_col).select(id_col, "score")


def hamming_near_dup_pairs(
    coded: DataFrame,
    max_bits: int = 5,
    bands: int = 8,
    id_col: str = "vec_id",
    code_col: str = "b_vec",
    max_bucket: int = 200,
) -> DataFrame:
    """Near-duplicate pairs by Hamming distance over 64-bit packed codes
    (2 × 32-bit words) — the banded SimHash join: split the 64 bits into
    `bands` equal segments, equi-join only inside (band, value) buckets
    (pigeonhole: a pair differing in ≤ bands−1 bits ALWAYS shares an
    identical band, so recall is exact for max_bits ≤ bands−1), verify
    with bit_count(xor). Candidate volume is Σ bucket², never N²;
    `max_bucket` caps degenerate buckets like the minhash stop-shingle
    cap (set it above the largest expected duplicate-cluster size when
    exact output matters — an oracle mirrors the uncapped join).
    Works on any (id, packed-code) frame: sign-quantized embeddings
    (binarize_table) and perceptual image hashes share this join.
    Output: (u, v, hamming), u < v, one row per pair."""
    assert max_bits <= bands - 1, "pigeonhole recall needs max_bits <= bands - 1"
    # band_val indexes a single 32-bit word and shifts within it, so bands
    # must tile 64 bits evenly with no band straddling a word boundary —
    # i.e. a power of two in [2, 64]; bands=3 or 6 would silently compute
    # wrong bucket values and LOSE pairs despite the pigeonhole guarantee
    assert 64 % bands == 0 and (64 // bands) <= 32 and bands & (bands - 1) == 0, (
        f"bands={bands}: must be a power of two in [2, 64] so every band "
        "fits inside one 32-bit word"
    )
    bits_per_band = 64 // bands
    mask = (1 << bits_per_band) - 1

    def band_val(b: int):
        word = F.get(F.col(code_col), b * bits_per_band // 32)
        shift = 32 - bits_per_band - (b * bits_per_band) % 32
        return F.shiftright(word, shift).bitwiseAND(F.lit(mask))

    sides = coded.select(
        id_col,
        code_col,
        F.array(*[band_val(b) for b in range(bands)]).alias("__bands"),
    )
    exploded = sides.select(
        id_col, code_col, F.posexplode("__bands").alias("band", "val")
    )
    # bound the aggregation buffer BEFORE collecting (r8): the old
    # slice(array_sort(collect_list(...)), 1, max_bucket) form still built
    # the degenerate bucket's full array before truncating — an executor
    # OOM at scale. A per-bucket row_number window (sort-based, spills to
    # disk gracefully) keeps the same truncate-to-smallest semantics the
    # oracle mirrors, and collect_list is then bounded by max_bucket.
    from pyspark.sql import Window as _W

    w = _W.partitionBy("band", "val").orderBy(F.col(id_col), F.col(code_col))
    bounded = exploded.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= max_bucket
    )
    grouped = bounded.groupBy("band", "val").agg(
        F.array_sort(F.collect_list(F.struct(id_col, code_col))).alias("members")
    )
    pairs = grouped.select(
        F.explode(
            F.filter(
                F.flatten(
                    F.transform(
                        F.col("members"),
                        lambda a: F.transform(
                            F.col("members"),
                            lambda b: F.struct(a.alias("a"), b.alias("b")),
                        ),
                    )
                ),
                lambda p: p["a"][id_col] < p["b"][id_col],
            )
        ).alias("p")
    ).select(
        F.col(f"p.a.{id_col}").alias("u"),
        F.col(f"p.b.{id_col}").alias("v"),
        hamming_expr(F.col(f"p.a.{code_col}"), F.col(f"p.b.{code_col}")).alias("hamming"),
    )
    return pairs.filter(F.col("hamming") <= max_bits).dropDuplicates(["u", "v"])
