"""Similarity kernels (SURVEY §2.3: K1 cosine, K2 dot/euclid).

Reference semantics (reference src/memory.rs:150-161): cosine_similarity
returns None when the vectors have mismatched dimensionality or when either
has zero magnitude; math is f32. Here each metric is a *native column
expression* — zip_with + aggregate stay inside whole-stage codegen, so the
kernel is JVM-side and vectorizes with no Python round-trip. A NumPy matmul
variant for the batch-KNN path lives in operators/knn.py.

Two precision families:
  *_f32 — float accumulate, mirrors the reference bit-for-bit-ish (1e-6 tol).
  *_f64 — double accumulate; used by oracle-checked queries where the DuckDB
           oracle also accumulates in double over the same element order.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

Metric = str  # "cosine" | "dot" | "euclid"


def _dot(a: Column, b: Column, acc_type: str) -> Column:
    """Sequential left-to-right fold of elementwise products (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast(acc_type),
        lambda acc, x: acc + x,
    )


def dot_f32(a: Column, b: Column) -> Column:
    return _dot(a, b, "float")


def dot_f64(a: Column, b: Column) -> Column:
    return _dot(a.cast("array<double>"), b.cast("array<double>"), "double")


def norm_f32(a: Column) -> Column:
    """‖a‖ as f32 — sqrt of the f32 dot, cast back to float like Rust f32::sqrt."""
    return F.sqrt(dot_f32(a, a)).cast("float")


def norm_f64(a: Column) -> Column:
    return F.sqrt(dot_f64(a, a))


def _comparable(a: Column, b: Column) -> Column:
    """Dim-match guard (reference src/memory.rs:151-153)."""
    return F.size(a) == F.size(b)


def cosine_f32(a: Column, b: Column) -> Column:
    """Cosine similarity, NULL on dim mismatch or zero norm (src/memory.rs:150-161)."""
    na, nb = norm_f32(a), norm_f32(b)
    return F.when(
        _comparable(a, b) & (na > 0) & (nb > 0),
        (dot_f32(a, b) / (na * nb)).cast("float"),
    )


def cosine_f64(a: Column, b: Column) -> Column:
    na, nb = norm_f64(a), norm_f64(b)
    return F.when(_comparable(a, b) & (na > 0) & (nb > 0), dot_f64(a, b) / (na * nb))


def euclidean_f32(a: Column, b: Column) -> Column:
    """Euclidean distance; NULL on dim mismatch (K2, reference src/config.rs:66-69)."""
    diff2 = F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0).cast("float"),
        lambda acc, x: acc + x,
    )
    return F.when(_comparable(a, b), F.sqrt(diff2).cast("float"))


def euclidean_f64(a: Column, b: Column) -> Column:
    ad, bd = a.cast("array<double>"), b.cast("array<double>")
    diff2 = F.aggregate(
        F.zip_with(ad, bd, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(_comparable(a, b), F.sqrt(diff2))


def score_expr(metric: Metric, a: Column, b: Column, precision: str = "f32") -> Column:
    """Dispatch on the collection-level distance metric (reference
    src/config.rs:66-69 — Cosine | Dot | Euclid)."""
    table = {
        ("cosine", "f32"): cosine_f32,
        ("cosine", "f64"): cosine_f64,
        ("dot", "f32"): dot_f32,
        ("dot", "f64"): dot_f64,
        ("euclid", "f32"): euclidean_f32,
        ("euclid", "f64"): euclidean_f64,
    }
    key = (metric.lower(), precision)
    if key not in table:
        raise ValueError(f"unknown metric/precision: {metric}/{precision}")
    return table[key](a, b)


def query_vec_lit(vec: list[float], precision: str = "f32") -> Column:
    """A literal query vector column (driver-side embed result → plan literal)."""
    elem = "float" if precision == "f32" else "double"
    return F.array(*[F.lit(float(x)).cast(elem) for x in vec])


def cosine_f64_prenormed(dot: Column, na: Column, nb: Column, comparable: Column) -> Column:
    """Cosine from PRE-PROJECTED dot and norms: same formula and f64 values
    as cosine_f64, but callers project `norm_f64` per side first, so each
    interpreted higher-order aggregate runs once per row instead of once
    per expression occurrence (the when-condition and the value would
    otherwise each evaluate both norms), and a broadcast side's norms are
    computed once per query rather than once per pair."""
    return F.when(comparable & (na > 0) & (nb > 0), dot / (na * nb))
