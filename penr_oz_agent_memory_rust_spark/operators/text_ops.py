"""Text-analysis operators for training-data pipelines (north-star, ★).

Language-ID, quality scoring, token counting, fingerprinting — all as native
column expressions (JVM-side, codegen'd, no Python in the hot path) and all
oracle-expressible in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from penr_oz_agent_memory_rust_spark.functions import hashing

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
# Deliberately deterministic and SQL-portable (regexp word-boundary counts).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "is"],
    "de": ["der", "die", "und", "das", "nicht", "ist"],
    "es": ["el", "la", "que", "los", "una", "es"],
    "fr": ["le", "la", "les", "des", "est", "une"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2", "you3"],
}

BPE_ISH_TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def _marker_hits(text: Column, words: list[str]) -> Column:
    """Count of marker-word occurrences (word-bounded)."""
    pattern = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pattern), F.lit(0)))


def lang_id_expr(text: Column, langs: dict[str, list[str]] | None = None) -> Column:
    """Predicted language = argmax over marker-hit counts, 'und' when all 0.
    Ties break by language code ascending (deterministic)."""
    langs = langs or LANG_MARKERS
    # Chained CASE fold (fully portable to the SQL oracle): argmax with
    # ties going to the ascending-first language code.
    result = F.lit("und")
    best_hits = F.lit(0)
    for code, words in sorted(langs.items(), reverse=True):
        hits = _marker_hits(text, words)
        # >= so that earlier (asc) codes win ties as we fold in reverse order
        result = F.when(hits >= F.greatest(best_hits, F.lit(1)), F.lit(code)).otherwise(result)
        best_hits = F.greatest(best_hits, hits)
    return result


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(text), r"\s+"))


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish token count: alpha runs + digit runs + individual punctuation."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_TOKEN_RE), F.lit(0)))


def quality_score_expr(text: Column) -> Column:
    """Heuristic quality score in [0,1]: rewards mid-length docs and
    alphabetic content, penalizes punctuation soup. Rounded to 6dp for
    oracle comparison. Components:
      len_score   = least(1, n_chars / 500)
      alpha_ratio = alpha chars / n_chars
      punct_ratio = punct chars / n_chars
      score = round(0.4*len + 0.5*alpha + 0.1*(1 - least(1, 4*punct)), 6)
    """
    n = F.length(text).cast("double")
    alpha = F.length(F.regexp_replace(text, r"[^a-zA-Z]", "")).cast("double")
    punct = F.length(F.regexp_replace(text, r"[a-zA-Z0-9\s]", "")).cast("double")
    len_score = F.least(F.lit(1.0), n / 500.0)
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(0.0)
    punct_ratio = F.when(n > 0, punct / n).otherwise(0.0)
    score = 0.4 * len_score + 0.5 * alpha_ratio + 0.1 * (1.0 - F.least(F.lit(1.0), 4.0 * punct_ratio))
    return F.round(score, 6)


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Token-window chunking for training/embedding pipelines: split each
    document into whitespace-token windows of `chunk_tokens` advancing by
    `stride` (overlap = chunk_tokens - stride). Pure expressions —
    sequence/slice/concat run JVM-side; one row per chunk via posexplode.
    Output: (doc_id, chunk_idx, chunk_text, n_chunk_tokens).
    """
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(F.lit(1), n - F.lit(chunk_tokens) + F.lit(stride)), F.lit(stride))
    chunks = F.transform(starts, lambda s: F.concat_ws(" ", F.slice(toks, s, chunk_tokens)))
    exploded = docs.select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk_text"))
    return exploded.select(
        id_col,
        "chunk_idx",
        "chunk_text",
        F.size(F.split(F.col("chunk_text"), " ")).cast("bigint").alias("n_chunk_tokens"),
    )


def deterministic_sample(
    df: DataFrame, id_col: str, percent: int, salt: str = "sample"
) -> DataFrame:
    """Reproducible Bernoulli-by-hash sampling: keep rows whose portable
    md5-hash of (salt|id) lands under `percent` of the 0..99 range. Unlike
    df.sample(), the SAME rows survive on every engine and every run — the
    property training-data pipelines need for resumable sampling."""
    bucket = hashing.md5_long(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string"))) % 100
    return df.filter(bucket < percent)


def analyze_documents(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Full text-analysis projection over a documents table. Deliberately
    NOT cpu_rebalance()d: the profile is one exchange-free scan, and the
    regex stack is cheap enough that adding a shuffle to spread a
    single-file input measured slower than just running it."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        lang_id_expr(t).alias("pred_lang"),
        token_count_ws(t).alias("n_tokens_ws"),
        token_count_bpe_ish(t).alias("n_tokens_bpe"),
        quality_score_expr(t).alias("quality"),
        hashing.fingerprint(t).alias("fp"),
    )


def register_bigrams_udtf(spark) -> None:
    """Python UDTF (Spark 4 table-function API): lateral-join a text column
    into (idx, bigram) rows. Registered as SQL `bigrams(text)` — the
    user-extensible row-expanding operator surface (the DataFrame explode
    form covers the built-in cases; a UDTF covers arbitrary Python
    expansion logic with a declared schema)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="idx int, bigram string", useArrow=True)
    class Bigrams:
        def eval(self, text: str):
            if text is None:
                return
            toks = text.lower().split(" ")
            for i in range(len(toks) - 1):
                yield i, toks[i] + " " + toks[i + 1]

    spark.udtf.register("bigrams", Bigrams)
