"""Text-analysis operators for training-data pipelines (north-star, ★).

Language-ID, quality scoring, token counting, fingerprinting — all as native
column expressions (JVM-side, codegen'd, no Python in the hot path) and all
oracle-expressible in DuckDB SQL.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F

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


def source_quality_profile(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    gopher_kwargs: dict | None = None,
) -> DataFrame:
    """★ per-SOURCE (domain-level) quality profile — the aggregation
    behind RefinedWeb/CCNet-style source filtering (public papers), where
    curation decisions are made per crawl domain rather than per document:
    a domain whose documents systematically fail quality rules is dropped
    wholesale, which removes spam farms a per-doc filter would nibble at.

    Per source: doc count, mean/stddev of the heuristic quality score,
    mean doc length, and the fraction of docs passing the Gopher rules
    (gopher_ok_expr with `gopher_kwargs`). One map-only projection + one
    map-side-combinable aggregation — the exchange carries one row per
    source. Fractions/means rounded 6dp for the oracle.
    Output: (source, n_docs, mean_quality, std_quality, mean_len,
    gopher_pass_rate)."""
    gk = gopher_kwargs or {}
    ok = gopher_ok_expr(F.col(text_col), **gk)
    scored = docs.select(
        F.col(source_col).alias("source"),
        quality_score_expr(F.col(text_col)).alias("__q"),
        F.length(text_col).cast("double").alias("__len"),
        ok.cast("int").alias("__ok"),
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("__q"), 6).alias("mean_quality"),
        F.round(F.coalesce(F.stddev_samp("__q"), F.lit(0.0)), 6).alias("std_quality"),
        F.round(F.avg("__len"), 6).alias("mean_len"),
        F.round(F.avg("__ok"), 6).alias("gopher_pass_rate"),
    )


def filter_low_quality_sources(
    docs: DataFrame,
    profile: DataFrame,
    min_gopher_pass_rate: float = 0.5,
    min_mean_quality: float = 0.0,
    source_col: str = "source",
) -> DataFrame:
    """★ domain-level curation: drop every document whose SOURCE fails the
    profile thresholds (pass-rate or mean-quality below the floor) — the
    wholesale-domain drop that complements per-doc filtering. The reject
    list is one row per failing source, broadcast into an anti-join, so
    the corpus side is one scan with no shuffle. Thresholds compare the
    profile's 6dp-rounded columns (oracle-aligned)."""
    bad = profile.filter(
        (F.col("gopher_pass_rate") < min_gopher_pass_rate)
        | (F.col("mean_quality") < min_mean_quality)
    ).select(F.col("source").alias(source_col))
    return docs.join(F.broadcast(bad), source_col, "left_anti")


def strip_common_lines(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_frac: float = 0.5,
    min_docs: int = 2,
) -> DataFrame:
    """★ per-group common-LINE boilerplate removal (the CCNet/RefinedWeb
    structural-dedup stage): a line occurring in >= `min_frac` of a
    group's documents (and >= `min_docs` of them) is template boilerplate
    — site headers, footers, nav, cookie banners — and is dropped from
    every document of that group; text is rebuilt from the surviving
    lines in order. Complements strip_boilerplate_spans (token-gram
    level, corpus-wide df): lines are the natural unit when the template
    is page STRUCTURE rather than flowing text, and grouping by
    source/domain keeps one site's chrome from needing corpus-level df to
    clear the threshold. Output: (id, group, n_lines, n_removed,
    text_clean) for every document.

    Scale shape — ENTIRELY JVM expressions, no Python in the hot path:
    per-(group, line) document frequency is one hash-agg over exploded
    DISTINCT lines (map-side partial); group doc counts are a broadcast;
    the boilerplate vocabulary aggregates to ONE array row per group
    (bounded: each member line occurs in >= min_frac of the group's docs,
    so |vocab| <= |distinct lines| / min_frac / |docs| ~ lines-per-doc /
    min_frac) and broadcast-joins back; the rewrite is
    filter(split(text)) + array_join — whole-stage-codegen, the corpus
    never shuffles.

    NULL text passes through explicitly (r9 ADVICE): output
    (n_lines=0, n_removed=0, text_clean=NULL), matching the
    _rewrite_without_cut_spans null contract of the gram-level sibling —
    without the guard, split(NULL) made the counts config-dependent
    (-1/0/null under legacy sizeOfNull vs ANSI). Null-text docs are also
    excluded from the min_frac denominator: they contribute no lines, so
    counting them would only deflate every line's frequency fraction."""
    if not 0.0 < min_frac <= 1.0:
        raise ValueError(f"min_frac must be in (0, 1], got {min_frac}")
    lines_arr = F.split(F.col(text_col), "\n")
    nonnull = docs.filter(F.col(text_col).isNotNull())
    exploded = nonnull.select(
        F.col(group_col),
        F.col(id_col),
        F.explode(F.array_distinct(lines_arr)).alias("__line"),
    )
    group_n = nonnull.groupBy(group_col).agg(F.count("*").alias("__gn"))
    boiler = (
        exploded.groupBy(group_col, "__line")
        .agg(F.count_distinct(F.col(id_col)).alias("__df"))
        .join(F.broadcast(group_n), group_col)
        .filter(
            (F.col("__df") >= F.lit(int(min_docs)))
            & (F.col("__df") >= F.col("__gn") * F.lit(float(min_frac)))
        )
        .groupBy(group_col)
        .agg(F.collect_set("__line").alias("__boiler"))
    )
    kept = F.filter(
        lines_arr, lambda l: ~F.coalesce(F.array_contains("__boiler", l), F.lit(False))
    )
    is_null = F.col(text_col).isNull()
    return (
        docs.join(F.broadcast(boiler), group_col, "left")
        .select(
            F.col(id_col),
            F.col(group_col),
            F.when(is_null, F.lit(0))
            .otherwise(F.size(lines_arr))
            .cast("bigint")
            .alias("n_lines"),
            F.when(is_null, F.lit(0))
            .otherwise(F.size(lines_arr) - F.size(kept))
            .cast("bigint")
            .alias("n_removed"),
            F.when(is_null, F.lit(None).cast("string"))
            .otherwise(F.array_join(kept, "\n"))
            .alias("text_clean"),
        )
    )


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


def strip_markup(text: Column) -> Column:
    """HTML/markup stripping for crawl-style extraction (the C4/CCNet
    front step): drop <script>/<style> blocks WITH their content, remove
    every remaining tag, decode the common entities, collapse whitespace.
    A pure regexp_replace chain — JVM-side, oracle-portable (DuckDB's
    regexp_replace with the 'gis' flags mirrors each step), and a few
    orders of magnitude cheaper than a DOM parse, which is the right
    trade for bulk crawl text where malformed markup is the norm. For
    layout-aware boilerplate removal (nav/footer density pruning), plug a
    real extractor in as an Arrow UDF — this is the scalable default.
    """
    # (?is): case-insensitive, dot-matches-newline — script/style blocks
    # span lines and close tags vary in case
    no_script = F.regexp_replace(text, r"(?is)<script\b[^>]*>.*?</script>", " ")
    no_style = F.regexp_replace(no_script, r"(?is)<style\b[^>]*>.*?</style>", " ")
    no_comment = F.regexp_replace(no_style, r"(?s)<!--.*?-->", " ")
    no_tags = F.regexp_replace(no_comment, r"(?s)<[^>]+>", " ")
    ent = no_tags
    for pat, rep in (
        ("&nbsp;", " "),
        ("&amp;", "&"),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
    ):
        ent = F.replace(ent, F.lit(pat), F.lit(rep))
    return F.trim(F.regexp_replace(ent, r"\s+", " "))


def cdc_chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram: int = 8,
    modulus: int = 64,
) -> DataFrame:
    """Content-defined chunking: split each normalized document at
    positions where the rolling k-gram hash satisfies
    md5(gram) % modulus == 0 — expected chunk length ≈ `modulus` chars.
    Unlike the fixed token windows of chunk_documents, CDC boundaries are
    ANCHORED TO CONTENT: inserting a paragraph shifts every fixed window
    after it (all their fingerprints change), but CDC boundaries
    re-synchronize immediately — the property that makes cross-snapshot
    chunk dedup work (rsync/LBFS/casync all rely on it).

    Output: (id, chunk_idx, chunk_start, chunk_len, chunk_fp) — start is
    1-based into the normalized text; fp is md5 of the chunk substring.

    Scale shape: explode the gram positions (n rows per n-char doc, same
    volume as every shingle operator), evaluate md5 JVM-side, keep ONLY
    boundary rows (a ~1/modulus sliver), then one per-doc window over
    that sliver assigns chunk indexes — the window input is boundaries,
    not characters, so the sort is ~len/modulus rows per doc. The portable
    md5 hash keeps the whole operator oracle-checkable; a production
    deployment would swap in a true rolling Rabin fingerprint (O(1) per
    position instead of O(gram)) — the boundary/window plumbing is
    unchanged, only the hash column expression differs.
    """
    norm = hashing.normalized_text(F.col(text_col))
    # rebalance first: a single-file scan arrives as ONE partition, which
    # would run the normalize regexes AND the per-position md5 explode on
    # one core (profiled 3.0 s + 3.9 s single-task at sf0.1; the shuffle
    # is a no-op at real scale — same contract as word_shingle_rows)
    base = hashing.cpu_rebalance(docs).select(
        F.col(id_col), norm.alias("__norm"), F.length(norm).alias("__n")
    ).filter(F.col("__n") >= 1)
    # materialize the normalized text once (r10): `base` is consumed by
    # the boundary UDF, the body-chunk join, and the tail branch, and the
    # 3-regex normalization was re-evaluated in each (warm profile: the
    # final 64-task union stage spent ~23 s CPU, nearly all of it
    # re-normalizing). One write + three column-pruned reads wins at any
    # scale vs three full normalize passes.
    # r11 (recovery semantics): this frame is CORPUS-sized, so it uses
    # persist(DISK_ONLY) — recomputable from lineage if an executor (and
    # its local blocks) is lost — instead of localCheckpoint, which
    # truncates lineage onto executor-local storage and makes an executor
    # loss fatal to the job at cluster scale. The BOUNDED frames below
    # (the ~1/modulus boundary sliver) keep the eager checkpoint: tiny,
    # and the barrier there also cuts the plan the window re-reads.
    from pyspark import StorageLevel

    base = base.persist(StorageLevel.DISK_ONLY)
    # boundary positions: gram ENDS at i (1-based), i < n (no empty tail).
    # Computed in ONE Arrow pass per doc (r10): the pre-r10 plan exploded
    # every character position and carried the WHOLE normalized text into
    # each exploded row to evaluate substring+md5 there — O(len²) bytes
    # of row materialization per document (≈5 GB at sf0.1) for an
    # O(len) decision. The UDF evaluates the identical predicate
    # (int(md5(utf8(norm[i-gram:i])).hexdigest()[:15], 16) % modulus == 0
    # — md5_long of the same substring; Spark substring and Python slices
    # are both codepoint-based) and emits only the ~1/modulus boundary
    # sliver.
    import hashlib as _hl

    from pyspark.sql import types as _T

    @F.pandas_udf(_T.ArrayType(_T.IntegerType()))
    def _cdc_bounds(norms: pd.Series) -> pd.Series:
        # r11 (guide §4.2 hoist Python-loop overhead; the predicate is
        # output-semantic so the HASH cannot change, only its evaluation):
        # int(hexdigest()[:15], 16) == the top 60 bits of the digest ==
        # int.from_bytes(digest()[:8]) >> 4 — digest() skips the 32-char
        # hex-string format + parse per position. normalized_text strips
        # to [a-z0-9 ], so the text is ASCII by construction and byte
        # slicing == codepoint slicing; encode ONCE per doc and slice
        # bytes (guarded by isascii() so a future non-ASCII normalizer
        # falls back to the bit-identical per-codepoint slice).
        md5 = _hl.md5
        from_bytes = int.from_bytes

        def bnds(s):
            if s is None:
                return []
            n = len(s)
            out = []
            if s.isascii():
                b = s.encode()
                for i in range(gram, n):  # i is the 1-based gram END position
                    if (from_bytes(md5(b[i - gram : i]).digest()[:8], "big") >> 4) % modulus == 0:
                        out.append(i)
            else:
                for i in range(gram, n):
                    if (from_bytes(md5(s[i - gram : i].encode()).digest()[:8], "big") >> 4) % modulus == 0:
                        out.append(i)
            return out

        return norms.map(bnds)

    bounds = (
        base.select(id_col, F.explode(_cdc_bounds("__norm")).alias("__b"))
        # bounds feeds BOTH the chunk window and the per-doc tail agg;
        # materialize the ~1/modulus boundary sliver once so the
        # per-position pass runs once, not once per consumer. The sliver
        # is bounded (corpus_chars/modulus rows of two ints), unlike the
        # corpus scan, which stays re-scannable.
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy(id_col).orderBy("__b")
    starts = bounds.select(
        id_col,
        (F.lag("__b", 1, 0).over(w) + 1).alias("chunk_start"),
        (F.col("__b") - F.lag("__b", 1, 0).over(w)).alias("chunk_len"),
        (F.row_number().over(w) - 1).alias("chunk_idx"),
        F.col("__b").alias("__end"),
    )
    # trailing chunk per doc: from last boundary (or 0) to n
    last = bounds.groupBy(id_col).agg(
        F.max("__b").alias("__last"), F.count("*").alias("__nb")
    )
    tail = (
        base.join(last, id_col, "left")
        .select(
            id_col,
            "__norm",
            "__n",
            (F.coalesce("__last", F.lit(0)) + 1).alias("chunk_start"),
            (F.col("__n") - F.coalesce("__last", F.lit(0))).alias("chunk_len"),
            F.coalesce("__nb", F.lit(0)).cast("int").alias("chunk_idx"),
        )
        .filter(F.col("chunk_len") >= 1)
    )
    body = starts.join(base, id_col).select(
        id_col, "__norm", "chunk_start", "chunk_len", "chunk_idx"
    )
    allc = body.unionByName(tail.select(body.columns))
    return allc.select(
        id_col,
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.col("chunk_start").cast("bigint").alias("chunk_start"),
        F.col("chunk_len").cast("bigint").alias("chunk_len"),
        F.md5(F.expr("substring(__norm, chunk_start, chunk_len)")).alias("chunk_fp"),
    )


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    form: str = "NFC",
    strip_control: bool = True,
    collapse_ws: bool = True,
    out_col: str | None = None,
) -> DataFrame:
    """★ Unicode text normalization — the first stage of any multilingual
    corpus pipeline (scrapes mix precomposed and combining-mark encodings
    of the SAME grapheme, so dedup fingerprints and shingles diverge on
    visually identical text until canonicalized). Three passes:

      1. strip C0/C1 control chars (native regexp_replace, JVM-side)
      2. Unicode normalization to `form` (NFC/NFKC/NFD/NFKD) — the one
         step with no Spark builtin, done as an Arrow-batched pandas UDF
         over Python's unicodedata (same canonical algorithm DuckDB's
         nfc_normalize implements, so the oracle matches byte-for-byte)
      3. collapse whitespace runs to one space and trim (JVM-side)

    Map-only: no shuffle, no state — at 100 TB this pipelines inside the
    ingest scan. Replaces `text_col` in place unless `out_col` is given."""
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"form must be NFC/NFKC/NFD/NFKD, got {form!r}")
    dst = out_col or text_col
    c: Column = F.col(text_col)
    if strip_control:
        c = F.regexp_replace(c, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "")

    @F.pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        # vectorized: pandas' Series.str.normalize wraps the same
        # unicodedata algorithm and propagates nulls (r6 advisor nit).
        # Byte-equal to the per-element s.map(lambda) form (verified at
        # sf0.1); wall time there is within VM noise (min 0.63 s both —
        # the fixture docs are short ASCII) — the win is avoiding a
        # Python-level lambda per row as strings grow.
        return s.str.normalize(form)

    c = _norm(c)
    if collapse_ws:
        c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return df.withColumn(dst, c)


def deterministic_sample(
    df: DataFrame, id_col: str, percent: int, salt: str = "sample"
) -> DataFrame:
    """Reproducible Bernoulli-by-hash sampling: keep rows whose portable
    md5-hash of (salt|id) lands under `percent` of the 0..99 range. Unlike
    df.sample(), the SAME rows survive on every engine and every run — the
    property training-data pipelines need for resumable sampling."""
    bucket = hashing.md5_long(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string"))) % 100
    return df.filter(bucket < percent)


def weighted_bernoulli_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    expected_k: int,
    salt: str = "wsample",
) -> DataFrame:
    """Weighted Poisson/Bernoulli sampling with expected size `expected_k`:
    row i survives iff u_i < expected_k * w_i / Σw, with u_i the portable
    md5 uniform of (salt|id). Weight-proportional inclusion — the
    importance-sampling primitive for training-data mixes — and FULLY
    deterministic across engines and runs: Σw of an integer weight column
    is exact (order-independent), u_i is a 60-bit hash ratio, and no
    transcendental ever enters, unlike the Efraimidis–Spirakis u^(1/w)
    key whose pow() last-ulps differ per libm. One exact aggregate for
    Σw (a scalar broadcast as a literal), then one map-only pass.

    Σw sums only weight > 0 rows — the same rows eligible for output —
    so zero/negative weights (excluded from the sample) don't deflate
    every survivor's inclusion probability. An empty or all-nonpositive
    input returns an empty frame instead of dividing by a null Σw."""
    total_w = (
        df.filter(F.col(weight_col) > 0)
        .agg(F.sum(F.col(weight_col).cast("bigint")))
        .first()[0]
    )
    if not total_w:
        return df.limit(0)
    u = (
        hashing.md5_long(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string")))
        .cast("double")
        / F.lit(float(1 << 60))
    )
    p = (
        F.lit(int(expected_k)) * F.col(weight_col).cast("double") / F.lit(float(total_w))
    )
    return df.filter(F.col(weight_col) > 0).filter(u < F.least(p, F.lit(1.0)))


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


def repetition_profile(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """★ Gopher-style repetition signals per document (Rae et al. 2021,
    §A1.1 "repetition removal" — public paper): the fraction of duplicated
    words and the mass of the most frequent word/bigram, which catch
    keyword-stuffed and boilerplate-looped documents that length/punct
    heuristics miss. Output per doc:

      n_words          whitespace token count
      dup_word_frac    1 - distinct_words / n_words
      top_word_frac    occurrences of the most frequent word / n_words
      top_bigram_frac  occurrences of the most frequent word-bigram /
                       (n_words - 1); null for 1-word docs
      repetition_ok    dup_word_frac <= 0.30 AND top_bigram_frac <= 0.18
                       (Gopher's top-2-gram threshold; dup threshold
                       adapted from its dup-line rule for lineless docs)

    Scale shape: two explode -> groupBy((id, gram)) -> groupBy(id)
    pipelines joined on id. The (id, gram) keys make partial aggregation
    collapse each document inside its own scan partition (docs are
    contiguous), so the exchanges carry one row per distinct gram per doc,
    never one per token; no windows, no skew (id is in every key). All
    fractions rounded to 6dp (f64) for the oracle."""
    toks = hashing.word_tokens(F.col(text_col))
    words = docs.select(F.col(id_col), F.explode(toks).alias("w"))
    word_stats = (
        words.groupBy(id_col, "w")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_words"),
            F.count("*").alias("n_distinct"),
            F.max("c").alias("top_word"),
        )
    )
    bigrams = (
        docs.select(F.col(id_col), toks.alias("__toks"))
        .filter(F.size("__toks") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("__toks") - F.lit(1)),
                    lambda i: F.concat_ws(" ", F.slice(F.col("__toks"), i, 2)),
                )
            ).alias("bg"),
        )
    )
    bigram_stats = (
        bigrams.groupBy(id_col, "bg")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(F.sum("c").alias("n_bigrams"), F.max("c").alias("top_bigram"))
    )
    dup_frac = F.round(1.0 - F.col("n_distinct") / F.col("n_words"), 6)
    top_w_frac = F.round(F.col("top_word") / F.col("n_words"), 6)
    top_bg_frac = F.round(F.col("top_bigram") / F.col("n_bigrams"), 6)
    return (
        word_stats.join(bigram_stats, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_words"),
            dup_frac.alias("dup_word_frac"),
            top_w_frac.alias("top_word_frac"),
            top_bg_frac.alias("top_bigram_frac"),
            (
                (dup_frac <= 0.30) & F.coalesce(top_bg_frac <= 0.18, F.lit(True))
            ).alias("repetition_ok"),
        )
    )


# Gopher's rule-based quality filter checks for the presence of a tiny
# English stop list (Rae et al. 2021, §A1.1: "the, be, to, of, and, that,
# have, with") — a cheap "is this prose at all" signal.
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_quality_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
    alpha_regex: str = "[a-z]",
) -> DataFrame:
    """★ Gopher rule-based quality filter (Rae et al. 2021, §A1.1 "quality
    filtering" — public paper): the line- and word-level heuristics that
    complement `repetition_profile` (which covers the same appendix's
    repetition rules). Per doc:

      n_words             whitespace token count (empty tokens dropped)
      mean_word_len       mean characters per word; Gopher keeps [3, 10]
      symbol_word_ratio   ('#' + ellipsis occurrences) / n_words; <= 0.1
      bullet_line_frac    non-empty lines starting with a bullet
                          (-, *, •) / lines; <= 0.9
      ellipsis_line_frac  non-empty lines ending with ... or …; <= 0.3
      alpha_word_frac     words containing an alphabetic char; >= 0.8
      stopword_hits       distinct GOPHER_STOPWORDS present; >= 2
      gopher_ok           all thresholds hold (null-safe: degenerate
                          docs fail closed)

    `alpha_regex` governs alpha_word_frac's notion of "alphabetic": the
    default `[a-z]` is faithful to the English-targeted paper and FAILS
    NON-LATIN CORPORA CLOSED (Cyrillic/Greek/CJK words count as
    non-alphabetic) — intentional for English curation, wrong for
    multilingual use; pass r"\\p{L}" there (test-pinned both ways).

    Thresholds compare the 6dp-ROUNDED metrics so the Spark plan and the
    SQL oracle agree at the boundaries. All metrics are pure higher-order
    array expressions over one split — a single map-only scan with no
    exchange, no UDF, nothing that changes shape at 100 TB; the filter
    pipelines into the ingest scan exactly like `quality_score_expr`.
    """
    m = _gopher_metrics(F.col(text_col), alpha_regex)
    profiled = docs.select(
        F.col(id_col), *[expr.alias(name) for name, expr in m.items()]
    )
    ok = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("symbol_word_ratio") <= max_symbol_word_ratio)
        & (F.col("bullet_line_frac") <= max_bullet_line_frac)
        & (F.col("ellipsis_line_frac") <= max_ellipsis_line_frac)
        & (F.col("alpha_word_frac") >= min_alpha_word_frac)
        & (F.col("stopword_hits") >= min_stopword_hits)
    )
    return profiled.withColumn("gopher_ok", F.coalesce(ok, F.lit(False)))


def _gopher_metrics(t: Column, alpha_regex: str = "[a-z]") -> dict[str, Column]:
    """The gopher metric expressions keyed by output name — shared by the
    profiling projection (gopher_quality_rules) and the inline predicate
    (gopher_ok_expr). ``alpha_regex`` decides what counts as an
    alphabetic word for alpha_word_frac; the default matches the
    English-targeted paper (Latin letters after lower-casing), which
    fails non-Latin corpora CLOSED — pass e.g. r"\\p{L}" (any Unicode
    letter) for multilingual curation."""
    # any-whitespace split (NOT hashing.word_tokens' single-space split):
    # line rules imply multi-line docs, where newline-joined tokens must
    # count as separate words; identical on single-space corpora
    words = F.filter(F.split(F.lower(t), r"\s+"), lambda w: w != F.lit(""))
    lines = F.filter(F.split(t, "\n"), lambda line: F.trim(line) != F.lit(""))
    n_words = F.size(words).cast("long")
    n_lines = F.size(lines).cast("long")
    sum_word_len = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    alpha_words = F.size(F.filter(words, lambda w: w.rlike(alpha_regex)))
    hash_cnt = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    ellipsis_cnt = (
        (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
        + (F.length(t) - F.length(F.replace(t, F.lit("…"), F.lit(""))))
    ).cast("long")
    bullet_lines = F.size(
        F.filter(lines, lambda line: F.trim(line).rlike("^[-*•]"))
    )
    ellipsis_lines = F.size(
        F.filter(lines, lambda line: F.rtrim(line).rlike("(\\.\\.\\.|…)$"))
    )
    stop_arr = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    stopword_hits = F.size(
        F.array_intersect(F.array_distinct(words), stop_arr)
    ).cast("long")
    frac = lambda num, den: F.when(den > 0, F.round(num / den, 6))  # noqa: E731
    return {
        "n_words": n_words,
        "mean_word_len": frac(sum_word_len, n_words),
        "symbol_word_ratio": frac(hash_cnt + ellipsis_cnt, n_words),
        "bullet_line_frac": frac(bullet_lines, n_lines),
        "ellipsis_line_frac": frac(ellipsis_lines, n_lines),
        "alpha_word_frac": frac(alpha_words, n_words),
        "stopword_hits": stopword_hits,
    }


def gopher_ok_expr(
    text: Column,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
    alpha_regex: str = "[a-z]",
) -> Column:
    """★ gopher_quality_rules' pass/fail verdict as a single inline
    PREDICATE — `docs.filter(gopher_ok_expr(F.col("text")))` — for
    pipelines that only need the verdict, not the metric columns.

    This form matters at scale: materializing a keep-list and semi-joining
    it back adds a corpus-sized sort-merge shuffle once the id list
    outgrows the broadcast threshold — cost that grows with the table —
    while the inline predicate evaluates in the scan stage with zero
    joins and zero exchanges (plan-pinned). At 2M docs locally the two
    tie (the shuffle is still cheap there) and filter-first saves ~15% of
    the downstream pair stage either way; the structural win is the
    deleted exchange (PLANS.md "Filter-first curation probe"). Same
    6dp-rounded threshold semantics as gopher_quality_rules (equivalence
    test-pinned); degenerate docs fail closed. `alpha_regex` as in
    gopher_quality_rules (default Latin-only, English-targeted)."""
    m = _gopher_metrics(text, alpha_regex)
    ok = (
        m["n_words"].between(min_words, max_words)
        & m["mean_word_len"].between(min_mean_word_len, max_mean_word_len)
        & (m["symbol_word_ratio"] <= max_symbol_word_ratio)
        & (m["bullet_line_frac"] <= max_bullet_line_frac)
        & (m["ellipsis_line_frac"] <= max_ellipsis_line_frac)
        & (m["alpha_word_frac"] >= min_alpha_word_frac)
        & (m["stopword_hits"] >= min_stopword_hits)
    )
    return F.coalesce(ok, F.lit(False))


def winnowing_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """★ winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003 — the MOSS algorithm, public paper): hash every k-char
    gram of the normalized text, slide a window of `window` consecutive
    gram hashes, and select the minimum hash of each window (rightmost
    position on ties). The selected set is position-robust: any shared
    substring of length >= k + window - 1 is guaranteed to contribute at
    least one common fingerprint, at ~2/(window+1) the density of the full
    gram set. Output: distinct (doc_id, pos, fp), pos 1-based into the
    normalized text.

    The min-then-rightmost rule runs as ONE window min by packing
    (hash, position) into a single bigint: key = h40 * 2^20 + (2^20-1-pos)
    — 40-bit gram hash, 20-bit reversed position, so bigint `min` picks
    the smallest hash and, among equals, the largest pos. Portable: the
    oracle computes the identical key. Docs are truncated at 2^20-1 grams
    (1M chars) to keep the packing exact — fingerprint the leading 1 MB,
    the standard containment-screen compromise.

    Scale shape: winnowing is PURELY per-document — no cross-doc operator
    exists anywhere in the algorithm — so the whole selection runs in one
    Arrow pass (mapInPandas): per doc, hash the grams (C-speed hashlib),
    sliding-window min over the packed keys (numpy stride view), dedupe
    the selected set locally, emit rows. ZERO exchanges — the prior shape
    (explode 1 row/char-position -> per-doc window sort -> global
    distinct) shuffled ~n_chars rows twice; warm interleaved A/B at sf0.1
    is in the commit. Tail windows (< w grams remaining) shrink via +inf
    padding, matching the oracle's shrinking-frame semantics at doc
    boundaries."""
    import hashlib as _hl

    import numpy as np
    import pandas as pd

    max_pos = (1 << 20) - 1
    norm = hashing.normalized_text(F.col(text_col))
    base = hashing.cpu_rebalance(
        docs.select(F.col(id_col), norm.alias("__t")).filter(F.length("__t") >= k)
    )

    def gen(batches):
        pad = np.full(window - 1, np.iinfo(np.int64).max, dtype=np.int64)
        for pdf in batches:
            out_id, out_pos, out_fp = [], [], []
            for did, t in zip(pdf.iloc[:, 0], pdf["__t"]):
                m = min(len(t) - k + 1, max_pos)
                # identical to conv(substring(md5(gram),1,10),16,10):
                # 40-bit hash packed with the reversed 20-bit position so
                # int64 min picks smallest hash, rightmost pos on ties
                keys = np.fromiter(
                    (
                        int(_hl.md5(t[i : i + k].encode()).hexdigest()[:10], 16)
                        * (1 << 20)
                        + (max_pos - (i + 1))
                        for i in range(m)
                    ),
                    dtype=np.int64,
                    count=m,
                )
                win = np.lib.stride_tricks.sliding_window_view(
                    np.concatenate([keys, pad]), window
                ).min(axis=1)
                sel = np.unique(win)
                out_id.extend([did] * len(sel))
                out_pos.extend((max_pos - (sel % (1 << 20))).tolist())
                out_fp.extend((sel >> 20).tolist())
            yield pd.DataFrame(
                {"id": out_id, "pos": out_pos, "fp": out_fp}
            )

    id_type = dict(base.dtypes)[id_col]
    return (
        base.mapInPandas(gen, schema=f"id {id_type}, pos bigint, fp bigint")
        .withColumnRenamed("id", id_col)
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
