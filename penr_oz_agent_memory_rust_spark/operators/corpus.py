"""Corpus-level training-data-pipeline operators (north-star, SURVEY §2.7 ★).

Train/test decontamination, vocabulary statistics, PII scrubbing, repetition
scoring (Gopher-style quality signal), stratified sampling, and quantile-based
quality filtering. The reference has none of these (it is a vector-store
proxy, /root/reference/src/memory.rs); they are the LLM-pipeline surface the
north star asks for, built Spark-first:

- everything is a native column expression (JVM, whole-stage codegen) except
  shingling, which reuses the Arrow-batched UDF from functions.hashing;
- the small side of every join (the test-set shingle dictionary) is
  broadcast — at 100 TB the train corpus never shuffles for decontamination;
- all outputs are oracle-expressible in DuckDB SQL (portable md5 hashing,
  plain regex, linear-interpolation percentiles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from penr_oz_agent_memory_rust_spark.functions import hashing

# Deliberately simple, RE2-and-Java-compatible patterns so the DuckDB oracle
# computes the identical redaction.
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\- ]{7,}[0-9]"


def decontaminate(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Train/test overlap via exact word n-gram matching.

    Returns (id_col, n_overlap): for each train doc, the number of its
    distinct n-gram shingles that also occur anywhere in the test set.
    Docs with zero overlap are omitted (inner join) — at scale the result
    is the small "contaminated" subset, not the whole corpus.

    Scale shape: the test-set shingle dictionary is DISTINCT-ed and
    broadcast, so the (huge) train side is a single scan + map-side hash
    probe + one groupBy on id — no shuffle of raw shingles.
    """
    # rebalance=False: the per-shingle work here is one hash + a
    # broadcast-dict probe — spreading the scan measured slower than
    # just running it (unlike the minhash/ngram pipelines)
    train_sh = hashing.word_shingle_rows(train, id_col, text_col, n, rebalance=False)
    test_sh = (
        hashing.word_shingle_rows(test, id_col, text_col, n, rebalance=False)
        .select("sh")
        .distinct()
    )
    return (
        train_sh.join(F.broadcast(test_sh), "sh", "inner")
        .groupBy(id_col)
        .agg(F.count("*").cast("bigint").alias("n_overlap"))
    )


def semantic_decontaminate(
    train: DataFrame,
    test: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Embedding-space train/test contamination: for each train vector, its
    max cosine to ANY test vector; rows above `threshold` are the paraphrase
    / near-duplicate leaks that exact n-gram decontamination misses.

    Returns (id_col, max_test_sim) for the contaminated subset only — like
    the n-gram form, the output is the small flagged set, not the corpus.

    Scale shape: the test set is the small side by construction (eval
    benchmarks are thousands of rows, train is billions) — it broadcasts,
    each train partition scores it locally, and the partial-max combine
    reduces the pair stream to one row per train id BEFORE the shuffle, so
    the exchange carries |contaminated train| rows, never pairs. Exact f64
    prenormed cosine (functions/similarity.py) keeps the whole operator
    oracle-checkable — no ANN shortcut in the gate path.
    """
    from penr_oz_agent_memory_rust_spark.functions import similarity

    t = F.broadcast(
        test.select(
            F.col(vec_col).alias("__tv"),
            similarity.norm_f64(F.col(vec_col)).alias("__tn"),
        )
    )
    # rebalance: a small-file scan arrives as ONE partition, which runs
    # the whole train×test interpreted-cosine scan on a single core (r10
    # profile: a 4.4 s single-task stage was the gate's entire cost);
    # no-op at real scale where the train scan already has many splits
    left = hashing.cpu_rebalance(
        train.select(
            id_col,
            F.col(vec_col).alias("__v"),
            similarity.norm_f64(F.col(vec_col)).alias("__n"),
        )
    )
    sim = similarity.cosine_f64_prenormed(
        similarity.dot_f64(F.col("__v"), F.col("__tv")),
        F.col("__n"),
        F.col("__tn"),
        F.size("__v") == F.size("__tv"),
    )
    if round_to is not None:
        sim = F.round(sim, round_to)
    return (
        left.crossJoin(t)
        .withColumn("__sim", sim)
        .filter(F.col("__sim").isNotNull())
        .groupBy(id_col)
        .agg(F.max("__sim").alias("max_test_sim"))
        .filter(F.col("max_test_sim") > F.lit(threshold))
    )


def semantic_decontaminate_blas(
    train: DataFrame,
    test: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    max_test_rows: int = 100_000,
) -> DataFrame:
    """Production path of `semantic_decontaminate`: one f64 BLAS matmul per
    Arrow batch against the collected test matrix instead of pair-wise
    interpreted expressions (~20× on the gate workload; pinned to the expr
    path at 6dp in tests/test_corpus.py). The collect is BOUNDED and
    guarded — eval sets are small by construction; above `max_test_rows`
    use the expr form or an LSH prefilter."""
    import numpy as np
    import pandas as pd

    rows = test.select(vec_col).limit(max_test_rows + 1).collect()
    if len(rows) > max_test_rows:
        raise ValueError(
            f"test set exceeds max_test_rows={max_test_rows}; "
            "use semantic_decontaminate (expr) or prefilter"
        )
    T = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
    tn = np.linalg.norm(T, axis=1)
    T = T[tn > 0] / tn[tn > 0, None]
    dim = T.shape[1]

    out_schema = f"{id_col} bigint, max_test_sim double"

    def score(batches):
        for pdf in batches:
            ok = pdf[vec_col].map(len) == dim
            pdf = pdf[ok]
            if not len(pdf):
                continue
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            mn = np.linalg.norm(M, axis=1)
            nz = mn > 0
            if not nz.any():
                continue
            S = (M[nz] / mn[nz, None]) @ T.T
            best = np.round(S.max(axis=1), round_to)
            keep = best > threshold
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy()[nz][keep], "max_test_sim": best[keep]}
            )

    # a small-file scan arrives as few partitions; the matmul is the cost,
    # so spread the batches across cores first (same rationale as the
    # shingle pipelines — at real scale the scan is already parallel and
    # this round-robin exchange is a no-op knob)
    src = hashing.cpu_rebalance(train.select(id_col, vec_col))
    return src.mapInPandas(score, schema=out_schema)


def word_freq_topk(
    docs: DataFrame, text_col: str = "text", k: int = 100
) -> DataFrame:
    """Corpus-wide token frequency, top-k by (count DESC, token ASC).

    explode → partial-agg (map-side combine) → final agg → bounded top-k
    heap (TakeOrderedAndProject): the classic scalable word-count shape.
    """
    tok = F.explode(hashing.word_tokens(F.col(text_col))).alias("token")
    return (
        docs.select(tok)
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(k)
    )


def pii_scan(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Count + redact email/phone-shaped spans (single pass, pure codegen).

    Returns (id_col, n_emails, n_phones, redacted) for every doc; redaction
    replaces each span with a fixed tag so downstream token counts stay
    stable.
    """
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
    n_phones = F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), F.lit(0)))
    redacted = F.regexp_replace(
        F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return docs.select(
        F.col(id_col),
        n_emails.cast("bigint").alias("n_emails"),
        n_phones.cast("bigint").alias("n_phones"),
        redacted.alias("redacted"),
    )


def repetition_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signal: 1 - distinct_tokens / total_tokens.

    High values flag boilerplate / spam. Rounded to 6dp for the oracle.
    """
    toks = hashing.word_tokens(F.col(text_col))
    total = F.size(toks).cast("double")
    distinct = F.size(F.array_distinct(toks)).cast("double")
    rep = F.when(total > 0, F.round(1.0 - distinct / total, 6)).otherwise(0.0)
    return docs.select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_tokens"),
        rep.alias("repetition"),
    )


def stratified_sample(
    docs: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    n_per_group: int = 20,
) -> DataFrame:
    """Deterministic per-group sample: first n per group in portable-hash
    order (md5 of the id). One shuffle on group_col; WindowGroupLimit
    prunes to n per partition before the exchange on Spark ≥3.5.
    """
    order_key = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(order_key, F.col(id_col))
    return (
        docs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_group)
        .drop("__rn")
    )


def quality_quantile_filter(
    scored: DataFrame, score_col: str = "quality", q: float = 0.25
) -> DataFrame:
    """Keep docs at/above the corpus q-quantile of `score_col`.

    The exact interpolated percentile (Spark `percentile` == DuckDB
    `quantile_cont`) is computed as a 1-row aggregate and broadcast — a
    scalar join, so the big side is scanned once with a map-side filter.
    Threshold rounded to 6dp so both engines compare identical doubles.
    """
    thr = scored.agg(
        F.round(F.expr(f"percentile({score_col}, {q})"), 6).alias("__thr")
    )
    return (
        scored.join(F.broadcast(thr))
        .filter(F.col(score_col) >= F.col("__thr"))
        .drop("__thr")
    )


def grouped_quantile_filter(
    scored: DataFrame,
    group_col: str,
    score_col: str = "quality",
    q: float = 0.25,
) -> DataFrame:
    """Keep docs at/above their OWN group's q-quantile of `score_col` —
    the per-language form of quality_quantile_filter. A single global
    threshold lets a high-resource language's score distribution evict
    most of a low-resource one; per-group thresholds keep the same share
    of every slice (the standard per-language quality gate).

    One grouped exact-percentile agg (group-cardinality rows) broadcast
    back onto the scan — the corpus itself never shuffles, exactly the
    zscore_by_group / mad_outliers monitoring shape. Thresholds rounded
    to 6dp so both engines of an oracle comparison filter on identical
    doubles.
    """
    thr = scored.groupBy(group_col).agg(
        F.round(F.expr(f"percentile({score_col}, {q})"), 6).alias("__thr")
    )
    return (
        scored.join(F.broadcast(thr), group_col)
        .filter(F.col(score_col) >= F.col("__thr"))
        .drop("__thr")
    )


def winsorize_by_group(
    df: DataFrame,
    group_col: str,
    score_col: str = "quality",
    lo: float = 0.05,
    hi: float = 0.95,
    round_dp: int = 6,
) -> DataFrame:
    """Per-group winsorize-then-standardize of a quality signal: clamp to
    the group's [lo, hi] exact percentiles, then z-score the clamped value
    against the group's winsorized mean/stddev_pop. The standard guard
    before mixing heterogeneous sources — outlier scores stop dominating a
    source's contribution, and cross-source scores land on one scale.

    Two grouped aggregations (group-cardinality rows each) broadcast back
    onto the scan — the corpus itself NEVER shuffles, unlike the
    grouped-map form (zscore_by_group) which requires each group to fit
    one task. Percentile bounds are rounded to `round_dp` first so both
    engines of an oracle comparison clamp on identical doubles; zero
    within-group variance yields z = 0.
    Adds columns: {score_col}_wins, {score_col}_z.
    """
    bounds = df.groupBy(group_col).agg(
        F.round(F.expr(f"percentile({score_col}, {lo})"), round_dp).alias("__lo"),
        F.round(F.expr(f"percentile({score_col}, {hi})"), round_dp).alias("__hi"),
    )
    wins = F.least(F.greatest(F.col(score_col), F.col("__lo")), F.col("__hi"))
    clamped = df.join(F.broadcast(bounds), group_col).withColumn(
        f"{score_col}_wins", wins
    )
    stats = clamped.groupBy(group_col).agg(
        F.avg(f"{score_col}_wins").alias("__mu"),
        F.stddev_pop(f"{score_col}_wins").alias("__sd"),
    )
    return (
        clamped.join(F.broadcast(stats), group_col)
        .withColumn(
            f"{score_col}_z",
            F.when(
                F.col("__sd") > 0,
                F.round(
                    (F.col(f"{score_col}_wins") - F.col("__mu")) / F.col("__sd"),
                    round_dp,
                ),
            ).otherwise(F.lit(0.0)),
        )
        .drop("__lo", "__hi", "__mu", "__sd")
    )


def zscore_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_cols: list[str],
    out_col: str = "z",
) -> DataFrame:
    """Per-group standardization via applyInPandas (the grouped-map Pandas
    path): each group arrives as ONE Arrow batch, is z-scored with
    vectorized NumPy, and leaves as a batch — no per-row Python. This is
    the canonical shape for group-local model-ish transforms (per-domain
    normalization of quality signals before corpus mixing).

    Scale note: one shuffle on the group key; each group must fit in one
    task's memory — standardization groups (domain/source/language) are
    few and bounded. For per-key cardinalities that aren't, use the
    two-pass join form (aggregate stats, broadcast back) instead.
    """
    import pandas as pd  # noqa: F401 (worker-side)

    dtypes = dict(df.dtypes)
    schema = ", ".join(
        [f"{c} {dtypes[c]}" for c in [*id_cols, group_col]] + [f"{out_col} double"]
    )

    def standardize(pdf):
        v = pdf[value_col]
        sd = v.std(ddof=0)
        out = pdf[[*id_cols, group_col]].copy()
        out[out_col] = ((v - v.mean()) / sd).round(6) if sd > 0 else 0.0
        return out

    return df.groupBy(group_col).applyInPandas(standardize, schema)


def vocab_coverage(
    train: DataFrame,
    docs: DataFrame,
    vocab_size: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_dp: int = 6,
) -> DataFrame:
    """★ tokenizer-coverage report: build a top-`vocab_size` word vocab
    from the training corpus (count DESC, word ASC tie-break) and measure
    each candidate doc's out-of-vocabulary rate — the standard check that
    a tokenizer/vocab trained on one corpus slice actually covers the
    corpus it will be applied to (high OOV = wasted UNK mass).

    Output: (id, n_tokens, oov_tokens, oov_rate). Scale shape: the vocab
    agg reduces to distinct-word rows and the top-V is a bounded
    TakeOrderedAndProject (per-partition heaps, driver merge — never a
    global sort); scoring explodes tokens once and probes the broadcast
    vocab. Docs with zero tokens produce no row.
    """
    counts = (
        hashing.cpu_rebalance(train)
        .select(F.explode(hashing.word_tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("__c"))
    )
    vocab = counts.orderBy(F.col("__c").desc(), "w").limit(vocab_size).select("w")
    toks = hashing.cpu_rebalance(docs).select(
        id_col, F.explode(hashing.word_tokens(F.col(text_col))).alias("w")
    )
    probed = toks.join(
        F.broadcast(vocab.withColumn("__in", F.lit(1))), "w", "left"
    )
    return probed.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.col("__in").isNull().cast("bigint")).alias("oov_tokens"),
        F.round(
            F.sum(F.col("__in").isNull().cast("double")) / F.count("*"), round_dp
        ).alias("oov_rate"),
    )


def temperature_mixture_weights(
    docs: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    alpha: float = 0.5,
    n_total: int | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """★ temperature-scaled mixture planning: per-group sampling shares
    w_g ∝ n_tokens_g^alpha — the multilingual up-sampling scheme of
    mBERT/XLM-R/mT5 (alpha < 1 boosts low-resource groups; alpha = 1 is
    proportional, alpha = 0 uniform). Output one row per group:
    (group, n_docs, n_tokens, raw_share, temp_share[, quota]).

    This is the data-driven front half of corpus_mixture_sample: it
    computes the weights the sampler consumes. One grouped agg
    (group-cardinality rows) + a broadcast 1-row totals frame — no
    driver collect, no second corpus scan. `quota` (floor of
    temp_share * n_total) is emitted when n_total is given.
    """
    g = docs.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(hashing.word_tokens(F.col(text_col))))
        .cast("bigint")
        .alias("n_tokens"),
    )
    totals = g.agg(
        F.sum("n_tokens").cast("double").alias("__tot"),
        F.sum(F.pow("n_tokens", F.lit(alpha))).alias("__tot_p"),
    )
    out = g.crossJoin(F.broadcast(totals)).select(
        group_col,
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("__tot"), round_dp).alias("raw_share"),
        F.round(F.pow("n_tokens", F.lit(alpha)) / F.col("__tot_p"), round_dp).alias(
            "temp_share"
        ),
        *(
            [
                F.floor(
                    F.pow("n_tokens", F.lit(alpha)) / F.col("__tot_p") * n_total
                )
                .cast("bigint")
                .alias("quota")
            ]
            if n_total is not None
            else []
        ),
    )
    return out


def corpus_mixture_sample(
    docs: DataFrame,
    weights: dict[str, float],
    n_total: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """★ Weighted-domain mixture by document count: group g contributes
    floor(normalized_weight_g * n_total) documents, chosen as the first
    quota_g docs per group in md5(salt || id) order — the deterministic
    analogue of "sample the training mix at these domain proportions".

    Groups not named in `weights` are dropped; a group smaller than its
    quota contributes everything it has (the shortfall is NOT rebalanced —
    mixtures are contracts, silently overfilling another domain would skew
    training). Quotas are computed from the weights alone (no data-driven
    driver work); the plan is one shuffle on the group key with
    WindowGroupLimit pruning to the largest quota before the exchange.
    """
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    quotas = {g: int(w / total_w * n_total) for g, w in weights.items()}
    quota_expr = F.create_map(
        *[F.lit(x) for gq in quotas.items() for x in gq]
    )[F.col(group_col)]
    order_key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(order_key, F.col(id_col))
    max_quota = max(quotas.values(), default=0)
    return (
        docs.filter(F.col(group_col).isin(list(quotas)))
        .withColumn("__rn", F.row_number().over(w))
        # the FOLDABLE bound first: InferWindowGroupLimit only fires on a
        # literal rank limit, turning the full per-group sort into a
        # max_quota-row heap per map task; the per-group map lookup then
        # trims to each group's exact quota
        .filter(F.col("__rn") <= F.lit(max_quota))
        .filter(F.col("__rn") <= quota_expr)
        .drop("__rn")
    )


def corpus_token_mixture(
    docs: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    token_count_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """★ Weighted-domain mixture by TOKEN budget: group g gets a budget of
    normalized_weight_g * token_budget tokens; docs are taken in
    md5(salt || id) order while the running token total BEFORE each doc is
    under the group budget (so the last doc may overshoot — every budget
    is filled, boundary doc included, matching how corpus mixers cut).

    token_count_col defaults to whitespace token count computed on the
    fly.

    Scale shape: a naive per-group cumulative window would sort an entire
    group in one task (a single-language 100 TB corpus = one reducer).
    Instead the running total uses the bucket-offset pattern of
    export.exact_global_rank: rows bucket by an md5-key prefix, per-
    (group, bucket) token sums (bounded: groups x 256 rows) prefix-sum on
    the driver, and the window runs per (group, bucket). Buckets whose
    start offset already meets the budget are dropped BEFORE the sort —
    at scale the selected head of each group is all that ever gets
    sorted.

    NOTE: the source is scanned twice (an EAGER offsets job runs at
    DataFrame-construction time, then the window pass at action time);
    the filtered/keyed source is persisted across the two passes so a
    non-deterministic input cannot yield offsets inconsistent with the
    window pass.
    """
    from penr_oz_agent_memory_rust_spark.operators import text_ops

    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    budgets = {g: int(wt / total_w * token_budget) for g, wt in weights.items()}
    budget_expr = F.create_map(
        *[F.lit(x) for gb in budgets.items() for x in gb]
    )[F.col(group_col)]
    toks = (
        F.col(token_count_col)
        if token_count_col
        else text_ops.token_count_ws(F.col("text")).cast("bigint")
    )
    order_key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    src = (
        docs.filter(F.col(group_col).isin(list(budgets)))
        .withColumn("__toks", toks)
        .withColumn("__k", order_key)
        .withColumn("__bucket", F.substring("__k", 1, 2))
    ).persist()
    counts = (
        src.groupBy(group_col, "__bucket").agg(F.sum("__toks").alias("t")).collect()
    )
    by_group: dict[str, list] = {}
    for r in counts:
        by_group.setdefault(r[group_col], []).append((r["__bucket"], r["t"]))
    offsets = []
    for g, lst in by_group.items():
        acc = 0
        for b, t in sorted(lst):
            offsets.append((g, b, acc))
            acc += t
    spark = docs.sparkSession
    # build the offsets frame with the SOURCE column's dtype, not a
    # hardcoded string — an int domain id must join back losslessly
    group_dtype = dict(docs.dtypes)[group_col]
    off = spark.createDataFrame(
        [(g, b, o) for g, b, o in offsets] or [],
        f"{group_col} {group_dtype}, __bucket string, __off bigint",
    )
    w = (
        Window.partitionBy(group_col, "__bucket")
        .orderBy("__k", F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        src.join(F.broadcast(off), [group_col, "__bucket"])
        # whole-bucket prune: if the bucket starts at/past the budget no row
        # in it can qualify — skip its sort entirely
        .filter(F.col("__off") < budget_expr)
        .withColumn(
            "__before", F.col("__off") + F.coalesce(F.sum("__toks").over(w), F.lit(0))
        )
        .filter(F.col("__before") < budget_expr)
        .drop("__before", "__off", "__k", "__bucket")
        .withColumnRenamed("__toks", "n_tokens")
    )


def char_bigram_counts(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Character-bigram counts over the normalized text of a reference
    corpus — the "language model" side of the perplexity-proxy quality
    filter. Output: (bg, cnt). Bounded by alphabet² (~37² here), so the
    trained model always broadcasts."""
    # rebalance=True: r3 opted out after an sf0.1-only A/B (pre-shuffle
    # cost the Arrow path 1.14 s vs 0.83 s), but re-measured in r4 on a
    # 150k-doc SINGLE-FILE training corpus the opt-out serializes the
    # normalize+explode onto one core: 43.8 s vs 8.8 s rebalanced (warm,
    # interleaved, min of 3). A ~0.3 s overhead on toy inputs is the wrong
    # trade against a 5x cliff on any real single-file corpus; at real
    # scale the scan is already parallel and cpu_rebalance is a no-op.
    return (
        _exploded_bigrams(docs, text_col)
        .groupBy("bg")
        .agg(F.count("*").alias("cnt"))
    )


def _exploded_bigrams(
    docs: DataFrame, text_col: str, *keep: str, rebalance: bool = True
) -> DataFrame:
    """(keep..., bg) rows, one per character bigram of the normalized text.

    Shaped as explode(sequence) + substring — every operator stays inside
    whole-stage codegen. The equivalent transform(..., lambda) form runs
    the lambda INTERPRETED per element (HigherOrderFunction is not
    codegen'd), which measured ~2x slower on this 50M-element path. The
    scoring input is cpu_rebalance()d by default: a single-file scan
    otherwise runs this explode + the model join + hash-agg on one core
    (A/B at sf0.1: 2.3 s vs 3.3 s without; no-op at real scale). Training
    (char_bigram_counts) also rebalances since r4 — the r3 opt-out was
    measured on small inputs only and cost 5x on a 150k-doc single-file
    corpus (see char_bigram_counts)."""
    norm = hashing.normalized_text(F.col(text_col))
    if rebalance:
        docs = hashing.cpu_rebalance(docs)
    return (
        docs.withColumn("__norm", norm)
        .filter(F.length("__norm") >= 2)
        .select(
            *keep,
            "__norm",
            F.explode(F.sequence(F.lit(1), F.length("__norm") - 1)).alias("__i"),
        )
        .select(*keep, F.expr("substring(__norm, __i, 2)").alias("bg"))
    )


def lm_quality_score(
    docs: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """★ perplexity-proxy quality score: mean log2 of the add-alpha-smoothed
    bigram probability of each doc under a reference corpus LM (the
    KenLM-style filter of C4/CCNet pipelines, reduced to character bigrams
    so it stays oracle-portable). Higher = more reference-like; gibberish
    and wrong-language text score low. Output: (id, n_bigrams, lm_score).

    P(c2|c1) = (cnt(c1c2) + alpha) / (cnt(c1·) + alpha · V), with V the
    number of distinct bigrams observed — both marginal and V are derived
    from the counts table, so the whole model is one bounded broadcast.
    Scale shape: explode bigrams (N×L rows) → broadcast-join the ≤V-row
    model → one hash-agg back to docs. No Python in the plan.
    """
    # the model is bounded by alphabet² rows (not corpus size), so one
    # driver collect both sizes V and avoids re-scanning the training
    # corpus for the marginals
    rows = [(r["bg"], r["cnt"]) for r in lm.collect()]
    v = len(rows)
    spark = docs.sparkSession
    lm = spark.createDataFrame(rows or [("", 0)], "bg string, cnt bigint")
    marg = lm.groupBy(F.substring("bg", 1, 1).alias("c1")).agg(
        F.sum("cnt").alias("c1_cnt")
    )
    exploded = _exploded_bigrams(docs, text_col, id_col).withColumn(
        "c1", F.substring("bg", 1, 1)
    )
    scored = (
        exploded.join(F.broadcast(lm), "bg", "left")
        .join(F.broadcast(marg), "c1", "left")
        .withColumn(
            "__logp",
            F.log2(
                (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(alpha))
                / (F.coalesce(F.col("c1_cnt"), F.lit(0)) + F.lit(alpha) * F.lit(float(v)))
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("__logp"), 6).alias("lm_score"),
    )


def diversity_sample(
    emb: DataFrame,
    n_clusters: int = 8,
    per_cluster: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    salt: str = "",
    centroids=None,
) -> DataFrame:
    """★ cluster-balanced (semantic-diversity) sampling: k-means cells over
    the embedding space, then a deterministic per-cell quota — the
    embedding-space analogue of stratified sampling, used to keep a
    downsampled corpus from collapsing onto its dominant topics.

    Scale shape: centroids train on a CAPPED sample (never a full
    collect, knn.train_ivf_centroids); cell assignment is a pure codegen
    expression usable as a partition column; the quota is one shuffle on
    the cell id with WindowGroupLimit pruning. Output: (id, cell).

    Pass `centroids` (an ndarray) to skip training and assign with the
    6dp-rounded l2 argmin (kmeans.kmeans_assign_expr) — with data-defined
    centroid rows this makes the WHOLE sampler SQL-replayable, which is
    how the diversity_sample_seeded gate oracle-checks the quota logic
    (the default trained path stays rows-only: Lloyd's is iterative).
    """
    from penr_oz_agent_memory_rust_spark.operators import knn

    if centroids is None:
        cents = knn.train_ivf_centroids(
            emb, vec_col=vec_col, n_centroids=n_clusters, seed=seed
        )
        cell = knn.ivf_assign_expr(F.col(vec_col), cents)
    else:
        from penr_oz_agent_memory_rust_spark.operators import kmeans as _km

        cell = _km.kmeans_assign_expr(F.col(vec_col), centroids, round_dp=6)
    assigned = emb.select(F.col(id_col), cell.alias("cell"))
    order_key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy("cell").orderBy(order_key, F.col(id_col))
    return (
        assigned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= per_cluster)
        .drop("__rn")
    )


def lm_quality_score_arrow(
    docs: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Fast path of lm_quality_score: the smoothed log-prob table is folded
    into a 256x256 float64 ndarray (normalized text is pure ASCII by
    construction) and each doc scores as one vectorized gather+mean in an
    Arrow batch — no 50M-row explode/join/agg. Same formula, same
    normalization; values agree with the expression path to 6dp (pinned in
    tests/test_corpus.py). Use when the scorer dominates a pipeline; the
    expression path remains the oracle-checked reference."""
    import numpy as np
    import pandas as pd
    import re

    rows = [(r["bg"], r["cnt"]) for r in lm.collect()]
    v = len(rows)
    c1_cnt: dict[int, int] = {}
    for bg, cnt in rows:
        b = bg.encode()
        c1_cnt[b[0]] = c1_cnt.get(b[0], 0) + cnt
    # default per row-char: unseen bigram under that c1 (or unseen c1)
    table = np.empty((256, 256), dtype=np.float64)
    for c1 in range(256):
        table[c1, :] = np.log2(alpha / (c1_cnt.get(c1, 0) + alpha * v))
    for bg, cnt in rows:
        b = bg.encode()
        table[b[0], b[1]] = np.log2((cnt + alpha) / (c1_cnt[b[0]] + alpha * v))
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(table)
    non_alnum = re.compile(r"[^a-z0-9 ]")
    spaces = re.compile(r" +")

    id_type = dict(docs.dtypes)[id_col]

    def score_batches(batches):
        t = bc.value
        for pdf in batches:
            ids, ns, scores = [], [], []
            for i, txt in zip(pdf[id_col], pdf[text_col]):
                norm = spaces.sub(" ", non_alnum.sub("", (txt or "").lower())).strip()
                if len(norm) < 2:
                    continue
                b = np.frombuffer(norm.encode(), dtype=np.uint8)
                lp = t[b[:-1], b[1:]]
                ids.append(i)
                ns.append(len(lp))
                scores.append(round(float(lp.mean()), 6))
            yield pd.DataFrame({id_col: ids, "n_bigrams": ns, "lm_score": scores})

    return docs.select(id_col, text_col).mapInPandas(
        score_batches, schema=f"{id_col} {id_type}, n_bigrams bigint, lm_score double"
    )


def source_divergence(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    round_to: int = 6,
) -> DataFrame:
    """★ corpus-slice drift: Jensen–Shannon divergence (log2, in bits)
    between each slice's character-bigram distribution and the WHOLE
    corpus's — the domain-mix monitor of a training pipeline: a new crawl
    snapshot whose per-source JS jumps has changed register/language/
    boilerplate even when volume looks normal. Output: (group, n_docs,
    js_bits), js in [0, 1].

    Scale shape: ONE pass explodes bigrams and hash-aggregates to
    (group, bg, cnt) — bounded by groups × alphabet², not corpus size.
    Everything downstream (per-group totals, the pooled distribution, the
    groups × alphabet² comparison grid, the JS fold) derives from that
    persisted bounded table; the corpus is never re-scanned and nothing
    unbounded shuffles or broadcasts. P(bg)=0 terms contribute 0 to
    KL(P||M) by the usual convention; Q(bg) > 0 everywhere on the grid by
    construction."""
    bgc = (
        _exploded_bigrams(docs, text_col, group_col)
        .groupBy(group_col, "bg")
        .agg(F.count("*").alias("cnt"))
        .persist()
    )
    tot = bgc.groupBy(group_col).agg(F.sum("cnt").alias("tot"))
    pooled = bgc.groupBy("bg").agg(F.sum("cnt").alias("q_cnt"))
    q_tot = pooled.agg(F.sum("q_cnt").alias("q_tot"))
    grid = (
        tot.crossJoin(F.broadcast(pooled))
        .crossJoin(F.broadcast(q_tot))
        .join(bgc, [group_col, "bg"], "left")
        .select(
            group_col,
            (F.coalesce(F.col("cnt"), F.lit(0)) / F.col("tot")).alias("p"),
            (F.col("q_cnt") / F.col("q_tot")).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2
    kp = F.when(F.col("p") > 0, F.col("p") * F.log2(F.col("p") / m)).otherwise(F.lit(0.0))
    kq = F.col("q") * F.log2(F.col("q") / m)
    js = grid.groupBy(group_col).agg(
        F.round(0.5 * F.sum(kp) + 0.5 * F.sum(kq), round_to).alias("js_bits")
    )
    n_docs = docs.groupBy(group_col).agg(F.count("*").alias("n_docs"))
    out = n_docs.join(js, group_col).select(group_col, "n_docs", "js_bits")
    return out


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
    round_to: int = 6,
) -> DataFrame:
    """★ collocation mining: pointwise mutual information of adjacent word
    pairs over the normalized corpus — the phrase-extraction primitive
    (AutoPhrase-style) used to find multiword terms worth treating as
    tokenizer/vocab units. Output: top-k (w1, w2, pair_count, pmi) by PMI
    desc, (w1, w2) tiebreak; pairs below `min_count` are noise and
    dropped.

    PMI = log2(c12/M) - log2(c1/N) - log2(c2/N) with N total tokens and M
    total adjacent pairs — evaluated term-by-term in f64 from exact
    integer counts (< 2^53), so any engine computing the same counts gets
    bit-identical scores before the 6dp rounding.

    Scale shape: adjacency comes from one explode over in-doc positions
    (no self-join); pair and unigram counts are vocab-bounded hash aggs
    with map-side combine; the two count joins key on single words (hash
    join, broadcastable when the vocab is); N and M ride in as broadcast
    1-row frames; the final top-k is a bounded heap
    (TakeOrderedAndProject), never a global sort."""
    # rebalance: the explode below evaluates the 3-regex normalize +
    # split, and a single-file scan would run it on one core; no-op at
    # real scale (same contract as word_shingle_rows)
    toks = hashing.cpu_rebalance(docs).select(
        F.split(hashing.normalized_text(F.col(text_col)), " ").alias("__ws")
    ).filter(F.size("__ws") >= 2)
    # ONE kind-tagged explode emits the doc's unigrams AND adjacent
    # bigrams together (r11, guide §2.4): the pre-r11 shape ran the
    # normalize+split corpus pass once per branch (two map stages; the
    # multi-consumer reduce side was always served by ReuseExchange, and
    # still is) — same counts, one corpus pass, one exchange.
    terms = toks.select(
        F.explode(
            F.concat(
                F.transform(
                    F.col("__ws"),
                    lambda w: F.struct(F.lit("u").alias("k"), w.alias("t")),
                ),
                F.transform(
                    F.sequence(F.lit(1), F.size("__ws") - 1),
                    lambda i: F.struct(
                        F.lit("b").alias("k"),
                        F.concat_ws(
                            " ",
                            F.element_at(F.col("__ws"), i),
                            F.element_at(F.col("__ws"), i + 1),
                        ).alias("t"),
                    ),
                ),
            )
        ).alias("e")
    )
    counts = terms.groupBy(F.col("e.k").alias("k"), F.col("e.t").alias("t")).agg(
        F.count(F.lit(1)).alias("c")
    )
    # persist: the count table has FIVE consumers (uni→w1/w2/n_tok,
    # bic→filter/m_pairs) and the k= filters push below the exchange,
    # which would split the corpus explode back into one pass per branch
    # (the r11 plan audit showed 3 heavy explode stages without this).
    # DISK_ONLY because the bigram vocabulary is unbounded at corpus
    # scale — recomputable from lineage, no executor memory pressure.
    # Interleaved A/B (min-of-4): pre-r11 two-explode shape 2.66 s,
    # combined explode 1.54 s, combined + persist 1.23 s.
    from pyspark import StorageLevel

    counts = counts.persist(StorageLevel.DISK_ONLY)
    uni = counts.filter(F.col("k") == "u").select(
        F.col("t").alias("w"), F.col("c")
    )
    n_tok = uni.agg(F.sum("c").alias("n"))
    bic = counts.filter(F.col("k") == "b").select(
        F.col("t").alias("bg"), F.col("c").alias("c12")
    )
    m_pairs = bic.agg(F.sum("c12").alias("m"))
    scored = (
        bic.filter(F.col("c12") >= min_count)
        .withColumn("w1", F.split("bg", " ")[0])
        .withColumn("w2", F.split("bg", " ")[1])
        .join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(m_pairs))
        .select(
            "w1",
            "w2",
            F.col("c12").alias("pair_count"),
            F.round(
                F.log2(F.col("c12") / F.col("m"))
                - F.log2(F.col("c1") / F.col("n"))
                - F.log2(F.col("c2") / F.col("n")),
                round_to,
            ).alias("pmi"),
        )
    )
    from penr_oz_agent_memory_rust_spark.operators.topk import top_k as _top_k

    return _top_k(
        scored, "pmi", top_k,
        tiebreak=F.struct(F.col("w1"), F.col("w2")).asc(),
    )
