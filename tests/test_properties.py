"""Property-based tests (hypothesis): the similarity kernel against a NumPy
oracle over random vectors, pagination coverage, normalization idempotence.
Batched: each property collects its random cases into ONE DataFrame so a
hypothesis run doesn't launch hundreds of Spark jobs."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.functions import hashing, similarity

finite_floats = st.floats(min_value=-100, max_value=100, allow_nan=False, width=32)
vec = st.lists(finite_floats, min_size=1, max_size=16)


def np_cosine(a, b):
    a, b = np.asarray(a, dtype=np.float32), np.asarray(b, dtype=np.float32)
    if len(a) != len(b):
        return None
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0 or nb == 0:
        return None
    # subnormal norms can underflow na*nb to 0 -> 0/0 warning; the value
    # (nan/inf) is still what the comparison expects, so just silence it
    with np.errstate(invalid="ignore", divide="ignore", over="ignore"):
        return float(np.dot(a, b) / (na * nb))


class TestCosineProperty:
    CASES = 40

    def test_cosine_matches_numpy_oracle(self, spark):
        rng = np.random.default_rng(7)
        rows = []
        for _ in range(self.CASES):
            d = int(rng.integers(1, 16))
            a = (rng.standard_normal(d) * rng.choice([0, 1, 100])).astype(np.float32)
            b = rng.standard_normal(d).astype(np.float32)
            rows.append(([float(x) for x in a], [float(x) for x in b]))
        # plus adversarial fixtures
        rows += [([0.0], [0.0]), ([1.0, 2.0], [1.0]), ([1e30, 1e30], [1e30, 1e30])]
        df = spark.createDataFrame(rows, "a array<float>, b array<float>")
        got = df.select(similarity.cosine_f32(F.col("a"), F.col("b")).alias("s")).collect()
        for (a, b), row in zip(rows, got):
            expect = np_cosine(a, b)
            s = row["s"]
            if expect is None or math.isnan(expect) or math.isinf(expect):
                # engine returns NULL for undefined; inf-overflow cases may
                # produce NaN either side — only require agreement on definedness
                assert s is None or math.isnan(s) or math.isinf(s), (a, b, s, expect)
            else:
                assert s is not None and abs(s - expect) < 1e-4, (a, b, s, expect)

    def test_cosine_symmetry_and_self(self, spark):
        rng = np.random.default_rng(11)
        rows = []
        for _ in range(self.CASES):
            d = int(rng.integers(1, 12))
            a = rng.standard_normal(d).astype(np.float32) + 0.1
            b = rng.standard_normal(d).astype(np.float32) + 0.1
            rows.append(([float(x) for x in a], [float(x) for x in b]))
        df = spark.createDataFrame(rows, "a array<float>, b array<float>")
        got = df.select(
            similarity.cosine_f32(F.col("a"), F.col("b")).alias("ab"),
            similarity.cosine_f32(F.col("b"), F.col("a")).alias("ba"),
            similarity.cosine_f32(F.col("a"), F.col("a")).alias("aa"),
        ).collect()
        for r in got:
            assert abs(r["ab"] - r["ba"]) < 1e-6  # symmetric
            assert abs(r["aa"] - 1.0) < 1e-5  # self-similarity
            assert -1.0 - 1e-6 <= r["ab"] <= 1.0 + 1e-6  # bounded


@given(
    st.lists(st.text(alphabet="abc XY.!", min_size=0, max_size=30), min_size=1, max_size=8)
)
@settings(max_examples=15, deadline=None)
def test_normalized_text_idempotent_property(texts):
    # pure-expression property checked via a single shared local session
    import tests.conftest as c

    spark = _session()
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    once = df.select(hashing.normalized_text(F.col("t")).alias("n"))
    twice = once.select(hashing.normalized_text(F.col("n")).alias("n"))
    assert [r["n"] for r in once.collect()] == [r["n"] for r in twice.collect()]


_CACHED = {}


def _session():
    if "s" not in _CACHED:
        from penr_oz_agent_memory_rust_spark.session import get_spark

        _CACHED["s"] = get_spark(app_name="poz-tests", cpus="4")
    return _CACHED["s"]


def test_pagination_covers_without_overlap(spark):
    """Pages tile the ordered universe: concat(pages) == full sort."""
    from penr_oz_agent_memory_rust_spark.operators.topk import paginate

    df = spark.createDataFrame([(i % 7, i) for i in range(100)], "k int, i int")
    order = [F.col("k").desc(), F.col("i").desc()]
    pages = []
    for off in range(0, 100, 25):
        pages += [
            (r["k"], r["i"])
            for r in paginate(df, order, limit=25, offset=off, clamp=None).collect()
        ]
    full = [(r["k"], r["i"]) for r in df.orderBy(*order).collect()]
    assert pages == full


def test_seeded_md5_long_matches_duckdb(spark):
    """Portability contract of the seeded hash family: DuckDB computes the
    identical 60-bit value for every seed."""
    import duckdb

    from penr_oz_agent_memory_rust_spark.functions import hashing
    from pyspark.sql import functions as F

    words = ["alpha", "bravo", "", "日本語", "x y z"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        (r["w"], s): r[f"h{s}"]
        for r in df.select(
            "w", *[hashing.seeded_md5_long(F.col("w"), s).alias(f"h{s}") for s in (0, 1, 7)]
        ).collect()
        for s in (0, 1, 7)
    }
    con = duckdb.connect()
    for w in words:
        for s in (0, 1, 7):
            exp = con.execute(
                "SELECT ('0x' || substring(md5(?), 1, 15))::BIGINT", [f"{s}|{w}"]
            ).fetchone()[0]
            assert got[(w, s)] == exp, (w, s)


def test_embed_texts_matches_column_udf(spark):
    """Driver-side embed_texts and the pandas-UDF column path produce the
    same deterministic vectors."""
    from penr_oz_agent_memory_rust_spark.sources.embedding_providers import (
        embed_texts,
        hash_embed_udf,
    )
    from pyspark.sql import functions as F

    texts = ["hello world", "penr oz"]
    direct = embed_texts(texts, dim=8)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    via_udf = [
        r["e"] for r in df.select(hash_embed_udf(dim=8)(F.col("text")).alias("e")).collect()
    ]
    assert [[round(x, 5) for x in v] for v in direct] == [
        [round(x, 5) for x in v] for v in via_udf
    ]


def test_register_testdata_views(spark, sf_dir):
    from penr_oz_agent_memory_rust_spark.sources.tables import register_testdata_views

    register_testdata_views(spark, sf_dir, ("region", "nation"))
    assert spark.sql("SELECT count(*) AS n FROM region").first()["n"] == 5
    assert spark.sql(
        "SELECT count(*) AS n FROM nation JOIN region ON n_regionkey = r_regionkey"
    ).first()["n"] > 0


def test_asof_join_matches_pandas_merge_asof(spark):
    """Property: the union-sort as-of join equals pandas merge_asof
    (backward direction, by-key) on randomized frames — keys with no
    right rows, exact-tie timestamps, and interleaved times included.
    One deterministic seeded batch; a hypothesis@given would launch a
    Spark job per example."""
    import datetime as dt

    import pandas as pd

    from penr_oz_agent_memory_rust_spark.operators.asof import asof_join

    rng = np.random.Generator(np.random.PCG64(7))
    base = dt.datetime(2026, 1, 1)
    left_rows = [
        (int(rng.integers(0, 6)), base + dt.timedelta(seconds=int(rng.integers(0, 500))), i)
        for i in range(120)
    ]
    right_rows = [
        (int(rng.integers(0, 5)), base + dt.timedelta(seconds=int(rng.integers(0, 500))), i, float(i))
        for i in range(80)
    ]
    left = spark.createDataFrame(left_rows, "k bigint, t timestamp, lid bigint")
    right = spark.createDataFrame(right_rows, "k bigint, rt timestamp, rid bigint, val double")
    got = {
        r["lid"]: r["val"]
        for r in asof_join(
            left, right, key="k", left_time="t", right_time="rt",
            right_cols=["rid", "val"], tiebreak="rid",
        ).collect()
    }

    lpdf = pd.DataFrame(left_rows, columns=["k", "t", "lid"]).sort_values("t", kind="stable")
    # merge_asof keeps the LAST right row among exact (k, rt) ties; our
    # contract picks the largest tiebreak — presort right so they coincide
    rpdf = (
        pd.DataFrame(right_rows, columns=["k", "rt", "rid", "val"])
        .sort_values(["rt", "rid"], kind="stable")
    )
    exp_df = pd.merge_asof(
        lpdf, rpdf, left_on="t", right_on="rt", by="k", direction="backward"
    )
    exp = {int(r.lid): (None if pd.isna(r.val) else float(r.val)) for r in exp_df.itertuples()}
    assert got == exp


def test_simhash_matches_pure_python(spark):
    """Portability property: the DataFrame simhash equals a from-scratch
    Python implementation of the same spec (md5-60-bit token hash, bit i
    votes +/-1, sign-pack into a bigint)."""
    import hashlib

    from penr_oz_agent_memory_rust_spark.operators.dedup import simhash_signatures

    def py_simhash(text, bits=16):
        votes = [0] * bits
        for tok in text.lower().split(" "):
            h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
            for i in range(bits):
                votes[i] += 1 if (h >> i) & 1 else -1
        return sum(1 << i for i in range(bits) if votes[i] > 0)

    texts = [
        "the quick brown fox", "the quick brown fox", "a different document entirely",
        "spark engine test row", "one", "repeated repeated repeated words words",
    ]
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id bigint, text string")
    got = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    exp = {i: py_simhash(t) for i, t in enumerate(texts)}
    assert got == exp


def test_global_rank_property_random_ids(spark):
    """Property: for arbitrary string keys (duplicates included via the id
    tiebreak), the bucketed distributed rank equals Python's sorted()
    position — the operator's entire contract in one assertion."""
    import random

    from pyspark.sql import functions as F

    from penr_oz_agent_memory_rust_spark.operators.export import exact_global_rank

    rng = random.Random(1234)
    n = 500
    ids = rng.sample(range(100_000), n)
    df = spark.createDataFrame([(i,) for i in ids], "doc_id bigint").withColumn(
        "k", F.md5(F.col("doc_id").cast("string"))
    )
    got = {
        r["doc_id"]: r["rank"]
        for r in exact_global_rank(df, "k", "doc_id", bucket_chars=1).collect()
    }
    import hashlib

    expected_order = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    exp = {doc: pos for pos, doc in enumerate(expected_order)}
    assert got == exp


def test_token_mixture_budget_boundary_property(spark):
    """Property: for random doc lengths, the selected set is exactly the
    maximal prefix (in md5 order) whose preceding token total is under the
    budget — recomputed independently in Python."""
    import hashlib
    import random

    from penr_oz_agent_memory_rust_spark.operators.corpus import corpus_token_mixture

    rng = random.Random(7)
    rows = [(i, "w " * rng.randint(1, 60), "en") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    budget = 1500
    got = sorted(
        r["doc_id"] for r in corpus_token_mixture(df, {"en": 1.0}, budget).collect()
    )
    order = sorted(rows, key=lambda r: (hashlib.md5(("" + str(r[0])).encode()).hexdigest(), r[0]))
    acc, exp = 0, []
    for i, text, _ in order:
        if acc < budget:
            exp.append(i)
        acc += len(text.split())
    assert got == sorted(exp)


def test_span_and_segment_dedup_properties_random_corpora(spark):
    """Randomized invariants for the span/segment family on one batched
    corpus (single Spark job per operator):

    remove_dup_spans: cleaned tokens are a subsequence of the original;
    n_removed + len(clean) == n_tokens; and the whole output matches an
    exact pure-Python mirror of the semantics (cut tokens covered by any
    k-gram whose smallest containing doc_id is earlier and whose distinct
    doc-frequency is >= 2) — note first-occurrence is a per-GRAM
    guarantee, so even the first doc of an exact-duplicate family can
    lose tokens to grams it shares with still-earlier docs.

    chunk_dedup: n_kept <= n_chunks; kept text tokens are a concatenation
    of original chunk substrings in order; total kept segments across the
    corpus equals the number of DISTINCT segment texts."""
    import random

    from penr_oz_agent_memory_rust_spark.operators import dedup as _dedup

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(12)]
    docs, texts = [], {}
    for i in range(60):
        if i % 5 == 4:
            # exact duplicate of an earlier doc
            texts[i] = texts[i - 1]
        else:
            texts[i] = " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 18)))
        docs.append((i, texts[i]))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")

    k = 3
    out = {r["doc_id"]: r for r in _dedup.remove_dup_spans(df, k=k, min_docs=2).collect()}
    assert set(out) == set(texts)
    for i, t in texts.items():
        toks = t.lower().split(" ")
        r = out[i]
        clean = r["text_clean"].split(" ") if r["text_clean"] else []
        assert r["n_tokens"] == len(toks)
        assert r["n_removed"] + len(clean) == len(toks)
        # subsequence check
        it = iter(toks)
        assert all(any(c == x for x in it) for c in clean), (i, toks, clean)
    # exact pure-Python mirror of the cut semantics
    def grams_of(toks):
        m = max(1, len(toks) - k + 1)
        return [(" ".join(toks[s : s + k]), s) for s in range(m)]

    keeper, docfreq = {}, {}
    for i in sorted(texts):
        toks = texts[i].lower().split(" ")
        seen_here = set()
        for g, _ in grams_of(toks):
            keeper.setdefault(g, i)
            if g not in seen_here:
                docfreq[g] = docfreq.get(g, 0) + 1
                seen_here.add(g)
    for i, t in texts.items():
        toks = t.lower().split(" ")
        drop = [False] * len(toks)
        for g, s in grams_of(toks):
            if docfreq[g] >= 2 and keeper[g] != i:
                for p in range(s, min(s + k, len(toks))):
                    drop[p] = True
        expect_clean = " ".join(x for x, d in zip(toks, drop) if not d)
        assert out[i]["text_clean"] == expect_clean, (i, t)
        assert out[i]["n_removed"] == sum(drop)

    seg = {r["doc_id"]: r for r in _dedup.chunk_dedup(df, chunk_tokens=4, stride=4).collect()}
    n_distinct_segments = len(
        {
            " ".join(texts[i].split(" ")[s : s + 4])
            for i in texts
            for s in range(0, max(1, len(texts[i].split(" "))), 4)
        }
    )
    assert sum(r["n_kept"] for r in seg.values()) == n_distinct_segments
    for i, t in texts.items():
        r = seg[i]
        assert 0 <= r["n_kept"] <= r["n_chunks"]
        if r["n_kept"] == r["n_chunks"]:
            assert r["text_dedup"] == t


class TestStripBoilerplateProperty:
    """strip_boilerplate_spans invariants over random corpora (batched:
    one generated corpus, one Spark job per assertion set)."""

    def _corpus(self, rng, n_docs=24, vocab=14, words=12):
        rows = []
        for i in range(n_docs):
            toks = [f"w{int(rng.integers(vocab))}" for _ in range(int(rng.integers(3, words)))]
            rows.append((i, " ".join(toks)))
        return rows

    def test_token_accounting_and_df_threshold(self, spark):
        from penr_oz_agent_memory_rust_spark.operators import dedup

        rng = np.random.default_rng(11)
        rows = self._corpus(rng)
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        k, min_df = 3, 3
        out = {r["doc_id"]: r for r in dedup.strip_boilerplate_spans(df, k=k, min_df=min_df).collect()}
        # every doc present; removed + kept == original token count
        assert set(out) == {i for i, _ in rows}
        texts = dict(rows)
        for i, r in out.items():
            n_orig = len(texts[i].split(" "))
            assert r["n_tokens"] == n_orig
            n_kept = len(r["text_clean"].split(" ")) if r["text_clean"] else 0
            assert n_kept + r["n_removed"] == n_orig
        # grams with corpus df >= min_df never survive into cleaned text
        from collections import defaultdict

        pos = defaultdict(set)
        for i, t in rows:
            toks = t.lower().split(" ")
            for s in range(max(1, len(toks) - k + 1)):
                pos[" ".join(toks[s : s + k])].add(i)
        hot = {g for g, d in pos.items() if len(d) >= min_df}
        for i, r in out.items():
            toks = r["text_clean"].split(" ") if r["text_clean"] else []
            for s in range(max(0, len(toks) - k + 1)):
                # a hot gram may REFORM when a cut splices distant tokens
                # together, but it cannot be an original-position survivor;
                # we assert the stronger invariant only on unmodified docs
                if r["n_removed"] == 0:
                    assert " ".join(toks[s : s + k]) not in hot

    def test_permutation_of_doc_ids_is_stable(self, spark):
        """Renaming doc ids (an order-preserving bijection) must not change
        WHICH text gets stripped — df is id-agnostic (contrast
        remove_dup_spans, whose keeper depends on id order)."""
        from penr_oz_agent_memory_rust_spark.operators import dedup

        rng = np.random.default_rng(13)
        rows = self._corpus(rng)
        df1 = spark.createDataFrame(rows, "doc_id bigint, text string")
        shifted = [(i + 1000, t) for i, t in rows]
        df2 = spark.createDataFrame(shifted, "doc_id bigint, text string")
        a = {r["doc_id"]: r["text_clean"] for r in dedup.strip_boilerplate_spans(df1, k=3, min_df=3).collect()}
        b = {r["doc_id"] - 1000: r["text_clean"] for r in dedup.strip_boilerplate_spans(df2, k=3, min_df=3).collect()}
        assert a == b


class TestShardChecksumProperty:
    def test_checksum_is_input_partitioning_invariant(self, spark):
        """The commutative wrapped-sum checksum must be identical however
        the rows are physically partitioned (the distribution property the
        operator's O(1) aggregation buffer relies on)."""
        from penr_oz_agent_memory_rust_spark.operators import export

        rng = np.random.default_rng(17)
        rows = [
            (i, "".join(chr(97 + int(rng.integers(26))) for _ in range(int(rng.integers(1, 40)))))
            for i in range(300)
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        sharded = export.assign_shards(df, "doc_id", rows_per_shard=50, salt="pp").persist()
        one = {r["shard"]: r["checksum"] for r in export.shard_checksums(sharded.coalesce(1), F.col("text")).collect()}
        many = {r["shard"]: r["checksum"] for r in export.shard_checksums(sharded.repartition(16), F.col("text")).collect()}
        assert one == many
        sharded.unpersist()
