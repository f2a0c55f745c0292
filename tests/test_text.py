"""Text-analysis operator behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.functions import hashing
from penr_oz_agent_memory_rust_spark.operators import text_ops


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the cat and the dog of a house is here"),
        (2, "der hund und die katze ist nicht hier"),
        (3, "el gato que la casa es una maravilla los dias"),
        (4, "xyzzy qwerty plugh"),
        (5, "Hello, world! 123 foo-bar."),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_lang_id(spark, docs):
    out = {r["doc_id"]: r["lang"] for r in docs.select(
        "doc_id", text_ops.lang_id_expr(F.col("text")).alias("lang")).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "es"
    assert out[4] == "und"


def test_token_counts(spark, docs):
    row = docs.filter(F.col("doc_id") == 5).select(
        text_ops.token_count_ws(F.col("text")).alias("ws"),
        text_ops.token_count_bpe_ish(F.col("text")).alias("bpe"),
    ).first()
    assert row["ws"] == 4  # Hello, world! 123 foo-bar.
    # hello , world ! 123 foo - bar .  => 9
    assert row["bpe"] == 9


def test_quality_score_bounds(spark, docs):
    scores = [r["q"] for r in docs.select(
        text_ops.quality_score_expr(F.col("text")).alias("q")).collect()]
    assert all(0.0 <= s <= 1.0 for s in scores)
    # punctuation soup scores worse than clean prose of similar length
    soup = spark.createDataFrame([(1, "!!! ??? ;;; ***" * 3)], "i int, text string")
    clean = spark.createDataFrame([(1, "a clean readable sentence here" )], "i int, text string")
    s_soup = soup.select(text_ops.quality_score_expr(F.col("text")).alias("q")).first()["q"]
    s_clean = clean.select(text_ops.quality_score_expr(F.col("text")).alias("q")).first()["q"]
    assert s_clean > s_soup


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "different")],
        "doc_id bigint, text string",
    )
    fps = [r["fp"] for r in df.select(hashing.fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_analyze_documents_shape(spark, docs):
    out = text_ops.analyze_documents(docs)
    assert out.columns == ["doc_id", "pred_lang", "n_tokens_ws", "n_tokens_bpe", "quality", "fp"]
    assert out.count() == 5


def test_chunk_documents_windows_and_overlap(spark):
    from penr_oz_agent_memory_rust_spark.operators.text_ops import chunk_documents

    text = " ".join(f"t{i}" for i in range(100))
    df = spark.createDataFrame([(1, text), (2, "short doc")], "doc_id bigint, text string")
    out = chunk_documents(df, chunk_tokens=64, stride=48).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 100 tokens, window 64, stride 48 -> starts at 1 and 49 => 2 chunks
    chunks1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [r["chunk_idx"] for r in chunks1] == [0, 1]
    assert chunks1[0]["n_chunk_tokens"] == 64
    assert chunks1[1]["n_chunk_tokens"] == 52  # tail window truncated
    assert chunks1[0]["chunk_text"].split(" ")[0] == "t0"
    assert chunks1[1]["chunk_text"].split(" ")[0] == "t48"
    # every token covered
    covered = set()
    for r in chunks1:
        covered.update(r["chunk_text"].split(" "))
    assert len(covered) == 100
    # short doc: single whole-text chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "short doc"


def test_deterministic_sample_stability_and_rate(spark):
    from penr_oz_agent_memory_rust_spark.operators.text_ops import deterministic_sample

    df = spark.createDataFrame([(i, "x") for i in range(1000)], "doc_id bigint, text string")
    s1 = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 30).collect()}
    s2 = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 30).collect()}
    assert s1 == s2  # reproducible
    assert 0.2 < len(s1) / 1000 < 0.4  # near the nominal rate
    # different salt -> different survivors
    s3 = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 30, salt="other").collect()}
    assert s1 != s3
    # larger percent is a superset-rate, monotone in expectation
    s50 = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 50).collect()}
    assert s1 <= s50


def test_portable_hash_matches_duckdb(spark):
    """md5_long must equal DuckDB's ('0x'||substring(md5(s),1,15))::BIGINT —
    the foundation of every oracle-checked dedup operator."""
    import duckdb

    words = ["alpha", "beta", "gamma delta", ""]
    df = spark.createDataFrame([(w,) for w in words], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", hashing.md5_long(F.col("s")).alias("h")).collect()}
    for w in words:
        expect = duckdb.sql(
            f"SELECT ('0x' || substring(md5('{w}'), 1, 15))::BIGINT"
        ).fetchone()[0]
        assert got[w] == expect, w


def test_repetition_profile_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            # 6 words: 'spam' x4 + 'a b'; distinct=3; top word 4/6
            # bigrams: 'spam spam' x3, 'spam a', 'a b' -> top 3/5
            (1, "spam spam spam spam a b"),
            # all distinct: dup 0, top word 1/4, top bigram 1/3
            (2, "one two three four"),
            # single word: no bigrams -> null top_bigram_frac, ok=true
            (3, "word"),
        ],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in text_ops.repetition_profile(docs).collect()}
    r1 = rows[1]
    assert r1["n_words"] == 6
    assert r1["dup_word_frac"] == pytest.approx(0.5)
    assert r1["top_word_frac"] == pytest.approx(round(4 / 6, 6))
    assert r1["top_bigram_frac"] == pytest.approx(0.6)
    assert not r1["repetition_ok"]  # dup 0.5 > 0.30
    r2 = rows[2]
    assert r2["dup_word_frac"] == 0.0
    assert r2["top_word_frac"] == 0.25
    # every bigram of a 4-word all-distinct doc carries 1/3 of the bigram
    # mass — above the 0.18 Gopher threshold, so even this doc flags (the
    # thresholds target real-length docs; callers gate on n_words)
    assert r2["top_bigram_frac"] == pytest.approx(round(1 / 3, 6))
    assert not r2["repetition_ok"]
    r3 = rows[3]
    assert r3["top_bigram_frac"] is None
    assert r3["repetition_ok"]


def test_repetition_gopher_thresholds(spark):
    """The pass flag applies BOTH rules: a doc under the dup threshold but
    over the top-bigram threshold fails."""
    looped = "alpha beta " * 40 + "gamma delta " + "x1 x2 x3 x4 x5 x6 x7 x8"
    docs = spark.createDataFrame([(1, looped.strip())], "doc_id bigint, text string")
    r = text_ops.repetition_profile(docs).first()
    assert r["top_bigram_frac"] > 0.18
    assert not r["repetition_ok"]


def _winnow_brute(text: str, k: int = 8, w: int = 4):
    """Reference implementation straight from the paper: per window of w
    gram hashes take (min value, rightmost position), dedupe."""
    import hashlib as hl
    import re

    t = re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", "", text.lower())).strip()
    if len(t) < k:
        return set()
    hs = [
        int(hl.md5(t[i : i + k].encode()).hexdigest()[:10], 16)
        for i in range(len(t) - k + 1)
    ]
    out = set()
    for p in range(len(hs)):  # shrink tail windows like the SQL frame does
        win = hs[p : p + w]
        m = min(win)
        pos = p + max(i for i, v in enumerate(win) if v == m)
        out.add((pos + 1, m))  # 1-based
    return out


def test_winnowing_matches_bruteforce(spark):
    texts = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "aaaaaaaaaaaaaaaaaaaa"),  # degenerate: identical grams, tie-breaks
        (3, "Mixed CASE and punct!!! gets normalized away..."),
        (4, "short"),  # below k after normalization -> no fingerprints
    ]
    docs = spark.createDataFrame(texts, "doc_id bigint, text string")
    got: dict[int, set] = {}
    for r in text_ops.winnowing_fingerprints(docs, k=8, window=4).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    for doc_id, text in texts:
        assert got.get(doc_id, set()) == _winnow_brute(text), doc_id


def test_winnowing_shared_substring_guarantee(spark):
    """The paper's guarantee: any shared substring of length >= k + w - 1
    (= 11 here) contributes at least one COMMON fingerprint value."""
    shared = "zqxwvutsrqp"  # 11 chars, appears in both docs
    docs = spark.createDataFrame(
        [(1, f"first document {shared} tail one"), (2, f"other text {shared} end")],
        "doc_id bigint, text string",
    )
    fps = {1: set(), 2: set()}
    for r in text_ops.winnowing_fingerprints(docs, k=8, window=4).collect():
        fps[r["doc_id"]].add(r["fp"])
    assert fps[1] & fps[2]


def test_strip_markup_drops_script_style_decodes_entities(spark):
    from penr_oz_agent_memory_rust_spark.operators.text_ops import strip_markup

    html = (
        "<html><head><STYLE>body{x}</STYLE>"
        "<script>var a = '<div>not text</div>';\nmore();</script></head>"
        "<body><!-- hidden\ncomment --><p>Hello &amp; welcome to "
        "<b>Q&amp;A</b> &lt;live&gt;</p>   <br/>Bye</body></html>"
    )
    df = spark.createDataFrame([(html,)], "t string").select(
        strip_markup(F.col("t")).alias("s")
    )
    assert df.collect()[0].s == "Hello & welcome to Q&A <live> Bye"


def test_strip_markup_plain_text_passthrough(spark):
    from penr_oz_agent_memory_rust_spark.operators.text_ops import strip_markup

    df = spark.createDataFrame([("just  plain   text",)], "t string").select(
        strip_markup(F.col("t")).alias("s")
    )
    assert df.collect()[0].s == "just plain text"


def test_normalize_text_nfc_controls_and_whitespace(spark):
    rows = [
        (1, "cafe\u0301 au  lait"),     # decomposed e + COMBINING ACUTE
        (2, "caf\u00e9 au lait"),             # precomposed — must converge to #1
        (3, "a\x00b\x07c\td\ne"),             # controls stripped, ws collapsed
        (4, None),                             # null passes through
        (5, "  edge  \t spaces  "),
    ]
    df = spark.createDataFrame(rows, "id bigint, text string")
    out = {r["id"]: r["text"] for r in
           text_ops.normalize_text(df, "text").collect()}
    assert out[1] == out[2] == "caf\u00e9 au lait"
    assert len(out[1]) == 12  # precomposed single codepoint
    assert out[3] == "abc d e"
    assert out[4] is None
    assert out[5] == "edge spaces"


def test_normalize_text_forms_and_flags(spark):
    df = spark.createDataFrame([(1, "caf\u00e9  x")], "id bigint, text string")
    nfd = text_ops.normalize_text(df, "text", form="NFD", collapse_ws=False)
    assert nfd.collect()[0]["text"] == "cafe\u0301  x"
    keep = text_ops.normalize_text(df, "text", out_col="norm")
    row = keep.collect()[0]
    assert row["text"] == "caf\u00e9  x" and row["norm"] == "caf\u00e9 x"
    import pytest as _pt

    with _pt.raises(ValueError, match="form must be"):
        text_ops.normalize_text(df, "text", form="NFX")


def _gopher_rows(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    return {r["doc_id"]: r.asDict()
            for r in text_ops.gopher_quality_rules(df).collect()}


def test_gopher_rules_passing_prose(spark):
    prose = " ".join(["the quick brown fox jumps over that lazy dog and"] * 6)
    out = _gopher_rows(spark, [prose])[0]
    assert out["n_words"] == 60
    assert out["mean_word_len"] == 3.9
    assert out["alpha_word_frac"] == 1.0
    assert out["symbol_word_ratio"] == 0.0
    assert out["bullet_line_frac"] == 0.0
    assert out["ellipsis_line_frac"] == 0.0
    assert out["stopword_hits"] == 3  # the, that, and
    assert out["gopher_ok"] is True


def test_gopher_rules_line_metrics(spark):
    bullets = "- one\n* two\n• three\nplain line\n\n"
    ellipses = "abc...\ndef …\nghi"
    out = _gopher_rows(spark, [bullets, ellipses])
    assert out[0]["bullet_line_frac"] == 0.75  # empty line dropped
    assert out[0]["gopher_ok"] is False  # fails word count (and bullets < 0.9)
    assert out[1]["ellipsis_line_frac"] == 0.666667
    assert out[1]["n_words"] == 4  # abc... / def / … / ghi


def test_gopher_rules_symbol_ratio_and_alpha(spark):
    hashes = "# tag # tag2 #"
    dots = "so... yes...."  # '...' occurs twice non-overlapping, no '…'
    out = _gopher_rows(spark, [hashes, dots])
    assert out[0]["symbol_word_ratio"] == 0.6  # 3 hashes / 5 words
    assert out[0]["alpha_word_frac"] == 0.4  # tag, tag2 of 5
    assert out[0]["mean_word_len"] == 2.0  # (1+3+1+4+1)/5
    assert out[1]["symbol_word_ratio"] == 1.0  # 2 ellipses / 2 words


def test_gopher_rules_degenerate_docs_fail_closed(spark):
    out = _gopher_rows(spark, ["", "   ", None])
    for i in range(3):
        assert out[i]["n_words"] in (0, None)
        assert out[i]["mean_word_len"] is None
        assert out[i]["bullet_line_frac"] is None
        assert out[i]["gopher_ok"] is False


def test_gopher_alpha_regex_multilingual(spark):
    # default [a-z] is the English-targeted paper behavior: a Cyrillic
    # doc's words carry no Latin letter, so alpha_word_frac = 0 and the
    # doc fails CLOSED — pinned as intended; \p{L} (any Unicode letter)
    # is the multilingual escape hatch and must pass the same doc.
    ru = " ".join(["быстрая рыжая лиса прыгает через ленивую собаку the and"] * 8)
    df = spark.createDataFrame([(0, ru)], "doc_id bigint, text string")
    kw = dict(min_words=10, min_stopword_hits=1, min_mean_word_len=1.0)
    latin = text_ops.gopher_quality_rules(df, **kw).collect()[0]
    assert latin["alpha_word_frac"] < 0.8 and latin["gopher_ok"] is False
    uni = text_ops.gopher_quality_rules(df, alpha_regex=r"\p{L}", **kw).collect()[0]
    assert uni["alpha_word_frac"] == 1.0 and uni["gopher_ok"] is True
    # the inline predicate honors the same option
    assert df.filter(
        text_ops.gopher_ok_expr(F.col("text"), alpha_regex=r"\p{L}", **kw)
    ).count() == 1
    assert df.filter(text_ops.gopher_ok_expr(F.col("text"), **kw)).count() == 0


def test_gopher_ok_expr_matches_profiling_form(spark):
    texts = [
        " ".join(["the quick brown fox jumps over that lazy dog and"] * 6),
        "- one\n* two\n• three\nplain line",
        "# tag # tag2 #",
        "so... yes....",
        "",
        None,
        "short",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    kw = dict(min_words=10, min_stopword_hits=1)
    via_profile = {
        r["doc_id"]
        for r in text_ops.gopher_quality_rules(df, **kw).collect()
        if r["gopher_ok"]
    }
    via_expr = {
        r["doc_id"]
        for r in df.filter(
            text_ops.gopher_ok_expr(F.col("text"), **kw)
        ).collect()
    }
    assert via_profile == via_expr


def test_source_quality_profile_hand_computed(spark):
    rows = [
        ("a", "the quick brown fox jumps over that lazy dog and again now ok"),
        ("a", "zz"),  # fails gopher (word count / stopwords)
        ("b", "the quick brown fox jumps over that lazy dog and again now ok"),
    ]
    docs = spark.createDataFrame(rows, "source string, text string")
    prof = {
        r["source"]: r.asDict()
        for r in text_ops.source_quality_profile(
            docs, gopher_kwargs=dict(min_words=10, min_stopword_hits=1)
        ).collect()
    }
    assert prof["a"]["n_docs"] == 2 and prof["a"]["gopher_pass_rate"] == 0.5
    assert prof["b"]["n_docs"] == 1 and prof["b"]["gopher_pass_rate"] == 1.0
    assert prof["b"]["std_quality"] == 0.0  # single doc: stddev nulls to 0


def test_filter_low_quality_sources_drops_whole_domain(spark):
    from penr_oz_agent_memory_rust_spark.plans import explain

    rows = [("good", f"the and that have with words body {i} ok fine", i) for i in range(4)]
    rows += [("spam", "buy now !!!", 100 + i) for i in range(4)]
    docs = spark.createDataFrame(rows, "source string, text string, doc_id bigint")
    prof = text_ops.source_quality_profile(
        docs, gopher_kwargs=dict(min_words=5, min_stopword_hits=1)
    )
    kept = text_ops.filter_low_quality_sources(docs, prof, min_gopher_pass_rate=0.5)
    assert {r["source"] for r in kept.collect()} == {"good"}
    assert kept.count() == 4
    # the reject list broadcasts: corpus side has no shuffle for the join
    assert "BroadcastHashJoin" in explain.physical_plan(kept)


def test_strip_common_lines_drops_site_chrome_only(spark):
    from penr_oz_agent_memory_rust_spark.plans import explain

    rows = [
        ("s1", 1, "HEAD s1\nunique alpha one\nFOOT s1"),
        ("s1", 2, "HEAD s1\nunique beta two\nFOOT s1"),
        ("s1", 3, "HEAD s1\nunique gamma three\nFOOT s1\nrare extra"),
        ("s2", 4, "HEAD s2\nunique delta four\nFOOT s2"),
        ("s2", 5, "HEAD s2\nunique epsilon five\nFOOT s2"),
    ]
    docs = spark.createDataFrame(rows, "source string, doc_id bigint, text string")
    out = {
        r["doc_id"]: r
        for r in text_ops.strip_common_lines(docs, min_frac=0.5, min_docs=2).collect()
    }
    assert out[1]["text_clean"] == "unique alpha one"
    assert out[1]["n_lines"] == 3 and out[1]["n_removed"] == 2
    # "rare extra" occurs in 1/3 of s1 docs: kept
    assert out[3]["text_clean"] == "unique gamma three\nrare extra"
    # group scoping: s2's chrome never leaks into s1's vocabulary
    assert out[4]["text_clean"] == "unique delta four"
    # the boilerplate vocabulary broadcasts; corpus side rewrite is join-free
    plan = explain.physical_plan(
        text_ops.strip_common_lines(docs, min_frac=0.5, min_docs=2)
    )
    assert "BroadcastHashJoin" in plan


def test_strip_common_lines_duplicated_line_inside_one_doc(spark):
    # a line repeated WITHIN one doc counts once for df (array_distinct),
    # but every occurrence is stripped once it is boilerplate
    rows = [
        ("s", 1, "ad\nbody one\nad"),
        ("s", 2, "ad\nbody two"),
    ]
    docs = spark.createDataFrame(rows, "source string, doc_id bigint, text string")
    out = {
        r["doc_id"]: r
        for r in text_ops.strip_common_lines(docs, min_frac=1.0, min_docs=2).collect()
    }
    assert out[1]["text_clean"] == "body one" and out[1]["n_removed"] == 2
    assert out[2]["text_clean"] == "body two" and out[2]["n_removed"] == 1


def test_strip_common_lines_null_text_passes_through(spark):
    """r9 ADVICE: NULL text must pass through with DEFINED output
    (n_lines=0, n_removed=0, text_clean=NULL — the gram-level sibling's
    null contract), not config-dependent -1/null from split(NULL); and a
    null-text doc must not count toward the min_frac denominator (here:
    with the null doc excluded, 'ad' hits 2/2 of s's non-null docs and
    strips; counting the null doc would make it 2/3 < min_frac=0.9)."""
    rows = [
        ("s", 1, "ad\nbody one"),
        ("s", 2, "ad\nbody two"),
        ("s", 3, None),
    ]
    docs = spark.createDataFrame(rows, "source string, doc_id bigint, text string")
    out = {
        r["doc_id"]: r
        for r in text_ops.strip_common_lines(docs, min_frac=0.9, min_docs=2).collect()
    }
    assert out[3]["n_lines"] == 0 and out[3]["n_removed"] == 0
    assert out[3]["text_clean"] is None
    assert out[1]["text_clean"] == "body one" and out[1]["n_removed"] == 1
    assert out[2]["text_clean"] == "body two"


def test_strip_common_lines_min_frac_guard(spark):
    docs = spark.createDataFrame(
        [("s", 1, "a")], "source string, doc_id bigint, text string"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        text_ops.strip_common_lines(docs, min_frac=0.0)
