"""URL canonicalization + canonical-URL dedup (operators/urls.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.operators import urls


def _canon(spark, raw):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(raw)], "i int, url string")
    rows = df.select("i", urls.canonicalize_url_expr(F.col("url")).alias("c")).collect()
    return [r["c"] for r in sorted(rows, key=lambda r: r["i"])]


def test_canonicalize_url_normal_form(spark):
    got = _canon(spark, [
        "HTTP://WWW.Example.com:80/a/b/?utm_source=x&id=3#frag",
        "http://example.com/a/b?id=3",
        "https://Example.COM:443/Path/",           # https default port, case path
        "https://example.com/Path",
        "example.com/x?b=2&a=1",                   # no scheme, params sorted
        "http://example.com/x?a=1&b=2",
        "http://sub.example.com/?gclid=zzz&fbclid=y&ref=z",  # tracking-only query
        "http://example.com:8080/x",               # NON-default port kept
        None,
        "  http://example.com/pad  ",              # padded: trim FIRST
        "http://example.com/pad",
    ])
    assert got[0] == got[1] == "http://example.com/a/b?id=3"
    assert got[2] == got[3] == "https://example.com/Path"
    assert got[4] == got[5] == "http://example.com/x?a=1&b=2"
    assert got[6] == "http://sub.example.com"
    assert got[7] == "http://example.com:8080/x"
    assert got[8] is None
    assert got[9] == got[10] == "http://example.com/pad"


def test_url_host_and_domain_heuristic(spark):
    df = spark.createDataFrame(
        [
            (1, "https://deep.sub.example.com/x"),
            (2, "http://www.example.co.uk:80/y"),
            (3, "http://192.168.0.1:8080/z"),
            (4, "http://localhost/q"),
        ],
        "i int, url string",
    )
    rows = {
        r["i"]: (r["h"], r["d"])
        for r in df.select(
            "i",
            urls.url_host_expr(F.col("url")).alias("h"),
            urls.url_domain_expr(F.col("url")).alias("d"),
        ).collect()
    }
    assert rows[1] == ("deep.sub.example.com", "example.com")
    assert rows[2] == ("example.co.uk", "example.co.uk")
    assert rows[3] == ("192.168.0.1", "192.168.0.1")
    assert rows[4] == ("localhost", "localhost")


def test_url_dedup_keep_best(spark):
    from penr_oz_agent_memory_rust_spark.plans import explain

    df = spark.createDataFrame(
        [
            (1, "HTTP://WWW.a.com/p?utm_source=x", 5.0),
            (2, "http://a.com/p", 9.0),            # best of the cluster
            (3, "http://a.com/p/", 9.0),           # tie -> smaller id wins (2)
            (4, "http://b.com/q", 1.0),
            (5, None, 1.0),                        # null URL: own singleton
            (6, None, 2.0),                        # ...and so is this one
        ],
        "doc_id bigint, url string, score double",
    )
    out = {r["doc_id"]: r for r in urls.url_dedup_keep_best(df, F.col("score")).collect()}
    assert set(out) == {2, 4, 5, 6}
    assert out[2]["dup_count"] == 3 and out[2]["score"] == 9.0
    assert out[2]["canonical_url"] == "http://a.com/p"
    assert out[4]["dup_count"] == 1
    assert out[5]["canonical_url"] is None and out[5]["dup_count"] == 1
    # min_by-struct argmax: one shuffle on the canonical key, NO window
    # function (same plan family as exact_dedup_keep_best — Spark's
    # min_by evaluates as a sort-based aggregate, which sorts within
    # the group partitions only; the scale hazard is a global Window)
    plan = explain.physical_plan(urls.url_dedup_keep_best(df, F.col("score")))
    assert "Window" not in plan
    assert plan.count("Exchange") <= 2  # partial agg -> one shuffle -> final


def test_canonicalize_idempotent(spark):
    """Canonicalization must be a projection: applying it to its own
    output is a no-op. (The property that makes canonical keys safe to
    store — a re-canonicalizing consumer never re-keys the table.)"""
    raw = [
        "HTTP://WWW.Example.com:80/a/b/?utm_source=x&id=3#frag",
        "https://Example.COM:443/Path/",
        "example.com/x?b=2&a=1",
        "http://sub.example.com/?gclid=z",
        "http://example.com:8080/x",
        "  http://example.com/pad  ",
        "http://a.com/p?z=1&y=2&x=3",
        "http://example.co.uk/CaseKept/Path?one=1",
        "192.168.0.1/raw",
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(raw)], "i int, url string")
    once = df.select("i", urls.canonicalize_url_expr(F.col("url")).alias("c1"))
    twice = once.select(
        "i", "c1", urls.canonicalize_url_expr(F.col("c1")).alias("c2")
    ).collect()
    for r in twice:
        assert r["c1"] == r["c2"], (raw[r["i"]], r["c1"], r["c2"])


def test_block_by_domain_registrable_level(spark):
    """Blocking a registrable domain removes its subdomain hosts too;
    the blocklist broadcasts (corpus side never shuffles)."""
    from penr_oz_agent_memory_rust_spark.plans import explain

    docs = spark.createDataFrame(
        [
            (1, "http://www.bad.com/a"),
            (2, "https://deep.sub.bad.com/b"),     # subdomain of blocked
            (3, "http://good.com/c"),
            (4, "http://bad.co.uk/d"),             # cc-2LD blocked entry
            (5, "http://goodbad.com/e"),           # NOT blocked (different domain)
        ],
        "doc_id bigint, url string",
    )
    bl = spark.createDataFrame([("bad.com",), ("bad.co.uk",)], "domain string")
    out = urls.block_by_domain(docs, bl)
    assert sorted(r["doc_id"] for r in out.collect()) == [3, 5]
    plan = explain.physical_plan(urls.block_by_domain(docs, bl))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_canonicalize_edge_cases_total_and_idempotent(spark):
    """Adversarial inputs: canonicalization must be TOTAL (no exception,
    garbage in -> deterministic garbage out) and idempotent on every
    input; representative normalizations pinned."""
    edges = [
        "", " ", "?", "#", "http://", ":80", "http://?q=1", "http://#f",
        "a b", "http://exämple.com/päth?ü=1", "ftp://files.example.com/x",
        "http://h/?", "http://h?&&", "http://h/p?=v",
        "http://h//double//slash//", "HTTP://WWW.", "www.example.com",
        "http://[::1]:8080/v6", "//protocol-relative.com/x",
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(edges)], "i int, url string"
    )
    rows = {
        r["i"]: (r["c1"], r["c2"])
        for r in df.select(
            "i", urls.canonicalize_url_expr(F.col("url")).alias("c1")
        )
        .select("i", "c1", urls.canonicalize_url_expr(F.col("c1")).alias("c2"))
        .collect()
    }
    for i, u in enumerate(edges):
        c1, c2 = rows[i]
        assert c1 is not None and c1 == c2, (u, c1, c2)
    got = {edges[i]: rows[i][0] for i in rows}
    assert got[""] == "http://"
    assert got["http://h/?"] == "http://h"
    assert got["http://h?&&"] == "http://h"
    assert got["http://h//double//slash//"] == "http://h//double//slash"
    assert got["www.example.com"] == "http://example.com"
    assert got["ftp://files.example.com/x"] == "ftp://files.example.com/x"
    assert got["http://[::1]:8080/v6"] == "http://[::1]:8080/v6"
    assert got["http://exämple.com/päth?ü=1"] == "http://exämple.com/päth?ü=1"


def test_url_dedup_incremental_drops_recrawls_keeps_fresh(spark):
    seen = spark.createDataFrame(
        [("http://a.com/p?x=1",), ("http://b.com/q",)], "canonical_url string"
    )
    batch = spark.createDataFrame(
        [
            (1, "HTTP://WWW.a.com/p/?utm_source=z&x=1"),  # recrawl of seen
            (2, "http://b.com/q#frag"),                    # recrawl of seen
            (3, "http://c.com/new"),                       # fresh
        ],
        "doc_id bigint, url string",
    )
    out = urls.url_dedup_incremental(batch, seen).collect()
    assert [(r["doc_id"], r["canonical_url"]) for r in out] == [
        (3, "http://c.com/new")
    ]


def test_extract_links_both_quote_styles(spark):
    docs = spark.createDataFrame(
        [
            (1, '<a href="http://a.com/x">x</a> <a href=\'http://b.com/y\'>y</a>'),
            (2, '<p>no links</p>'),
            (3, '<a href = "/relative/path">r</a>'),
        ],
        "doc_id bigint, text string",
    )
    out = urls.extract_links(docs).collect()
    got = {(r["doc_id"], r["link"]) for r in out}
    assert got == {
        (1, "http://a.com/x"),
        (1, "http://b.com/y"),
        (3, "/relative/path"),
    }
    # positions are a stable per-doc sequence
    pos = sorted(r["link_pos"] for r in out if r["doc_id"] == 1)
    assert pos == [0, 1]
