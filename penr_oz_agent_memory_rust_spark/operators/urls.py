"""URL canonicalization + canonical-URL dedup — the crawl pipeline's
FRONT dedup stage, upstream of any content hashing: the same page is
crawled as `HTTP://WWW.Example.com:80/a/b/?utm_source=x&id=3#frag` and
`http://example.com/a/b?id=3`, and deduping by canonical URL removes the
recrawl mass for the cost of string expressions — no shingles, no
hashes, no shuffle beyond the final group-by. (CCNet/RefinedWeb both
canonicalize URLs before content dedup; the reference engine has no
crawl surface — this is north-star pipeline scope, like the rest of the
dedup family.)

All canonicalization is pure JVM expressions (regexp + higher-order
array functions), so Catalyst keeps it in whole-stage codegen and the
DuckDB oracle mirrors it function-for-function.

Canonical form (documented, deliberately opinionated):
  - missing scheme -> "http://" assumed; scheme and host lowercased
    (path/query case PRESERVED — it is significant on most servers)
  - fragment stripped; default ports stripped (http:80, https:443)
  - leading "www." stripped from the host
  - tracking params stripped (utm_*, gclid, fbclid, ref, mc_cid, mc_eid)
  - remaining query params sorted (param ORDER is almost never
    significant; sorting merges permuted recrawls)
  - trailing slashes stripped from the path
  - NULL url -> NULL canonical (pass-through)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_TRACKING_RE = "^(utm_[^=]*|gclid|fbclid|ref|mc_cid|mc_eid)(=.*)?$"
_SCHEME_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://"


def canonicalize_url_expr(url: Column) -> Column:
    """The canonical-URL column expression (see module docstring for the
    exact normal form). Composable: use directly in a select, or via
    url_dedup_keep_best for the dedup policy."""
    # trim FIRST: a padded " http://x" must match the scheme test, not
    # get a second scheme prepended onto garbage (caught in the r10
    # self-review — the oracle mirrored the wrong order identically)
    t = F.trim(url)
    with_scheme = F.when(
        t.rlike(_SCHEME_RE), t
    ).otherwise(F.concat(F.lit("http://"), t))
    u = F.regexp_replace(with_scheme, "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    hostport = F.regexp_replace(
        F.lower(F.regexp_extract(rest, "^([^/?]*)", 1)), "^www\\.", ""
    )
    host = (
        F.when(scheme == F.lit("http"), F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == F.lit("https"), F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    path_raw = F.regexp_extract(rest, "^[^/?]*([^?]*)", 1)
    path = F.regexp_replace(path_raw, "/+$", "")
    query_raw = F.when(
        rest.contains("?"), F.regexp_replace(rest, "^[^?]*\\?", "")
    ).otherwise(F.lit(""))
    params = F.filter(
        F.split(query_raw, "&"),
        lambda p: (p != F.lit("")) & ~p.rlike(_TRACKING_RE),
    )
    sorted_q = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(sorted_q != "", F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")),
    )
    return F.when(url.isNull(), F.lit(None).cast("string")).otherwise(canon)


def url_host_expr(url: Column) -> Column:
    """Lowercased host (www. and port stripped) of the canonical form."""
    t = F.trim(url)
    with_scheme = F.when(t.rlike(_SCHEME_RE), t).otherwise(
        F.concat(F.lit("http://"), t)
    )
    rest = F.regexp_replace(F.regexp_replace(with_scheme, "#.*$", ""), _SCHEME_RE, "")
    hostport = F.regexp_replace(
        F.lower(F.regexp_extract(rest, "^([^/?]*)", 1)), "^www\\.", ""
    )
    return F.regexp_replace(hostport, ":[0-9]+$", "")


def url_domain_expr(url: Column) -> Column:
    """Registrable-domain HEURISTIC: the last two host labels, or three
    when the second-to-last label is a well-known second-level zone
    (co/com/net/org/ac/gov/edu) under a 2-letter ccTLD — example.co.uk
    stays example.co.uk, deep.sub.example.com becomes example.com. A
    full public-suffix list is a data file, not an algorithm; this
    heuristic covers the overwhelming majority of crawl hosts and is
    oracle-portable. IP hosts pass through unchanged."""
    host = url_host_expr(url)
    labels = F.split(host, "\\.")
    n = F.size(labels)
    is_ip = host.rlike("^[0-9.]+$")
    second = F.element_at(labels, -2)
    tld = F.element_at(labels, -1)
    take3 = (
        (n >= 3)
        & second.rlike("^(co|com|net|org|ac|gov|edu)$")
        & tld.rlike("^[a-z]{2}$")
    )
    k = F.when(take3, F.lit(3)).otherwise(F.lit(2))
    return F.when(is_ip | (n <= 2), host).otherwise(
        F.array_join(F.slice(labels, n - k + 1, k), ".")
    )


def url_dedup_keep_best(
    docs: DataFrame,
    score_expr: Column,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Canonical-URL dedup with the keep-best policy: group by
    canonicalize_url_expr(url), keep the highest-score doc (ties to
    smallest id). The URL twin of exact_dedup_keep_best — one shuffle on
    the canonical string, per-group argmax as a min_by struct
    (HashAggregate, no window). Rows with NULL url survive as their own
    singletons (keyed by id — a missing URL says nothing about
    duplication). Output: (id, canonical_url, dup_count, score)."""
    canon = canonicalize_url_expr(F.col(url_col))
    scored = docs.select(
        F.col(id_col),
        canon.alias("canonical_url"),
        score_expr.alias("__s"),
    ).withColumn(
        "__key",
        F.coalesce(F.col("canonical_url"), F.concat(F.lit("\x00null:"), F.col(id_col).cast("string"))),
    )
    tiebreak = F.struct((-F.col("__s")).alias("__ns"), F.col(id_col).alias("__id"))
    # one min_by, not two: canonical_url is recovered from the group key
    # itself (it IS the key, except for the null-singleton wrapper), so
    # the aggregation buffer carries only the id/score primitives.
    return (
        scored.groupBy("__key")
        .agg(
            F.min_by(F.col(id_col), tiebreak).alias(id_col),
            F.max("__s").alias("score"),
            F.count("*").alias("dup_count"),
        )
        .select(
            id_col,
            F.when(F.col("__key").startswith("\x00null:"), F.lit(None).cast("string"))
            .otherwise(F.col("__key"))
            .alias("canonical_url"),
            "dup_count",
            "score",
        )
    )


def block_by_domain(
    docs: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
) -> DataFrame:
    """Domain-level blocklist filter — the robots-retro / licensing /
    abuse-list gate every crawl pipeline runs before content ever enters
    curation. Drops every document whose REGISTRABLE domain
    (url_domain_expr heuristic) appears in `blocklist`; matching at the
    registrable level means blocking example.com also blocks
    deep.sub.example.com, which host-exact matching silently misses.

    Shape: the blocklist (thousands of rows, not corpus-scale) is
    distinct-projected and BROADCAST; the corpus side is one anti-join —
    no shuffle of the corpus, domain extraction is pure JVM regexp.
    Output: the surviving docs, original columns unchanged."""
    dom = url_domain_expr(F.col(url_col))
    bl = F.broadcast(
        blocklist.select(F.col(domain_col).alias("__dom")).distinct()
    )
    return (
        docs.withColumn("__dom", dom).join(bl, "__dom", "anti").drop("__dom")
    )


def url_dedup_incremental(
    new_docs: DataFrame,
    seen_canonical: DataFrame,
    url_col: str = "url",
    canonical_col: str = "canonical_url",
) -> DataFrame:
    """Incremental crawl dedup: drop new-batch documents whose CANONICAL
    URL is already in the corpus's stored canonical-key table (the
    url_dedup_keep_best output, maintained across ingests — the URL twin
    of dedup_incremental's fingerprint anti-join). Within-batch
    duplicates are the caller's url_dedup_keep_best pass; this stage is
    the batch-vs-corpus half.

    Shape: the batch side canonicalizes inline (map-only) and anti-joins
    the key table ON the canonical string — both sides shuffle on the
    key, O(batch + matched keys); at 100 TB the key table is the
    deduped corpus's URL column, orders of magnitude smaller than the
    corpus itself, and a bloom/stats-pruned versioned table serves it
    incrementally (the same layout dedup_incremental uses). Output: the
    surviving new docs + their canonical_url column."""
    out = new_docs.withColumn(
        "canonical_url", canonicalize_url_expr(F.col(url_col))
    )
    keys = seen_canonical.select(
        F.col(canonical_col).alias("canonical_url")
    ).distinct()
    return out.join(keys, "canonical_url", "anti")


def extract_links(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Crawl-frontier link extraction: one row per href in the document's
    markup — the step between strip_markup's content extraction and this
    module's canonicalize/block/dedup chain (extract -> canonicalize ->
    block_by_domain -> url_dedup_incremental is the frontier loop every
    crawler runs). Matches double- and single-quoted href attributes;
    relative links (no scheme, no leading host) are emitted as-is for the
    caller to resolve against the page URL — resolution needs the BASE
    url, which is row metadata, not markup. Pure JVM regexp, one
    explode; no UDF. Output: (id, link, link_pos) with link_pos the
    0-based occurrence index (stable dedup/tiebreak key downstream)."""
    t = F.col(text_col)
    both = F.concat(
        F.expr(f"regexp_extract_all({text_col}, 'href\\\\s*=\\\\s*\"([^\"]*)\"', 1)"),
        F.expr(f"regexp_extract_all({text_col}, \"href\\\\s*=\\\\s*'([^']*)'\", 1)"),
    )
    return docs.select(
        F.col(id_col),
        F.posexplode(both).alias("link_pos", "link"),
    ).select(id_col, "link", F.col("link_pos").cast("bigint").alias("link_pos"))
