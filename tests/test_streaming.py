"""Structured Streaming ingest + windowed aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from penr_oz_agent_memory_rust_spark.schemas import MEMORIES_SCHEMA, SESSIONS_SCHEMA
from penr_oz_agent_memory_rust_spark.sources.embedding_providers import hash_embed_udf
from penr_oz_agent_memory_rust_spark.sources.tables import ParquetTable
import pytest

from penr_oz_agent_memory_rust_spark.streaming import ingest


def test_ingest_stream_end_to_end(spark, tmp_path):
    """Micro-batch ingest: inbox parquet -> validate -> embed -> memories
    table; invalid (empty-text) rows dropped; sessions touched."""
    import datetime as dt

    inbox = str(tmp_path / "inbox")
    rows = spark.createDataFrame(
        [
            ("m1", "hello spark streaming", {"k": "v"}, "s1"),
            ("m2", "", None, None),  # rejected: empty text
            ("m3", "another memory", None, "missing-session"),  # rejected: FK
            ("m4", "unlinked memory", None, None),
        ],
        ingest.INBOX_SCHEMA,
    )
    rows.write.parquet(inbox)

    sessions_t = ParquetTable(spark, str(tmp_path / "sessions"), SESSIONS_SCHEMA)
    t0 = dt.datetime(2026, 1, 1)
    sessions_t.append(
        spark.createDataFrame([("s1", t0, t0, ["tag"])], SESSIONS_SCHEMA)
    )
    memories_t = ParquetTable(spark, str(tmp_path / "memories"), MEMORIES_SCHEMA)

    q = ingest.ingest_stream(
        spark, inbox, memories_t, sessions_t, hash_embed_udf(16), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    mem = memories_t.read().collect()
    ids = {r["id"] for r in mem}
    assert ids == {"m1", "m4"}
    by_id = {r["id"]: r for r in mem}
    assert len(by_id["m1"]["embedding"]) == 16
    assert by_id["m1"]["session"] == "s1"
    # session s1 was touched (updated_at advanced past created_at)
    s1 = sessions_t.read().filter(F.col("id") == "s1").first()
    assert s1["updated_at"] > s1["created_at"]


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState: state must carry across micro-batches —
    maxFilesPerTrigger=1 forces two batches; the final update per user must
    equal the batch aggregate over both files."""
    import datetime as dt

    src = str(tmp_path / "ev")
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    base = dt.datetime(2026, 1, 1)
    f1 = [(i, base, i % 2, "a", 1.0, "{}") for i in range(10)]
    f2 = [(100 + i, base, i % 2, "b", 2.0, "{}") for i in range(10)]
    spark.createDataFrame(f1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(f2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    q = (
        ingest.running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("totals_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    updates = spark.sql("SELECT * FROM totals_out").collect()
    # state carried across batches => more than one update row per user,
    # and the LAST update equals the full batch aggregate
    assert len(updates) > 2
    final = {}
    for r in updates:  # memory sink appends updates in batch order
        final[r["user_id"]] = (r["total_events"], r["total_value"])
    expect = {
        r["user_id"]: (r["total_events"], r["total_value"])
        for r in ingest.batch_user_totals(spark.read.parquet(src)).collect()
    }
    assert final == expect


def test_ingest_points_stream_qdrant_path(spark, tmp_path):
    """§3.2 write path per micro-batch: reserved keys and bad FKs rejected,
    valid rows embedded + enriched + upserted, session touched."""
    import datetime as dt

    from penr_oz_agent_memory_rust_spark.schemas import MEMORY_POINTS_SCHEMA

    inbox = str(tmp_path / "pts_inbox")
    rows = spark.createDataFrame(
        [
            ("p1", "valid linked point", "s1", {"k": "v"}),
            ("p2", "reserved key", None, {"text": "nope"}),
            ("p3", "bad fk", "ghost-session", None),
            ("p4", "plain point", None, None),
        ],
        ingest.POINTS_INBOX_SCHEMA,
    )
    rows.write.parquet(inbox)

    t0 = dt.datetime(2026, 1, 1)
    sessions_t = ParquetTable(spark, str(tmp_path / "sess"), SESSIONS_SCHEMA)
    sessions_t.append(spark.createDataFrame([("s1", t0, t0, None)], SESSIONS_SCHEMA))
    points_t = ParquetTable(spark, str(tmp_path / "pts"), MEMORY_POINTS_SCHEMA)

    q = ingest.ingest_points_stream(
        spark, inbox, points_t, sessions_t, hash_embed_udf(16), str(tmp_path / "ck2")
    )
    q.awaitTermination(120)

    pts = {r["id"]: r for r in points_t.read().collect()}
    assert set(pts) == {"p1", "p4"}
    assert pts["p1"]["metadata"] == {"k": "v", "session_id": "s1"}  # P8 enrichment
    assert len(pts["p1"]["vector"]) == 16
    s1 = sessions_t.read().first()
    assert s1["updated_at"] > s1["created_at"]  # C3 touch


def test_dedup_stream_drops_replayed_rows(spark, tmp_path):
    """At-least-once replay: the same event_id arriving twice within the
    watermark is emitted once."""
    import datetime as dt

    src = str(tmp_path / "dup_ev")
    base = dt.datetime(2026, 1, 1)
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    rows = [(i, base + dt.timedelta(seconds=i), 1, "a", 1.0, "{}") for i in range(5)]
    dups = rows[1:3]  # replayed rows
    spark.createDataFrame(rows + dups, schema).write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        ingest.dedup_stream(stream, ["event_id"])
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT event_id FROM dedup_out").collect()
    assert sorted(r["event_id"] for r in got) == [0, 1, 2, 3, 4]


def test_session_window_counts_stream(spark, tmp_path):
    """Native session windows: two bursts separated by > gap become two
    sessions per user; counts match the batch expectation."""
    import datetime as dt

    src = str(tmp_path / "sess_ev")
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    for u in (1, 2):
        for i in range(3):  # burst 1
            rows.append((u * 100 + i, base + dt.timedelta(minutes=i), u, "a", 1.0, "{}"))
        for i in range(2):  # burst 2, 2 hours later
            rows.append((u * 100 + 50 + i, base + dt.timedelta(hours=2, minutes=i), u, "a", 1.0, "{}"))
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    spark.createDataFrame(rows, schema).write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        ingest.session_window_counts(stream, gap="30 minutes", watermark="0 seconds")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_win_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["sess_start"]): r["n_events"]
        for r in spark.sql("SELECT * FROM sess_win_out").collect()
    }
    assert len(got) == 4  # 2 users × 2 sessions
    assert set(got.values()) == {3, 2}


def test_windowed_event_counts_stream_matches_batch(spark, tmp_path):
    """The streaming windowed agg on bounded input equals the batch plan."""
    import datetime as dt

    src = str(tmp_path / "events_src")
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        (i, base + dt.timedelta(minutes=i), i % 3, "click" if i % 2 else "view", float(i), "{}")
        for i in range(20)
    ]
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    spark.createDataFrame(rows, schema).write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    agg = ingest.windowed_event_counts(stream, window="5 minutes", watermark="10 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    batch = ingest.batch_windowed_event_counts(spark.read.parquet(src), minutes=5)
    expect = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in batch.collect()
    }
    assert got == expect and len(got) > 0


def test_run_windowed_events_once_single_file(spark, tmp_path):
    """Single-file parquet input is staged behind a symlink dir and the
    complete-mode final state equals the batch aggregation."""
    import datetime as dt

    from penr_oz_agent_memory_rust_spark.streaming.ingest import (
        batch_windowed_event_counts,
        run_windowed_events_once,
    )

    base = dt.datetime(2026, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i % 12), i % 3, "click", float(i))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double")
    # write as a single parquet FILE (the testdata layout)
    out_dir = str(tmp_path / "ev_dir")
    df.coalesce(1).write.parquet(out_dir)
    import glob as g
    fpath = g.glob(out_dir + "/part-*.parquet")[0]

    streamed = run_windowed_events_once(spark, fpath, minutes=5, name="__t_swa")
    batch = batch_windowed_event_counts(df, minutes=5)
    s = {tuple(r) for r in streamed.select("window_start", "event_type", "n").collect()}
    b = {tuple(r) for r in batch.select("window_start", "event_type", "n").collect()}
    assert s == b and len(s) > 0


def test_watermark_drops_late_rows_across_batches(spark, tmp_path):
    """Late-data contract (what Spark actually guarantees): a window is
    emitted EXACTLY ONCE in append mode — when the watermark passes its end
    — and rows arriving after that eviction are dropped rather than
    resurrecting state. (A late row arriving while the window is still in
    state IS merged; the watermark bounds eviction, it is not an admission
    filter.) Three micro-batches forced via maxFilesPerTrigger=1."""
    import datetime as dt
    import os
    import time as _time

    src = str(tmp_path / "late_src")
    os.makedirs(src, exist_ok=True)
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"

    def mk(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
            str(tmp_path / name)
        )
        import glob as g, shutil

        part = g.glob(str(tmp_path / name) + "/part-*.parquet")[0]
        shutil.copy(part, os.path.join(src, name + ".parquet"))
        _time.sleep(1.1)  # distinct mtimes => deterministic file order

    # batch 1: the [10,15) window plus a 60min row pushing the watermark to 50
    mk(
        [
            (1, base + dt.timedelta(minutes=10), 1, "click", 1.0, "{}"),
            (2, base + dt.timedelta(minutes=11), 1, "click", 1.0, "{}"),
            (3, base + dt.timedelta(minutes=60), 1, "click", 1.0, "{}"),
        ],
        "b1",
    )
    # batch 2: fresh row only; during this batch wm=50 > 15 finalizes and
    # EVICTS the [10,15) window (emitted with n=2)
    mk([(4, base + dt.timedelta(minutes=61), 1, "click", 1.0, "{}")], "b2")
    # batch 3: a late row for the evicted window + a fresh row; the late row
    # must be dropped, not resurrect state (which would emit [10,15) twice)
    mk(
        [
            (5, base + dt.timedelta(minutes=12), 1, "click", 1.0, "{}"),
            (6, base + dt.timedelta(minutes=90), 1, "click", 1.0, "{}"),
        ],
        "b3",
    )

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    agg = ingest.windowed_event_counts(stream, window="5 minutes", watermark="10 minutes")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM late_out").collect()
    w10 = base + dt.timedelta(minutes=10)
    emitted = [r["n"] for r in rows if r["window_start"] == w10]
    assert emitted == [2], rows  # exactly once, late row dropped


def test_continuous_corpus_ingest_dedup_and_index(spark, tmp_path):
    """★ continuous corpus ingestion: two inbox drops with duplicates within
    and across batches -> the corpus table holds one doc per fingerprint
    (first arrival wins across batches, min-id within a batch), the fps
    table is the shared dedup state, and every survivor lands in the IVF
    index."""
    import os

    from penr_oz_agent_memory_rust_spark.operators import dedup, ivf_index
    from penr_oz_agent_memory_rust_spark.sources.tables import ParquetTable
    from penr_oz_agent_memory_rust_spark.streaming.ingest import (
        continuous_corpus_ingest,
    )

    corpus_t = ParquetTable(
        spark, str(tmp_path / "corpus"), T.StructType.fromDDL("doc_id bigint, text string, fp string")
    )
    fps_t = ParquetTable(spark, str(tmp_path / "fps"), T.StructType.fromDDL("fp string"))
    index_path = str(tmp_path / "ivf")
    seedvecs = spark.createDataFrame(
        [(i, f"seed {i}") for i in range(8)], "vec_id bigint, text string"
    ).select("vec_id", hash_embed_udf(16)(F.col("text")).alias("embedding"))
    ivf_index.build_ivf_index(seedvecs, index_path, n_centroids=2, n_iters=2)
    n_seed = spark.read.parquet(os.path.join(index_path, "data")).count()

    import glob
    import shutil

    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox)

    def drop(df, name):
        # FileStreamSource watches top-level files: stage the part file in
        staging = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.parquet(staging)
        part = glob.glob(staging + "/part-*.parquet")[0]
        shutil.copy(part, os.path.join(inbox, f"{name}.parquet"))
        return staging

    # batch 1: doc 5 and 6 share text (min id 5 wins); doc 7 unique; 8 empty text
    drop1 = drop(
        spark.createDataFrame(
            [(5, "dup text"), (6, "dup  TEXT"), (7, "unique one"), (8, "   ")],
            "doc_id bigint, text string",
        ),
        "drop1",
    )
    q = continuous_corpus_ingest(
        spark, inbox, corpus_t, fps_t, str(tmp_path / "ck"),
        index_path=index_path, embed_udf=hash_embed_udf(16),
    )
    q.awaitTermination()
    # batch 2: doc 3 duplicates the already-seen text (first arrival 5 kept),
    # doc 9 is new
    drop2 = drop(
        spark.createDataFrame(
            [(3, "dup text"), (9, "another new")], "doc_id bigint, text string"
        ),
        "drop2",
    )
    q = continuous_corpus_ingest(
        spark, inbox, corpus_t, fps_t, str(tmp_path / "ck"),
        index_path=index_path, embed_udf=hash_embed_udf(16),
    )
    q.awaitTermination()

    got = {r["doc_id"] for r in corpus_t.read().collect()}
    assert got == {5, 7, 9}  # 6 in-batch dup, 3 cross-batch dup, 8 empty
    # fps table is exactly the surviving fingerprints
    assert fps_t.read().distinct().count() == 3
    # streamed state equals the batch operator over the union of the drops
    all_docs = spark.read.parquet(drop1, drop2).filter(F.trim("text") != "")
    assert corpus_t.read().select("fp").distinct().count() == (
        dedup.exact_dedup(all_docs).count()
    )
    # every survivor's vector landed in the index
    idx = spark.read.parquet(os.path.join(index_path, "data"))
    assert idx.count() == n_seed + 3
    assert {r["vec_id"] for r in idx.filter(F.col("vec_id") > 2).collect()} >= {5, 7, 9}


def test_run_session_windows_once_matches_batch(spark, sf_dir):
    from penr_oz_agent_memory_rust_spark.sources.tables import load_table, testdata_path

    got = ingest.run_session_windows_once(
        spark, testdata_path(sf_dir, "events"), name="__t_sess_eq"
    )
    ev = load_table(spark, sf_dir, "events")
    sec = F.timestamp_seconds(F.unix_timestamp("ts"))
    batch = (
        ev.groupBy(F.session_window(sec, "30 minutes").alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("sw.start")).alias("sess_start"),
            "n_events",
        )
    )
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_run_interval_join_once_matches_batch(spark, sf_dir):
    from penr_oz_agent_memory_rust_spark.sources.tables import load_table, testdata_path

    got = ingest.run_interval_join_once(
        spark, testdata_path(sf_dir, "events"), name="__t_ssj_eq"
    )
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("user_id").alias("pu"), F.col("ts").alias("p_ts")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("v_id"), F.col("user_id").alias("vu"), F.col("ts").alias("v_ts")
    )
    batch = p.join(
        v,
        (F.col("pu") == F.col("vu"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("interval 1 hour"))
        & (F.col("v_ts") <= F.col("p_ts")),
    ).select("p_id", "v_id")
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_stream_runners_are_rerunnable(spark, sf_dir):
    """bench runs every gate 3x in one session: a second .start() with the
    same memory-sink name must REPLACE the table, not append to it."""
    from penr_oz_agent_memory_rust_spark.sources.tables import testdata_path

    path = testdata_path(sf_dir, "events")
    a = ingest.run_interval_join_once(spark, path, name="__t_ssj_rerun").count()
    b = ingest.run_interval_join_once(spark, path, name="__t_ssj_rerun").count()
    assert a == b


def test_stream_shuffle_partitions_scoped(spark):
    from penr_oz_agent_memory_rust_spark.streaming.ingest import _stream_shuffle_partitions

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    with _stream_shuffle_partitions(spark, 8):
        assert spark.conf.get(key) == "8"
    assert spark.conf.get(key) == before
    with _stream_shuffle_partitions(spark, None):
        assert spark.conf.get(key) == before
    assert spark.conf.get(key) == before


def test_interval_join_outer_null_rows_respect_watermark(spark, tmp_path):
    """leftOuter stream-stream join: an unmatched purchase emits its NULL
    row only once the final global watermark (min over both sides of
    max_ts - delay) has passed it; younger unmatched purchases stay
    withheld — the exact cutoff the gate's oracle reproduces."""
    from datetime import datetime

    from penr_oz_agent_memory_rust_spark.streaming import ingest

    src = str(tmp_path / "outer_ev")
    t = lambda h, m=0: datetime(2024, 1, 1, h, m)  # noqa: E731
    rows = [
        (100, t(0, 10), 1, "view"),     # matches p1
        (101, t(0, 30), 1, "purchase"), # matched
        (102, t(0, 0), 2, "purchase"),  # unmatched, old -> NULL row
        (103, t(5, 0), 3, "purchase"),  # unmatched, young -> withheld
        (104, t(6, 0), 9, "view"),      # advances the view-side watermark
    ]
    # final watermark = min(maxP(5:00) - 1h, maxV(6:00) - 2h) = 4:00
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    ).write.parquet(src)
    out = {
        (r["p_id"], r["v_id"])
        for r in ingest.run_interval_join_once(
            spark, src, shuffle_partitions=4, how="leftOuter",
            name="__t_ssj_outer"
        ).collect()
    }
    assert out == {(101, 100), (102, None)}


def test_ttl_dedup_reemits_key_after_state_eviction(spark, tmp_path):
    """dropDuplicatesWithinWatermark is TTL dedup, not global dedup: once
    the watermark passes a key's state expiry, the state is evicted and a
    later duplicate of the SAME key is emitted again. Spark evicts at the
    END of a batch (the in-batch dedup check still sees the stale entry),
    so the re-emission lands one batch after the watermark passes: batch 2
    (A @4:00, watermark 2:50 > expiry 0:10) is still absorbed, batch 3
    (A @5:00) re-emits. Plain dropDuplicates would emit A once; the
    watermark variant emits it twice with bounded state."""
    from datetime import datetime

    from penr_oz_agent_memory_rust_spark.streaming import ingest

    schema = "user_id bigint, event_type string, ts timestamp"
    src = str(tmp_path / "ttl_ev")
    t = lambda h: datetime(2024, 1, 1, h)  # noqa: E731
    import time as _time

    for batch in (
        [(1, "click", t(0))],          # seeds A (state expiry 0:10)
        [(9, "other", t(3))],          # watermark -> 2:50, past A's expiry
        [(1, "click", t(4))],          # absorbed: eviction is end-of-batch
        [(1, "click", t(5))],          # state gone now -> re-emitted
    ):
        spark.createDataFrame(batch, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _time.sleep(1.1)  # distinct mtimes: the file source orders batches
        # by modification time, and same-second writes would make the
        # 1-file-per-trigger sequence (and thus watermark advance) racy
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = ingest.dedup_stream(
        stream, ["user_id", "event_type"], watermark_col="ts", delay="10 minutes"
    ).select("user_id", "event_type")
    q = (
        out.writeStream.format("memory")
        .queryName("__t_ttl_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    rows = [tuple(r) for r in spark.table("__t_ttl_dedup").collect()]
    assert sorted(rows) == [(1, "click"), (1, "click"), (9, "other")]


def test_embedding_drift_stream_matches_batch(spark, tmp_path):
    """Drift over a 2-window stream: window 0 drawn near the baseline,
    window 1 shifted by +delta in every dim — streamed final state must
    equal the hand-computed batch drift, and the shifted window must score
    ~64 * delta^2 higher."""
    import numpy as np

    from pyspark.sql import functions as F

    from penr_oz_agent_memory_rust_spark.streaming.ingest import (
        run_embedding_drift_once,
    )

    d, per_win, delta = 8, 30, 0.5
    rng = np.random.default_rng(7)
    base_vecs = rng.normal(0.0, 0.1, size=(per_win, d))
    shift_vecs = rng.normal(0.0, 0.1, size=(per_win, d)) + delta
    rows = []
    t0 = 1767225600
    for i, v in enumerate(base_vecs):
        rows.append((i, t0 + i, [float(x) for x in v]))
    for i, v in enumerate(shift_vecs):
        rows.append((per_win + i, t0 + 300 + i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, epoch long, embedding array<float>")
    src = str(tmp_path / "emb_stream")
    df.select(
        F.timestamp_seconds("epoch").alias("ts"), "embedding"
    ).write.parquet(src)

    # baseline fit on the FIRST window only (the "historical reference"
    # shape): the un-shifted window then scores ~0 and the shifted one
    # ~d * delta^2
    mus = np.round(base_vecs.astype(np.float32).astype(np.float64).mean(axis=0), 6)
    baseline = spark.createDataFrame(
        [(i, float(m)) for i, m in enumerate(mus)], "dim int, mu double"
    )
    got = {
        r["ws"]: r
        for r in run_embedding_drift_once(
            spark, src, baseline, window_secs=300, name="__t_drift"
        ).collect()
    }
    assert set(got) == {t0, t0 + 300}
    for ws, vecs in [(t0, base_vecs), (t0 + 300, shift_vecs)]:
        wmean = np.round(vecs.astype(np.float32).astype(np.float64).mean(axis=0), 6)
        want = round(float(((wmean - mus) ** 2).sum()), 6)
        assert got[ws]["n_rows"] == per_win
        assert got[ws]["drift"] == pytest.approx(want, abs=2e-6)
    assert got[t0]["drift"] < 0.1
    assert got[t0 + 300]["drift"] > 0.5 * d * delta**2


def test_cdc_chunk_dedup_stream_first_write_wins(spark, tmp_path):
    """Two micro-batches; batch-2 chunks whose fingerprints batch 1
    already stored must not append again."""
    from penr_oz_agent_memory_rust_spark.streaming.ingest import (
        run_cdc_chunk_dedup_once,
    )

    incoming = str(tmp_path / "in")
    store = str(tmp_path / "store")
    text = "the quick brown fox jumps over the lazy dog " * 8
    b1 = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    b1.coalesce(1).write.mode("append").parquet(incoming)
    assert run_cdc_chunk_dedup_once(spark, incoming, store, gram=4, modulus=8) >= 1
    n1 = spark.read.parquet(store + "/chunks").count()
    assert n1 > 0

    # batch 2: one identical doc (all chunks dup) + one new doc
    b2 = spark.createDataFrame(
        [(2, text), (3, "completely different words entirely novel content here")],
        "doc_id bigint, text string",
    )
    b2.coalesce(1).write.mode("append").parquet(incoming)
    run_cdc_chunk_dedup_once(spark, incoming, store, gram=4, modulus=8)
    stored = spark.read.parquet(store + "/chunks")
    # doc 2 contributes nothing (identical text -> identical fps)
    assert stored.filter("doc_id = 2").count() == 0
    assert stored.filter("doc_id = 3").count() > 0
    # re-running with nothing new appends nothing (checkpoint)
    total = stored.count()
    run_cdc_chunk_dedup_once(spark, incoming, store, gram=4, modulus=8)
    assert spark.read.parquet(store + "/chunks").count() == total


def test_cms_stream_partials_sum_to_batch_sketch(spark, tmp_path):
    """The streamed sketch (append-only per-batch partials, summed at read)
    must equal the batch counter table over the union — CMS linearity plus
    exactly-once micro-batches. A re-run against the same checkpoint must
    be a no-op (no double counting)."""
    from pyspark.sql import functions as F

    from penr_oz_agent_memory_rust_spark.operators import sketches
    from penr_oz_agent_memory_rust_spark.streaming.ingest import (
        read_cms_sketch,
        run_cms_ingest_once,
    )

    incoming = str(tmp_path / "incoming")
    sketch = str(tmp_path / "sketch")
    a = spark.createDataFrame([(i, f"k{i % 7}") for i in range(50)], "id bigint, w string")
    b = spark.createDataFrame([(i, f"k{i % 5}") for i in range(30)], "id bigint, w string")
    a.coalesce(1).write.mode("append").parquet(incoming)
    assert run_cms_ingest_once(spark, incoming, sketch, "w", width=16, depth=3) == 1
    b.coalesce(1).write.mode("append").parquet(incoming)
    assert run_cms_ingest_once(spark, incoming, sketch, "w", width=16, depth=3) == 1
    # no new files -> no new batches, sketch unchanged
    assert run_cms_ingest_once(spark, incoming, sketch, "w", width=16, depth=3) == 0

    streamed = {
        (r["d"], r["bucket"]): r["c"] for r in read_cms_sketch(spark, sketch).collect()
    }
    batch = {
        (r["d"], r["bucket"]): r["c"]
        for r in sketches.cms_counter_table(a.union(b), "w", width=16, depth=3).collect()
    }
    assert streamed == batch
    # estimates over the streamed sketch upper-bound the true counts
    cands = a.union(b).select("w").distinct()
    est = {
        r["w"]: r["est"]
        for r in sketches.cms_estimate(
            cands, read_cms_sketch(spark, sketch), "w", width=16, depth=3
        ).collect()
    }
    truth = {r["w"]: r["cnt"] for r in a.union(b).groupBy("w").agg(
        F.count("*").alias("cnt")).collect()}
    assert all(est[w] >= c for w, c in truth.items())
