"""Training-shard export: exact fixed-size shards, salt-deterministic
order, bucketed global rank == naive global window, round-trip."""

from __future__ import annotations

import glob

from pyspark.sql import Window, functions as F

from penr_oz_agent_memory_rust_spark.operators import export
from penr_oz_agent_memory_rust_spark.sources.tables import load_table


def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def test_bucketed_rank_matches_global_window(spark, sf_dir):
    """The distributed (bucket-offset) rank must equal the naive
    single-partition global row_number — for every row."""
    keyed = export.deterministic_shuffle_key(docs(spark, sf_dir), "doc_id", salt="s1")
    fast = export.exact_global_rank(keyed, export.SHUFFLE_KEY, "doc_id", rank_col="r")
    w = Window.orderBy(export.SHUFFLE_KEY, "doc_id")
    naive = keyed.withColumn("r", F.row_number().over(w) - 1)
    a = {r["doc_id"]: r["r"] for r in fast.collect()}
    b = {r["doc_id"]: r["r"] for r in naive.collect()}
    assert a == b


def test_bucket_chars_invariance(spark, sf_dir):
    """Rank is a property of the order, not the bucketing fan-out."""
    keyed = export.deterministic_shuffle_key(docs(spark, sf_dir), "doc_id", salt="x")
    r1 = {
        r["doc_id"]: r["r"]
        for r in export.exact_global_rank(
            keyed, export.SHUFFLE_KEY, "doc_id", rank_col="r", bucket_chars=1
        ).collect()
    }
    r3 = {
        r["doc_id"]: r["r"]
        for r in export.exact_global_rank(
            keyed, export.SHUFFLE_KEY, "doc_id", rank_col="r", bucket_chars=3
        ).collect()
    }
    assert r1 == r3


def test_derive_bucket_chars_decision_rule():
    # <= 16M rows at the 1M default target -> 1 char; each 16x step adds one
    assert export.derive_bucket_chars(0) == 1
    assert export.derive_bucket_chars(16_000_000) == 1
    assert export.derive_bucket_chars(16_000_001) == 2
    assert export.derive_bucket_chars(256_000_001) == 3
    assert export.derive_bucket_chars(10**11) == 4  # capped at MAX_BUCKET_CHARS
    assert export.derive_bucket_chars(5_000, target_bucket_rows=100) == 2
    assert export.derive_bucket_chars(10**11, max_chars=6) == 5


def test_adaptive_bucket_chars_matches_explicit(spark, sf_dir):
    """Default (derived) width must yield byte-identical ranks and shard
    assignments to an explicit override — bucketing is implementation."""
    d = docs(spark, sf_dir)
    keyed = export.deterministic_shuffle_key(d, "doc_id", salt="ad")
    auto = {
        r["doc_id"]: r["r"]
        for r in export.exact_global_rank(
            keyed, export.SHUFFLE_KEY, "doc_id", rank_col="r"
        ).collect()
    }
    fixed = {
        r["doc_id"]: r["r"]
        for r in export.exact_global_rank(
            keyed, export.SHUFFLE_KEY, "doc_id", rank_col="r", bucket_chars=2
        ).collect()
    }
    assert auto == fixed
    by_bytes_auto = {
        (r["doc_id"], r["shard"], r["pos_in_shard"])
        for r in export.assign_shards_by_bytes(
            d, "doc_id", 4096, F.length("text"), salt="ad"
        ).collect()
    }
    by_bytes_fixed = {
        (r["doc_id"], r["shard"], r["pos_in_shard"])
        for r in export.assign_shards_by_bytes(
            d, "doc_id", 4096, F.length("text"), salt="ad", bucket_chars=3
        ).collect()
    }
    assert by_bytes_auto == by_bytes_fixed


def test_shard_checksums_detect_corruption_and_reorder(spark, sf_dir):
    d = docs(spark, sf_dir).limit(200)
    sharded = export.assign_shards(d, "doc_id", rows_per_shard=64, salt="ck").persist()
    base = {
        r["shard"]: r for r in export.shard_checksums(sharded, F.col("text")).collect()
    }
    assert sum(r["n_rows"] for r in base.values()) == 200
    # recompute on the same data -> identical manifest (deterministic)
    again = {
        r["shard"]: r for r in export.shard_checksums(sharded, F.col("text")).collect()
    }
    assert {s: r["checksum"] for s, r in base.items()} == {
        s: r["checksum"] for s, r in again.items()
    }
    # single-row payload corruption flips that shard's checksum only
    corrupt = sharded.withColumn(
        "text",
        F.when(
            (F.col("shard") == 0) & (F.col("pos_in_shard") == 3),
            F.concat(F.col("text"), F.lit("X")),
        ).otherwise(F.col("text")),
    )
    after = {
        r["shard"]: r for r in export.shard_checksums(corrupt, F.col("text")).collect()
    }
    assert after[0]["checksum"] != base[0]["checksum"]
    for s in base:
        if s != 0:
            assert after[s]["checksum"] == base[s]["checksum"]
    # swapping two rows' positions (same payload multiset) flips it too:
    # the position is bound into each row hash
    swapped = sharded.withColumn(
        "pos_in_shard",
        F.when((F.col("shard") == 0) & (F.col("pos_in_shard") == 1), F.lit(2))
        .when((F.col("shard") == 0) & (F.col("pos_in_shard") == 2), F.lit(1))
        .otherwise(F.col("pos_in_shard")),
    )
    sw = {
        r["shard"]: r for r in export.shard_checksums(swapped, F.col("text")).collect()
    }
    assert sw[0]["checksum"] != base[0]["checksum"]
    sharded.unpersist()


def test_shard_sizes_exact(spark, sf_dir):
    d = docs(spark, sf_dir)
    n = d.count()
    sharded = export.assign_shards(d, "doc_id", rows_per_shard=64, salt="v")
    sizes = {r["shard"]: r["count"] for r in sharded.groupBy("shard").count().collect()}
    n_shards = (n + 63) // 64
    assert set(sizes) == set(range(n_shards))
    for s in range(n_shards - 1):
        assert sizes[s] == 64
    assert sizes[n_shards - 1] == n - 64 * (n_shards - 1)
    # every doc exactly once
    assert sharded.select("doc_id").distinct().count() == n
    # positions within a shard are 0..size-1
    pos_ok = (
        sharded.groupBy("shard")
        .agg(F.min("pos_in_shard").alias("lo"), F.max("pos_in_shard").alias("hi"), F.count("*").alias("n"))
        .filter((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1))
        .count()
    )
    assert pos_ok == 0


def test_salt_determinism_and_independence(spark, sf_dir):
    d = docs(spark, sf_dir)
    a1 = {
        (r["doc_id"]): (r["shard"], r["pos_in_shard"])
        for r in export.assign_shards(d, "doc_id", 32, salt="alpha").collect()
    }
    a2 = {
        (r["doc_id"]): (r["shard"], r["pos_in_shard"])
        for r in export.assign_shards(d, "doc_id", 32, salt="alpha").collect()
    }
    b = {
        (r["doc_id"]): (r["shard"], r["pos_in_shard"])
        for r in export.assign_shards(d, "doc_id", 32, salt="beta").collect()
    }
    assert a1 == a2, "same salt must reproduce the exact assignment"
    moved = sum(1 for k in a1 if a1[k] != b[k])
    assert moved > len(a1) * 0.9, "different salt should permute nearly everything"


def test_write_round_trip(spark, sf_dir, tmp_path):
    d = docs(spark, sf_dir)
    n = d.count()
    out = str(tmp_path / "shards")
    n_shards = export.write_training_shards(d, out, "doc_id", rows_per_shard=100, salt="rt")
    assert n_shards == (n + 99) // 100
    back = spark.read.parquet(out)
    assert back.count() == n
    assert back.select("doc_id").distinct().count() == n
    # one data file per shard directory (the repartition-by-shard contract)
    for s in range(n_shards):
        files = glob.glob(f"{out}/shard={s}/*.parquet")
        assert len(files) == 1, f"shard {s} has {len(files)} files"
    # reloaded assignment identical to a fresh one
    fresh = {
        r["doc_id"]: (r["shard"], r["pos_in_shard"])
        for r in export.assign_shards(d, "doc_id", 100, salt="rt").collect()
    }
    loaded = {
        r["doc_id"]: (r["shard"], r["pos_in_shard"]) for r in back.collect()
    }
    assert fresh == loaded


def test_write_empty_input_zero_shards(spark, tmp_path):
    d = spark.createDataFrame([], "doc_id bigint, text string")
    out = str(tmp_path / "empty_shards")
    assert export.write_training_shards(d, out, "doc_id", rows_per_shard=10) == 0


def test_jsonl_shards_roundtrip(spark, tmp_path):
    """fmt='json' writes loader-ready JSONL shards with the same exact
    sharding contract as parquet: shard directories of rows_per_shard
    rows, loader order via pos_in_shard, identical id assignment."""
    import os

    from penr_oz_agent_memory_rust_spark.operators import export

    df = spark.range(100).select(F.col("id").alias("doc_id"),
                                 F.concat(F.lit("t"), F.col("id")).alias("text"))
    pq_path, js_path = str(tmp_path / "pq"), str(tmp_path / "js")
    n_pq = export.write_training_shards(df, pq_path, "doc_id", 16)
    n_js = export.write_training_shards(df, js_path, "doc_id", 16, fmt="json")
    assert n_js == n_pq == 7
    back = spark.read.json(os.path.join(js_path, "shard=0"))
    assert back.count() == 16
    pq_rows = {
        (r["shard"], r["pos_in_shard"], r["doc_id"])
        for r in spark.read.parquet(pq_path).collect()
    }
    js_rows = {
        (r["shard"], r["pos_in_shard"], r["doc_id"])
        for r in spark.read.format("json").option("basePath", js_path).load(js_path).collect()
    }
    assert js_rows == pq_rows


def test_webdataset_shards_deterministic_and_ordered(spark, tmp_path):
    from penr_oz_agent_memory_rust_spark.operators import export

    docs = spark.createDataFrame(
        [(i, f"text {i}", i * 10) for i in range(10)],
        "doc_id bigint, text string, n bigint",
    )
    p1, p2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    m1 = {r["shard"]: r.asDict() for r in
          export.write_webdataset_shards(docs, p1, "doc_id", 4, salt="s").collect()}
    m2 = {r["shard"]: r.asDict() for r in
          export.write_webdataset_shards(docs, p2, "doc_id", 4, salt="s").collect()}
    # 10 rows / 4 per shard -> shards 0,1 full + shard 2 short
    assert sorted(m1) == [0, 1, 2]
    assert [m1[s]["n_rows"] for s in (0, 1, 2)] == [4, 4, 2]
    # same corpus + salt => byte-identical tars (canonicalized metadata)
    assert {s: m["md5"] for s, m in m1.items()} == {s: m["md5"] for s, m in m2.items()}

    import tarfile

    with tarfile.open(f"{p1}/shard-000000.tar") as tar:
        names = [i.name for i in tar]
        infos = list(tar)
    # members arrive in sample order (pos-prefixed keys non-decreasing,
    # both members of a sample consecutive, .txt first)
    keys = [n.rsplit(".", 1)[0] for n in names]
    assert keys == sorted(keys) and keys[0::2] == keys[1::2]
    assert [n.split(".")[-1] for n in names] == ["txt", "json"] * 4
    assert all(i.mtime == 0 and i.uid == 0 and i.uname == "" for i in infos)


def test_webdataset_roundtrip_values(spark, tmp_path):
    from penr_oz_agent_memory_rust_spark.operators import export

    docs = spark.createDataFrame(
        [(i, f"doc body {i}", i % 3) for i in range(9)],
        "doc_id bigint, text string, grp bigint",
    )
    p = str(tmp_path / "wds")
    export.write_webdataset_shards(docs, p, "doc_id", 3, salt="x").collect()
    members = export.read_webdataset_shards(spark, p)
    txt = {r["key"].split("_")[1]: r["data"].decode() for r in
           members.filter(F.col("ext") == "txt").collect()}
    assert txt == {str(i): f"doc body {i}" for i in range(9)}
    import json

    meta = {r["key"].split("_")[1]: json.loads(r["data"]) for r in
            members.filter(F.col("ext") == "json").collect()}
    assert meta["4"] == {"doc_id": 4, "grp": 1}


def test_webdataset_byte_budgeted_shards(spark, tmp_path):
    """bytes_per_shard sizing: variable-length docs (1 char .. ~12 KB)
    still produce shards whose tar payload stays within one max-sample of
    the budget — the spread row-counted shards can't guarantee."""
    from penr_oz_agent_memory_rust_spark.operators import export

    docs = spark.createDataFrame(
        [(i, "x" * ((i * 97) % 12000 + 1), i % 5) for i in range(120)],
        "doc_id bigint, text string, grp bigint",
    )
    p = str(tmp_path / "wdsb")
    budget = 64 * 1024
    manifest = export.write_webdataset_shards(
        docs, p, "doc_id", salt="b", bytes_per_shard=budget
    ).collect()
    assert len(manifest) >= 3
    # max sample cost: 2 headers + padded payloads (<= 12000 -> 12288) +
    # json block; plus per-archive overhead (EOF blocks + record padding)
    max_sample = 512 + 12288 + 512 + 512
    archive_overhead = 2 * 512 + 10240  # tar EOF + RECORDSIZE padding
    by_shard = {r["shard"]: r["n_bytes"] for r in manifest}
    last = max(by_shard)
    for s, n in by_shard.items():
        assert n <= budget + max_sample + archive_overhead, (s, n)
        if s != last:
            assert n >= budget - max_sample, (s, n)
    # roundtrip integrity is format-independent of the sizing mode
    members = export.read_webdataset_shards(spark, p)
    txt = {
        r["key"].split("_")[1]
        for r in members.filter(F.col("ext") == "txt").collect()
    }
    assert txt == {str(i) for i in range(120)}


def test_webdataset_requires_exactly_one_sizing_mode(spark, tmp_path):
    import pytest

    from penr_oz_agent_memory_rust_spark.operators import export

    docs = spark.createDataFrame([(1, "t")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="exactly one"):
        export.write_webdataset_shards(docs, str(tmp_path / "a"), "doc_id")
    with pytest.raises(ValueError, match="exactly one"):
        export.write_webdataset_shards(
            docs, str(tmp_path / "b"), "doc_id", 4, bytes_per_shard=100
        )


def test_assign_shards_by_bytes_contiguous_and_deterministic(spark):
    from pyspark.sql import functions as F2

    from penr_oz_agent_memory_rust_spark.operators import export

    df = spark.createDataFrame(
        [(i, (i * 37) % 900 + 100) for i in range(200)], "id bigint, nb bigint"
    )
    out = export.assign_shards_by_bytes(
        df, "id", 4096, F2.col("nb"), salt="z"
    ).collect()
    # per-shard sum of costs stays within budget + max cost
    agg = {}
    for r in out:
        agg.setdefault(r["shard"], 0)
        agg[r["shard"]] += r["nb"]
    last = max(agg)
    for s, tot in agg.items():
        assert tot <= 4096 + 999, (s, tot)
        if s != last:
            assert tot >= 4096 - 999, (s, tot)
    # pos_in_shard = byte offset within shard: unique, < budget + max
    for s in agg:
        poss = sorted(r["pos_in_shard"] for r in out if r["shard"] == s)
        assert len(poss) == len(set(poss))
        assert all(p < 4096 for p in poss)
    # determinism across invocations
    out2 = export.assign_shards_by_bytes(
        df, "id", 4096, F2.col("nb"), salt="z"
    ).collect()
    assert sorted(map(str, out)) == sorted(map(str, out2))


def test_shard_checksums_match_pure_python(spark):
    """Independent pin (r9 verdict ask #6): the shard_checksums oracle
    replays the engine's md5-sum arithmetic in SQL, so a shared bug would
    pass the gate green. This pin computes the expected manifest from
    scratch with hashlib — a third implementation outside both engines."""
    import hashlib

    rows = [(0, 0, "alpha"), (0, 1, "beta"), (1, 0, "gamma"), (1, 1, "δμ")]
    df = spark.createDataFrame(rows, "shard int, pos_in_shard bigint, payload string")
    got = {r["shard"]: r for r in export.shard_checksums(df, F.col("payload")).collect()}

    def h(pos, payload):
        return int(hashlib.md5(f"{pos}|{payload}".encode()).hexdigest()[:15], 16)

    for shard in (0, 1):
        members = [(p, pl) for s, p, pl in rows if s == shard]
        total = sum(h(p, pl) for p, pl in members) % (1 << 64)
        if total >= 1 << 63:
            total -= 1 << 64
        assert got[shard]["checksum"] == total
        assert got[shard]["n_rows"] == len(members)
        assert got[shard]["n_bytes"] == sum(len(pl.encode()) for _, pl in members)
