"""BPE tokenizer: classic merge semantics, piece partitioning,
compression monotonicity, determinism."""

from __future__ import annotations

from penr_oz_agent_memory_rust_spark.operators import bpe
from penr_oz_agent_memory_rust_spark.sources.tables import load_table


def test_merge_learning_classic_example():
    """The Sennrich toy corpus: 'es' (9+3+1? no — est-dominant) — assert
    the first merges come from the dominant 'est</w>' suffix family and
    the loop is deterministic."""
    hist = [("lowest", 8), ("newest", 6), ("low", 5), ("new", 2)]
    merges = bpe.train_bpe(hist, n_merges=6)
    assert merges == bpe.train_bpe(hist, n_merges=6)
    # 'es' then 'est' then 'est</w>' dominate (14 occurrences each)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", bpe.END)


def test_encode_pieces_partition_word():
    hist = [("hello", 10), ("help", 5), ("yellow", 3)]
    merges = bpe.train_bpe(hist, n_merges=20)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["hello", "help", "yellow", "unseenword"]:
        pieces = bpe._encode_word(w, ranks)
        assert "".join(pieces) == w + bpe.END, (w, pieces)


def test_distributed_encode_and_compression(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    hist = bpe.word_histogram(docs, max_words=5000)
    assert hist == bpe.word_histogram(docs, max_words=5000)
    m50 = bpe.train_bpe(hist, n_merges=50)
    m300 = bpe.train_bpe(hist, n_merges=300)
    assert m300[:50] == m50, "merge lists must be prefixes of each other"
    e50 = {r["doc_id"]: r["n_pieces"] for r in bpe.bpe_encode(docs, m50).collect()}
    e300 = {r["doc_id"]: r["n_pieces"] for r in bpe.bpe_encode(docs, m300).collect()}
    assert set(e50) == set(e300)
    assert all(e300[d] <= e50[d] for d in e50), "more merges can never add pieces"
    assert sum(e300.values()) < sum(e50.values()), "300 merges should compress more"


def test_encode_counts_consistent(spark):
    docs = spark.createDataFrame(
        [(1, "aa aa bb"), (2, ""), (3, None)], "doc_id bigint, text string"
    )
    merges = bpe.train_bpe([("aa", 5), ("bb", 2)], n_merges=10)
    out = {r["doc_id"]: (r["n_words"], r["n_pieces"]) for r in bpe.bpe_encode(docs, merges).collect()}
    assert out[2] == (0, 0) and out[3] == (0, 0)
    nw, np_ = out[1]
    assert nw == 3 and np_ >= 3
