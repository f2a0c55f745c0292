"""Byte-pair-encoding tokenizer: distributed word histogram -> driver-side
merge learning -> distributed Arrow encode (★ beyond-reference pipeline op).

This is the shape real pipelines use at 100 TB: the tokenizer TRAINS on a
word-frequency histogram (a bounded aggregate — Sennrich-style BPE never
needs raw text, only (word, count) pairs), and APPLIES distributed. The
histogram is the only thing collected, capped at `vocab_words` rows; the
merge loop is O(vocab x merges) driver CPU, independent of corpus size;
encoding broadcasts the merge table and runs per Arrow batch with a
word -> pieces memo (Zipf makes the memo hit rate ~ corpus token count /
distinct words).

Oracle-checked since r7: both loops replay in DuckDB as recursive CTEs
(the trainer's per-iteration argmax as aggregation over the recursive
reference, the encoder's ranked merging as per-word list-state steps —
see _bpe_sql in __spark_entry__.py); determinism, piece-partition and
compression invariants additionally pinned in tests/test_bpe.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

END = "</w>"  # end-of-word marker, keeps merges from crossing word ends


def word_histogram(
    docs: DataFrame, text_col: str = "text", max_words: int = 20_000
) -> list[tuple[str, int]]:
    """(word, count) for the `max_words` most frequent lowercased
    whitespace words — the bounded training input. One explode + hash-agg
    + top-k heap; only the histogram rows reach the driver."""
    return [
        (r["w"], r["c"])
        for r in (
            docs.select(F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w"))
            .filter(F.col("w") != "")
            .groupBy("w")
            .agg(F.count("*").alias("c"))
            .orderBy(F.desc("c"), F.asc("w"))
            .limit(max_words)
            .collect()
        )
    ]


def train_bpe(histogram: list[tuple[str, int]], n_merges: int = 200) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a word histogram (Sennrich 2016
    semantics): repeatedly merge the most frequent adjacent symbol pair,
    ties broken lexicographically for determinism. Returns the ordered
    merge list — the entire model."""
    words: list[tuple[list[str], int]] = [
        (list(w) + [END], c) for w, c in histogram if w
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        # deterministic: max count, ties to the lexically smallest pair
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((a, b))
        ab = a + b
        for syms, _ in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [ab]
                else:
                    i += 1
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    with_pieces: bool = False,
) -> DataFrame:
    """Apply learned merges: (id, n_words, n_pieces[, pieces]). Greedy
    lowest-rank-first merging per word — exactly the huggingface/GPT-2
    apply order. The merge table broadcasts; encoding is one Arrow pass
    with a per-batch word memo."""
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast({p: i for i, p in enumerate(merges)})
    id_type = dict(docs.dtypes)[id_col]
    schema = f"{id_col} {id_type}, n_words bigint, n_pieces bigint" + (
        ", pieces array<string>" if with_pieces else ""
    )

    def encode_batches(batches):
        ranks = bc.value
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            ids, nw, np_, pieces_col = [], [], [], []
            for i, txt in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in (txt or "").lower().split() if w]
                pieces: list[str] = []
                for w in words:
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = _encode_word(w, ranks)
                    pieces.extend(got)
                ids.append(i)
                nw.append(len(words))
                np_.append(len(pieces))
                if with_pieces:
                    pieces_col.append(pieces)
            out = {id_col: ids, "n_words": nw, "n_pieces": np_}
            if with_pieces:
                out["pieces"] = pieces_col
            yield pd.DataFrame(out)

    return docs.select(id_col, text_col).mapInPandas(encode_batches, schema=schema)
