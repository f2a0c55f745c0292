"""Preference-pair construction for DPO/RLHF-style training data
(★ north-star pipeline operator).

Given scored documents and a grouping (topic cluster, prompt family,
source), emit one (chosen, rejected) pair per group: the best-scored
member against the worst-scored one, kept only when the score gap clears
a margin (near-tie pairs teach nothing and add label noise). This is the
relational core of preference-data pipelines — the scorer itself is
pluggable (quality heuristic here; the logreg/centroid classifier or an
external reward model in production).

Scale shape: ONE hash aggregate on the group key — the argmax/argmin are
min_by over (±score, id) tiebreak structs, so there is no window, no
per-group sort, and ties resolve deterministically to the smallest id
(engine-portable, hence oracle-checkable). The documents' text never
moves: only (group, id, score) triples shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def preference_pairs(
    df: DataFrame,
    group_col: str,
    id_col: str,
    score_col: str,
    min_margin: float = 0.0,
) -> DataFrame:
    """(group, chosen_id, rejected_id, chosen_score, rejected_score, gap),
    one row per group whose best-vs-worst gap >= min_margin. Groups with a
    single member (chosen == rejected) are dropped — no self-pairs."""
    s = F.col(score_col)
    chosen_key = F.struct((-s).alias("__ns"), F.col(id_col).alias("__id"))
    rejected_key = F.struct(s.alias("__s"), F.col(id_col).alias("__id"))
    agg = df.groupBy(group_col).agg(
        F.min_by(F.col(id_col), chosen_key).alias("chosen_id"),
        F.max(s).alias("chosen_score"),
        F.min_by(F.col(id_col), rejected_key).alias("rejected_id"),
        F.min(s).alias("rejected_score"),
    )
    return agg.filter(
        (F.col("chosen_id") != F.col("rejected_id"))
        & (F.col("chosen_score") - F.col("rejected_score") >= F.lit(min_margin))
    ).select(
        group_col,
        "chosen_id",
        "rejected_id",
        "chosen_score",
        "rejected_score",
        F.round(F.col("chosen_score") - F.col("rejected_score"), 6).alias("gap"),
    )
