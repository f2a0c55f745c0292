"""Maximal Marginal Relevance re-ranking (Carbonell & Goldstein, SIGIR
1998): greedy selection balancing query relevance against redundancy
with what's already picked —

    next = argmax_c  lam * sim(q, c) - (1 - lam) * max_{s in S} sim(c, s)

The iterative argmax is inherently sequential, so this is a DRIVER-SIDE
op over a BOUNDED candidate set — the standard two-stage serving shape:
a distributed retriever (knn / lsh_ann / ivfpq_ann) narrows a 100 TB
corpus to k' rows, MMR diversifies the k' on the driver. The collect is
guarded (max_candidates) exactly like knn.py's 200k-row guard; this
operator is never the corpus scan.

No counterpart in the reference (plain top-k only, src/memory.rs:154-198);
north-star ★ serving-side component.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

MAX_CANDIDATES = 10_000


def mmr_select(
    candidates: DataFrame,
    query_vec: list[float],
    k: int = 10,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_candidates: int = MAX_CANDIDATES,
) -> DataFrame:
    """Greedy-MMR pick k of the candidate rows; returns (rank, id,
    mmr_score) ordered by selection. Deterministic: ties break by id.
    Raises if the candidate set exceeds max_candidates — pass the output
    of a top-k' retriever, not a corpus."""
    n = candidates.count()
    if n > max_candidates:
        raise ValueError(
            f"{n} candidates exceed max_candidates={max_candidates}; "
            "MMR is a driver-side re-rank — narrow with a distributed "
            "retriever (top_k / lsh_knn_join / search_ivfpq_index) first"
        )
    rows = candidates.select(id_col, vec_col).collect()
    if not rows:
        return candidates.sparkSession.createDataFrame(
            [], f"rank int, {id_col} bigint, mmr_score double"
        )
    ids = [r[0] for r in rows]
    X = np.asarray([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(X, axis=1)
    norms[norms == 0] = 1.0
    U = X / norms[:, None]
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    q = q / qn if qn > 0 else q
    rel = U @ q
    # order candidates by (relevance desc, id asc) so ties are stable
    order = sorted(range(len(ids)), key=lambda i: (-rel[i], ids[i]))
    remaining = list(order)
    picked: list[int] = []
    out = []
    # redundancy clamped at 0: anti-similar candidates count as merely
    # non-redundant, not as bonus diversity (the common practical variant
    # — otherwise lam<0.5 actively promotes anti-relevant content)
    max_red = np.zeros(len(ids))
    for rank in range(min(k, len(ids))):
        best_i, best_s = None, -np.inf
        for i in remaining:
            s = lam * rel[i] - (1.0 - lam) * (max_red[i] if picked else 0.0)
            if s > best_s or (s == best_s and best_i is not None and ids[i] < ids[best_i]):
                best_i, best_s = i, s
        picked.append(best_i)
        remaining.remove(best_i)
        out.append((rank + 1, int(ids[best_i]), round(float(best_s), 6)))
        # one vectorized update of every candidate's redundancy bound
        sims = U @ U[best_i]
        max_red = np.maximum(max_red, sims)
    return candidates.sparkSession.createDataFrame(
        out, f"rank int, {id_col} bigint, mmr_score double"
    )
