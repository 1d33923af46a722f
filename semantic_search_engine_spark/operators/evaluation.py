"""The reference's tolerance-scored evaluation metric, re-derived.

The reference grades served top-k lists with a penalty score
(/root/reference/src/evaluation.py:41-61): 0 is perfect; a result list
with the wrong length or duplicates scores −n·k; otherwise each
retrieved id whose position in the FULL exact ranking exceeds 3·k
subtracts that position, and an id absent from the ranking subtracts n.
Its published "recall score 0 (perfect)" rows are this metric — so
reporting it next to strict recall@k (BENCH/ANN_LADDER.md,
BENCH/RECALL.md) is what makes the two engines' quality columns
directly comparable.

``reference_score`` is the scorer itself (pure function).
``exact_ranks`` computes the exact global rank of each retrieved id in
ONE Spark job — a full argsort of 20M rows per query (the reference's
in-RAM ``np.argsort``) would be nq× full-sort work, but the scorer only
ever needs the ranks of the nq·k RETRIEVED ids, and a rank is just a
count: rank(t) = #{rows beating t under (cos desc, id asc)}. Each Arrow
batch emits its partial counts for every (query, target) pair and the
driver sums them — O(scan) work, O(nq·k) result, no sort anywhere.
"""

from __future__ import annotations

from typing import Iterator, Mapping, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def reference_score(
    retrieved: Sequence[int], exact_rank: Mapping[int, int], k: int, n: int
) -> float:
    """Tolerance score of one served top-k list (0 = perfect).

    ``exact_rank`` maps id → 0-based position in the full exact
    ranking; ids absent from the mapping are treated as absent from the
    ranking (−n each, the reference's missing-id branch). Mirrors
    /root/reference/src/evaluation.py:41-61 exactly:
      * wrong length or duplicates → −n·k
      * rank ≤ 3k → no penalty; rank > 3k → −rank; missing → −n
    """
    ids = list(retrieved)
    if len(ids) != k or len(set(ids)) != k:
        return float(-n * k)
    score = 0.0
    for vid in ids:
        ind = exact_rank.get(int(vid))
        if ind is None:
            score -= n
        elif ind > 3 * k:
            score -= ind
    return score


def exact_ranks(
    emb: DataFrame,
    queries: Sequence[Sequence[float]],
    targets_per_q: Mapping[int, Sequence[int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tie_eps: float = 1e-12,
) -> dict[int, dict[int, int]]:
    """{qid: {id: 0-based exact rank}} for every (query, retrieved-id)
    pair, in one scan.

    Rank is under the engine's canonical exact ordering (unrounded
    float64 cosine desc, id asc — the reference's ``np.argsort`` order
    with its position-stable tie behavior). The target row itself is
    excluded from its own count, so driver-vs-BLAS last-bit float
    differences on the target's own cosine cannot shift its rank.

    ``tie_eps`` is the absolute cosine tie band (cosines live in
    [−1, 1], so absolute ≈ relative at full float64 precision; the
    1e-12 default deliberately treats two values within it as a
    mathematical tie). For quantized / low-precision embeddings where
    distinct cosines can legitimately land that close, pass a smaller
    value — or 0.0 for exact == semantics (then the two kernel shapes
    must bit-agree).
    """
    qm = np.asarray(queries, dtype=np.float64)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    # target cosines: one bounded collect of the nq·k retrieved vectors
    all_ids = sorted({int(t) for ts in targets_per_q.values() for t in ts})
    if not all_ids:
        return {int(q): {} for q in targets_per_q}
    from pyspark.sql import functions as F

    rows = emb.filter(F.col(id_col).isin(all_ids)).select(id_col, vec_col).collect()
    vec_by_id = {int(r[0]): np.asarray(r[1], dtype=np.float64) for r in rows}

    # flat (qid, target_id, target_cos) arrays shipped in the closure
    flat: list[tuple[int, int, float]] = []
    for qi, ts in targets_per_q.items():
        for t in ts:
            v = vec_by_id.get(int(t))
            if v is None:
                continue  # absent from the table → stays missing (−n)
            flat.append((int(qi), int(t), float(qn[int(qi)] @ (v / np.linalg.norm(v)))))
    if not flat:
        return {int(q): {} for q in targets_per_q}
    f_qid = np.array([f[0] for f in flat], dtype=np.int64)
    f_tid = np.array([f[1] for f in flat], dtype=np.int64)
    f_cos = np.array([f[2] for f in flat], dtype=np.float64)

    # cosine tie tolerance: the per-target thresholds are driver-side
    # dot products while batch cosines come from worker matmuls — the
    # same mathematical tie can differ in the last bits between the two
    # kernel shapes, which an exact == compare would miscount. Anything
    # within EPS of the threshold is treated as a tie (broken vid-asc,
    # the reference's position-stable argsort behavior); genuinely
    # distinct cosines are never this close on real embeddings.
    _EPS = float(tie_eps)

    def count_beats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Per batch: one argsort per DISTINCT query column, then each
        # target costs two binary searches + its (tiny) tie range —
        # O(batch·log batch · nq + targets·log batch), not the
        # O(batch · targets) of a per-target full-column compare.
        for pdf in it:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].map(np.asarray)).astype(np.float64)
            mn = m / np.linalg.norm(m, axis=1, keepdims=True)
            vids = pdf[id_col].to_numpy()
            cos = mn @ qn.T  # (batch, nq)
            cnts = np.zeros(f_qid.size, dtype=np.int64)
            vid_order = np.argsort(vids, kind="stable")
            vids_sorted = vids[vid_order]
            for q in np.unique(f_qid):
                js = np.flatnonzero(f_qid == q)
                c = cos[:, q]
                order = np.argsort(c, kind="stable")
                cs = c[order]
                v_by_c = vids[order]
                thr = f_cos[js]
                hi = np.searchsorted(cs, thr + _EPS, side="right")
                lo = np.searchsorted(cs, thr - _EPS, side="left")
                gt = cs.size - hi  # strictly above the tie band
                # is each target row present in this batch (self-exclusion)?
                p = np.searchsorted(vids_sorted, f_tid[js])
                p_c = np.minimum(p, max(vids_sorted.size - 1, 0))
                self_in = (vids_sorted.size > 0) & (vids_sorted[p_c] == f_tid[js])
                for i, j in enumerate(js):
                    ties = int(np.count_nonzero(v_by_c[lo[i] : hi[i]] < f_tid[j]))
                    g = int(gt[i])
                    if self_in[i] and c[vid_order[p_c[i]]] > f_cos[j] + _EPS:
                        g -= 1  # target drifted past its own tie band
                    cnts[j] = g + ties
            yield pd.DataFrame({"j": np.arange(f_qid.size), "cnt": cnts})

    partials = (
        emb.select(id_col, vec_col)
        .mapInPandas(count_beats, "j long, cnt long")
        .groupBy("j")
        .sum("cnt")
        .collect()
    )
    totals = np.zeros(f_qid.size, dtype=np.int64)
    for r in partials:
        totals[int(r["j"])] = int(r["sum(cnt)"])
    out: dict[int, dict[int, int]] = {int(q): {} for q in targets_per_q}
    for j in range(f_qid.size):
        out[int(f_qid[j])][int(f_tid[j])] = int(totals[j])
    return out


def reference_scores_for_results(
    emb: DataFrame,
    queries: Sequence[Sequence[float]],
    results: Mapping[int, Sequence[int]],
    k: int,
    n: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict[int, float]:
    """{qid: tolerance score} for a whole batch of served result lists
    (ordered best-first, as ``search``/``search_batch`` rank them)."""
    ranks = exact_ranks(emb, queries, results, id_col=id_col, vec_col=vec_col)
    return {
        int(qi): reference_score(ids, ranks.get(int(qi), {}), k, n)
        for qi, ids in results.items()
    }
