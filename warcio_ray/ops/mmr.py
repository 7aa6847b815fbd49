"""Maximal Marginal Relevance (MMR) diverse top-k retrieval —
relevance-vs-redundancy reranking (Carbonell & Goldstein, SIGIR 1998),
the standard fix for near-duplicate results crowding a similarity
search (and, over training corpora, for picking a relevant-but-diverse
example subset).

Two stages, the honest scale split:

1. DISTRIBUTED candidate generation — exact integer top-``pool``
   by quantized dot product against the broadcast query (per-batch
   partial top-pool with the tie-widening trick, tiny driver merge).
   This is the only pass that touches the corpus.
2. DRIVER reranking — greedy MMR over the ``pool`` candidates (a
   pool x pool integer dot matrix, thousands of cells): pick max
   relevance first, then k-1 times

       argmax over remaining of  7*rel(v) - 3*max_{u selected} sim(v, u)

   (the standard lambda = 0.7 MMR objective scaled by 10 — exact
   int64, no float), ties to the lowest vec_id.

All dots are integer products of the shared 2^16 quantization, so the
result is partitioning-invariant and the whole chain (pool cut + k
greedy rounds) replays in SQL. No reference counterpart — retrieval /
curation operator per the build brief.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from warcio_ray.ops.kmeans import _quantize

__all__ = ["mmr_topk"]


def mmr_topk(ds, query: np.ndarray, k: int = 10, pool: int = 50,
             vec_col: str = "embedding", id_col: str = "vec_id",
             scale: int = 1 << 16) -> pd.DataFrame:
    """Returns (sel_rank, vec_id, rel, mmr) int64 rows: ``rel`` the
    quantized query dot, ``mmr`` the 7*rel - 3*max-sim-to-selected
    score at selection time (== 7*rel for the rank-0 pick)."""
    import ray

    qc = np.floor(np.asarray(query, dtype=np.float64) * scale
                  + 0.5).astype(np.int64)
    qref = ray.put(qc)

    def partial_pool(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                                 "rel": pd.Series(dtype="int64"),
                                 "code": pd.Series(dtype="object")})
        qcode = ray.get(qref)
        codes = _quantize(batch[vec_col], scale)
        rel = codes @ qcode
        ids = batch[id_col].to_numpy(dtype="int64")
        kk = min(pool, len(ids))
        part = np.argpartition(-rel, kk - 1)[:kk]
        kth = rel[part].min()
        cand = np.flatnonzero(rel >= kth)
        order = cand[np.lexsort((ids[cand], -rel[cand]))][:kk]
        return pd.DataFrame({"vec_id": ids[order],
                             "rel": rel[order],
                             "code": list(codes[order])})

    parts = ds.map_batches(partial_pool,
                           batch_format="pandas").to_pandas()
    parts = parts.sort_values(["rel", "vec_id"],
                              ascending=[False, True]).head(pool)
    ids = parts["vec_id"].to_numpy(dtype="int64")
    rel = parts["rel"].to_numpy(dtype="int64")
    codes = np.stack([np.asarray(c, dtype=np.int64)
                      for c in parts["code"]])
    sims = codes @ codes.T                       # (pool, pool) int64

    n = len(ids)
    k = min(k, n)
    picked = np.zeros(n, dtype=bool)
    maxsim = np.full(n, np.iinfo(np.int64).min, dtype=np.int64)
    out_rank, out_id, out_rel, out_mmr = [], [], [], []
    for r in range(k):
        score = 7 * rel if r == 0 else 7 * rel - 3 * maxsim
        # ties to the lowest vec_id among unpicked; mask AFTER the
        # negation (negating an int64 sentinel min wraps back to min
        # and would sort picked rows first)
        neg = np.where(picked, np.iinfo(np.int64).max, -score)
        best = np.lexsort((ids, neg))[0]
        out_rank.append(r)
        out_id.append(int(ids[best]))
        out_rel.append(int(rel[best]))
        out_mmr.append(int(score[best]))
        picked[best] = True
        maxsim = np.maximum(maxsim, sims[:, best])

    return pd.DataFrame({"sel_rank": np.asarray(out_rank, dtype="int64"),
                         "vec_id": np.asarray(out_id, dtype="int64"),
                         "rel": np.asarray(out_rel, dtype="int64"),
                         "mmr": np.asarray(out_mmr, dtype="int64")})
