"""Margin-criterion parallel-pair mining (Artetxe & Schwenk 2019,
"Margin-based Parallel Corpus Mining with Multilingual Sentence
Embeddings" — the distance-margin variant): the workhorse of
bitext / cross-snapshot alignment mining. A pair (i in A, j in B) is
mined not when it is merely NEAREST but when it beats the local
neighborhood density on BOTH sides:

    score(i, j) = N_k(i) + N_k(j) - 2k * dist(i, j)

where N_k(x) is the sum of the k smallest cross-side distances of x.
A hub vector that is "close to everything" has a big N_k and mines
nothing; an isolated true pair scores high — exactly the asymmetry the
plain nearest-neighbor rule gets wrong.

Exact-integer contract: embeddings quantize to int64 at
``floor(x * scale + 0.5)`` (the kmeans/pq convention), distances are
exact int64 squared-L2, scores exact int64 — so mined pairs and
tie-breaks ((score desc, dist asc, b_id asc) per A row) are
partitioning-invariant and SQL-replayable.

Shape at scale: side B is the broadcast side (``ray.put`` once, read
per task — the knn_bruteforce query-side contract; tile B when it
outgrows a worker heap). Two streaming passes over A: pass 1 emits
per-batch k-smallest partials per B id (exact for sums: the global
k-smallest set is contained in the union of per-batch k-smallest),
one bounded groupby finishes N_k(B); pass 2 recomputes the distance
block per batch (cheaper than materializing the |A| x |B| matrix) and
mines the argmax with the broadcast N_k(B) table. Distances never
leave the workers; driver state is the |B|-row N_k table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["margin_mine"]


def _pairwise_sqdist(xq: np.ndarray, yq: np.ndarray) -> np.ndarray:
    """Exact int64 squared-L2 distance block: |x|^2 + |y|^2 - 2 x.y."""
    xx = np.einsum("ij,ij->i", xq, xq)
    yy = np.einsum("ij,ij->i", yq, yq)
    return xx[:, None] + yy[None, :] - 2 * (xq @ yq.T)


def margin_mine(ds, label_a: int = 0, label_b: int = 1, k: int = 4,
                scale: int = 1 << 16, vec_col: str = "embedding",
                id_col: str = "vec_id", label_col: str = "label"):
    """Returns a pandas DataFrame (a_id, b_id, dist, score): for each
    A-side vector, its margin-best B-side partner, kept only when the
    margin score is strictly positive."""
    import ray

    from warcio_ray.ops.kmeans import _quantize

    def side(lbl):
        def pick(batch: pd.DataFrame) -> pd.DataFrame:
            m = batch[label_col].astype("int64") == lbl
            return batch.loc[m, [id_col, vec_col]]
        return ds.map_batches(pick, batch_format="pandas")

    a_ds = side(label_a).materialize()
    b_df = side(label_b).to_pandas()
    n_a = a_ds.count()
    if len(b_df) == 0 or n_a == 0:
        return pd.DataFrame({"a_id": pd.Series(dtype="int64"),
                             "b_id": pd.Series(dtype="int64"),
                             "dist": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="int64")})
    b_ids = b_df[id_col].to_numpy(dtype="int64")
    b_q = _quantize(b_df[vec_col], scale)
    b_ref = ray.put((b_ids, b_q))
    # Two distinct clamps: the A-side neighborhood N_k(a) sums over
    # B-side distances (bounded by |B|), the B-side neighborhood N_k(b)
    # sums over A-side distances (bounded by |A|).  The margin
    # multiplier stays the caller's fixed 2*k so the score formula is
    # replayable by an oracle that hardcodes k.
    kk = min(k, len(b_ids))        # A-side neighborhood width
    kk_b = min(k, n_a)             # B-side neighborhood width

    def nk_partials(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({"b_id": pd.Series(dtype="int64"),
                                 "d": pd.Series(dtype="int64")})
        bids, bq = ray.get(b_ref)
        aq = _quantize(batch[vec_col], scale)
        d = _pairwise_sqdist(aq, bq)          # (batch, |B|) int64
        ka = min(kk_b, d.shape[0])
        # per B column: the ka smallest dists in this batch
        part = np.partition(d, ka - 1, axis=0)[:ka, :]
        return pd.DataFrame({
            "b_id": np.repeat(bids, ka),
            "d": np.sort(part, axis=0).T.reshape(-1)})

    # rank the per-batch partials per b_id and keep the global k
    # smallest: one bounded groupby (|B| x k rows in, |B| out)
    def finish_nk(grp: pd.DataFrame) -> pd.DataFrame:
        ds_sorted = np.sort(grp["d"].to_numpy(dtype="int64"))[:kk_b]
        return pd.DataFrame({"b_id": grp["b_id"].iloc[:1].astype("int64"),
                             "nk": [int(ds_sorted.sum())]})

    nkb_df = a_ds.map_batches(nk_partials, batch_format="pandas") \
        .groupby("b_id").map_groups(finish_nk, batch_format="pandas") \
        .to_pandas()
    nk_of = pd.Series(nkb_df["nk"].to_numpy(dtype="int64"),
                      index=nkb_df["b_id"].to_numpy(dtype="int64"))
    nkb_ref = ray.put(nk_of.reindex(b_ids).to_numpy(dtype="int64"))

    def mine(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({"a_id": pd.Series(dtype="int64"),
                                 "b_id": pd.Series(dtype="int64"),
                                 "dist": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="int64")})
        bids, bq = ray.get(b_ref)
        nkb = ray.get(nkb_ref)                 # aligned with bids
        aq = _quantize(batch[vec_col], scale)
        aids = batch[id_col].to_numpy(dtype="int64")
        d = _pairwise_sqdist(aq, bq)
        nka = np.sort(d, axis=1)[:, :kk].sum(axis=1)
        score = nka[:, None] + nkb[None, :] - 2 * k * d
        # argmax by (score desc, dist asc, b_id asc): np.lexsort is
        # last-key-primary, so feed (bids, d, -score)
        out_rows = []
        for r in range(d.shape[0]):
            cand = np.lexsort((bids, d[r], -score[r]))
            j = cand[0]
            if score[r, j] > 0:
                out_rows.append((aids[r], bids[j], d[r, j], score[r, j]))
        if not out_rows:
            return pd.DataFrame({"a_id": pd.Series(dtype="int64"),
                                 "b_id": pd.Series(dtype="int64"),
                                 "dist": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="int64")})
        o = pd.DataFrame(out_rows, columns=["a_id", "b_id",
                                            "dist", "score"])
        return o.astype("int64")

    out = a_ds.map_batches(mine, batch_format="pandas").to_pandas()
    if len(out) == 0:
        return pd.DataFrame({"a_id": pd.Series(dtype="int64"),
                             "b_id": pd.Series(dtype="int64"),
                             "dist": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="int64")})
    return out.sort_values("a_id").reset_index(drop=True).astype("int64")
