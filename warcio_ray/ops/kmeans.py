"""Exact-integer distributed k-means (Lloyd) over the embeddings table
— corpus clustering for diversity sampling / curriculum bucketing,
built so every iteration is bit-reproducible at any parallelism and
recomputable in SQL (the same fixed-point trick as ops/graph.py's
PageRank: exactness => order-independence => a hard oracle for an
iterative algorithm).

Scale shape: per iteration ONE pass over the corpus — each batch
assigns its vectors with a single numpy broadcast (n x k x d int64,
vectorized) and folds them to k*(d+1) partial rows (per-cluster
per-dim sums + ride-along counts) before anything shuffles; the merge
is a tree_aggregate over that bounded cell space; the driver holds
k x d ints. Total: iters+1 corpus passes, O(k*d) driver state.

Determinism / oracle: vectors quantize to q = floor(x*scale + 0.5)
(float64, same IEEE expression in SQL); distances and sums are int64
exact; argmin ties break on lowest cluster id; centroid update is
MATHEMATICAL floor division sum // n (SQL mirrors it sign-safely as
(s - ((s % n) + n) % n) // n since DuckDB ``//`` truncates toward
zero); an emptied cluster keeps its previous centroid. Overflow: the
assignment needs d*(2*scale*max|x|)^2 < 2^63 (d=64, scale 2^16,
|x|<=2 gives 2^42 — wide margin); sums reuse embedding_gram's bound
logic (n * scale * max|x| per cell, far below the gram bound).

Init: the k smallest ids' vectors (a per-batch min-k combiner, no
global sort). No reference counterpart (warcio has no vector layer);
ops/ivf.py keeps the float hash-sampled trainer for ANN layouts —
this operator is the oracle-checkable full-corpus variant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["kmeans_exact"]


def _quantize(vecs, scale: int) -> np.ndarray:
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
    return np.floor(mat * scale + 0.5).astype(np.int64)


def kmeans_exact(ds, vec_col: str = "embedding", id_col: str = "vec_id",
                 k: int = 4, iters: int = 3, scale: int = 1 << 16,
                 return_centroids: bool = False):
    """Returns a Dataset of (id_col, cluster) after ``iters`` exact
    Lloyd iterations from the deterministic min-id init; with
    ``return_centroids`` a ``(dataset, (k, d) int64 centroids)`` tuple
    (the quantized codebook IVF-style consumers need)."""
    import ray

    from warcio_ray.ops.blocks import tree_aggregate

    # ---- init: k smallest ids' vectors (combiner min-k, tiny collect)
    def min_k(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.nsmallest(k, id_col)[[id_col, vec_col]]

    seed = ds.map_batches(min_k, batch_format="pandas").to_pandas()
    if len(seed) == 0:  # empty corpus: typed empty assignment
        import ray.data
        empty = ray.data.from_pandas(pd.DataFrame({
            id_col: pd.Series(dtype="int64"),
            "cluster": pd.Series(dtype="int64")}))
        return (empty, np.zeros((k, 0), dtype=np.int64)) \
            if return_centroids else empty
    seed = seed.nsmallest(k, id_col).sort_values(id_col)
    cents = _quantize(seed[vec_col], scale)  # (k, d) int64

    def assign(q: np.ndarray, c: np.ndarray) -> np.ndarray:
        # (n, k) exact int64 distances, one broadcast; argmin takes the
        # FIRST minimum -> ties break on lowest cluster id
        diff = q[:, None, :] - c[None, :, :]
        return np.argmin((diff * diff).sum(axis=2), axis=1)

    for _ in range(iters):
        cref = ray.put(cents)

        def partials(batch: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(cref)
            d = c.shape[1]
            if len(batch) == 0:
                return pd.DataFrame({"cl": pd.Series(dtype="int64"),
                                     "i": pd.Series(dtype="int64"),
                                     "s": pd.Series(dtype="int64")})
            q = _quantize(batch[vec_col], scale)
            cl = assign(q, c)
            rows = []
            for g in np.unique(cl):
                m = q[cl == g]
                rows.append(pd.DataFrame({
                    "cl": np.full(d + 1, g, dtype="int64"),
                    # i = -1 carries the member count on the same rows
                    "i": np.arange(-1, d, dtype="int64"),
                    "s": np.concatenate([[len(m)], m.sum(axis=0)])
                        .astype("int64")}))
            return pd.concat(rows, ignore_index=True)

        merged = tree_aggregate(
            ds.map_batches(partials, batch_format="pandas"),
            ["cl", "i"], sums=("s",))
        new = cents.copy()
        for g, grp in merged.groupby("cl"):
            grp = grp.sort_values("i")
            n = int(grp[grp["i"] == -1]["s"].iloc[0])
            if n > 0:
                sums = grp[grp["i"] >= 0]["s"].to_numpy(dtype="int64")
                new[int(g)] = sums // n  # mathematical floor division
        cents = new

    cref = ray.put(cents)

    def final_assign(batch: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cref)
        if len(batch) == 0:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "cluster": pd.Series(dtype="int64")})
        q = _quantize(batch[vec_col], scale)
        return pd.DataFrame({id_col: batch[id_col].astype("int64"),
                             "cluster": assign(q, c).astype("int64")})

    out = ds.map_batches(final_assign, batch_format="pandas")
    return (out, cents) if return_centroids else out


def embedding_outliers(ds, vec_col: str = "embedding",
                       id_col: str = "vec_id", k: int = 4,
                       iters: int = 3, scale: int = 1 << 16,
                       per_cluster_topk: int = 5):
    """Distance-to-centroid outlier detection — the embedding-space
    curation signal (mislabeled / off-distribution vectors sit far
    from their cluster's center; cf. SemDeDup's inverse use of the
    same geometry). Clusters with ``kmeans_exact``, then returns the
    ``per_cluster_topk`` FARTHEST vectors of every cluster as
    (id_col, cluster, d2) rows — d2 the exact int64 quantized squared
    distance, ties broken by lowest id (a fixed-size exact selection,
    robust to any distance distribution; a mean-multiple threshold
    degenerates on tight synthetic clusters).

    Scale shape: kmeans passes + ONE further corpus scan — each batch
    folds to its per-cluster top-M candidates (<= k*M rows leave any
    task), merged by one final driver fold over O(batches * k * M)
    candidate rows; the corpus never shuffles. Distances recompute
    from the broadcast (k, d) int64 codebook (identical argmin) — no
    assignment join ever ships vectors. Overflow: d2 <=
    d*(2*scale*max|x|)^2 (2^42 at d=64, scale 2^16, |x|<=2).
    """
    import ray
    import ray.data

    _, cents = kmeans_exact(ds, vec_col=vec_col, id_col=id_col, k=k,
                            iters=iters, scale=scale,
                            return_centroids=True)
    empty = pd.DataFrame({id_col: pd.Series(dtype="int64"),
                          "cluster": pd.Series(dtype="int64"),
                          "d2": pd.Series(dtype="int64")})
    if cents.size == 0:
        return ray.data.from_pandas(empty)
    cref = ray.put(cents)

    def dists(batch: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cref)
        q = _quantize(batch[vec_col], scale)
        diff = q[:, None, :] - c[None, :, :]
        d2k = (diff * diff).sum(axis=2)
        cl = np.argmin(d2k, axis=1)
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(dtype="int64"),
            "cluster": cl.astype("int64"),
            "d2": d2k[np.arange(len(cl)), cl].astype("int64")})

    def top_fold(batch: pd.DataFrame) -> pd.DataFrame:
        # exact per-cluster top-M: sort by (cluster, -d2, id), head M
        b = batch.sort_values(["cluster", "d2", id_col],
                              ascending=[True, False, True],
                              kind="mergesort")
        return b.groupby("cluster", sort=False).head(per_cluster_topk)

    cand = ds.map_batches(dists, batch_format="pandas") \
        .map_batches(top_fold, batch_format="pandas").to_pandas()
    if not len(cand):
        return ray.data.from_pandas(empty)
    out = top_fold(cand).reset_index(drop=True)
    return ray.data.from_pandas(out[[id_col, "cluster", "d2"]])


def contrastive_triplets(ds, vec_col: str = "embedding",
                         id_col: str = "vec_id", k: int = 4,
                         iters: int = 3, scale: int = 1 << 16,
                         num_partitions=None):
    """Deterministic (anchor, positive, negative) triplet mining for
    contrastive / embedding-model training: positives share the
    anchor's k-means cluster, negatives come from a different one.

    Rules (exact, SQL-mirrorable — no RNG):
      rank r(v)  = v's 0-based position in its cluster's sorted ids
      positive   = the id at rank (r+1) mod size(c) in cluster c
                   (the next same-cluster vector cyclically; singleton
                   clusters emit nothing — no self-positives)
      neg cluster c' = (c + 1 + md5(id) % (k_eff - 1)) mod k_eff over
                   the NON-EMPTY clusters (sorted), k_eff their count
      negative   = the id at rank r mod size(c') in cluster c'

    Scale shape: kmeans passes + ONE narrow (id, cluster) partition
    sweep assigns ranks (vectorized argsort per cluster-hash
    partition, never per-key map_groups), then TWO hash joins on
    (cluster, rank) resolve positives and negatives — only int64
    triples move, vectors never shuffle. Cluster sizes (<= k ints)
    broadcast driver-side.
    """
    import hashlib

    import ray
    import ray.data

    from warcio_ray.ops.blocks import safe_join

    if num_partitions is None:
        import ray as _r
        num_partitions = min(32, max(2, int(
            _r.cluster_resources().get("CPU", 8))))

    assign = kmeans_exact(ds, vec_col=vec_col, id_col=id_col, k=k,
                          iters=iters, scale=scale)

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            id_col: batch[id_col].astype("int64"),
            "cluster": batch["cluster"].astype("int64")})
        out["_part"] = out["cluster"] % num_partitions
        return out

    def rank_sweep(grp: pd.DataFrame) -> pd.DataFrame:
        g = grp.sort_values(["cluster", id_col], kind="mergesort")
        cl = g["cluster"].to_numpy(dtype="int64")
        starts = np.flatnonzero(np.r_[True, cl[1:] != cl[:-1]])
        reps = np.r_[starts[1:], len(cl)] - starts
        r = np.arange(len(cl), dtype="int64") \
            - np.repeat(starts, reps)
        out = g[[id_col, "cluster"]].copy()
        out["r"] = r
        return out

    ranked = assign.map_batches(add_part, batch_format="pandas") \
        .groupby("_part").map_groups(rank_sweep,
                                     batch_format="pandas") \
        .materialize()

    sizes_pd = ranked.map_batches(
        lambda b: b.groupby("cluster", sort=False).size()
        .reset_index(name="n"),
        batch_format="pandas").to_pandas() \
        .groupby("cluster")["n"].sum()
    live = np.sort(sizes_pd[sizes_pd > 0].index.to_numpy("int64"))
    k_eff = len(live)
    if k_eff < 2:
        return ray.data.from_pandas(pd.DataFrame({
            "anchor": pd.Series(dtype="int64"),
            "cluster": pd.Series(dtype="int64"),
            "positive": pd.Series(dtype="int64"),
            "negative": pd.Series(dtype="int64")}))
    size_of = dict(sizes_pd.items())
    pos_of = {int(c): i for i, c in enumerate(live)}
    sref = ray.put((live, size_of, pos_of, k_eff))

    def wants(batch: pd.DataFrame) -> pd.DataFrame:
        lv, sz, po, ke = ray.get(sref)
        ids = batch[id_col].to_numpy(dtype="int64")
        cl = batch["cluster"].to_numpy(dtype="int64")
        r = batch["r"].to_numpy(dtype="int64")
        n_c = np.array([sz[c] for c in cl], dtype="int64")
        keep = n_c > 1  # singleton clusters: no positive
        ids, cl, r, n_c = ids[keep], cl[keep], r[keep], n_c[keep]
        h = np.array([int(hashlib.md5(str(int(i)).encode())
                          .hexdigest()[:8], 16) for i in ids],
                     dtype="int64")
        ci = np.array([po[c] for c in cl], dtype="int64")
        neg_cl = lv[(ci + 1 + h % (ke - 1)) % ke]
        n_n = np.array([sz[c] for c in neg_cl], dtype="int64")
        return pd.DataFrame({
            "anchor": ids, "cluster": cl,
            "pos_r": (r + 1) % n_c,
            "neg_cluster": neg_cl, "neg_r": r % n_n})

    want_ds = ranked.map_batches(wants, batch_format="pandas")
    members = ranked  # (id, cluster, r)

    pos_j = safe_join(want_ds, members, "inner", num_partitions,
                      ("cluster", "pos_r"), right_on=("cluster", "r"))

    def name_pos(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "anchor": batch["anchor"].astype("int64"),
            "cluster": batch["cluster"].astype("int64"),
            "positive": batch[id_col].astype("int64"),
            "neg_cluster": batch["neg_cluster"].astype("int64"),
            "neg_r": batch["neg_r"].astype("int64")})

    pos_done = pos_j.map_batches(name_pos, batch_format="pandas")
    neg_j = safe_join(pos_done, members, "inner", num_partitions,
                      ("neg_cluster", "neg_r"),
                      right_on=("cluster", "r"))

    def name_neg(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "anchor": batch["anchor"].astype("int64"),
            "cluster": batch["cluster"].astype("int64"),
            "positive": batch["positive"].astype("int64"),
            "negative": batch[id_col].astype("int64")})

    return neg_j.map_batches(name_neg, batch_format="pandas")
