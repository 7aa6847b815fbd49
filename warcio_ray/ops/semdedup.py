"""SemDeDup — semantic deduplication over an embedding column
(Abbas et al. 2023, arXiv:2303.09540): k-means-cluster the corpus
embeddings, then inside each cluster drop every vector whose cosine
similarity to a LOWER-id cluster member meets the threshold.  The
embedding sibling of exact/minhash dedup: catches paraphrases and
re-encodings that share no n-grams.

No reference counterpart (warcio has no vector layer); this composes
the repo's exact-integer k-means (ops/kmeans.py) with an exact
quantized-cosine pair test so the WHOLE chain — clustering included —
is bit-reproducible at any parallelism and replayable in SQL.

Scale shape: ONE corpus pass assigns clusters against the broadcast
(k x d) codebook and emits (id, cluster, quantized vec) — ~0.5 KB/row,
the only shuffle; clusters are hash-partitioned (cluster % N
partitions, the ops/dedup.py pair-partition pattern) so per-group
dispatch stays O(N), not O(#clusters); inside a partition each
cluster's pair test is one (n x n) int64 gram matrix, clusters over
``cap`` truncated to the smallest ids with accounted drops.  At 100 TB
k grows with the corpus (the paper runs ~10^5 clusters on LAION) so
n stays small; driver state is the O(k*d) codebook.

Exactness / oracle: vectors quantize to floor(x*cos_scale + 0.5)
(float64, same IEEE expression in SQL); cos(a,b) >= t is decided
without floats as  dot > 0  AND  dot^2 * t_den >= t_num * |a|^2 *
|b|^2  where t^2 = t_num/t_den (DuckDB mirrors with HUGEINT).  int64
safety needs (d * max_q^2)^2 * max(t_num, t_den) < 2^63 — asserted.
"""

from __future__ import annotations

import warnings

import numpy as np
import pandas as pd

__all__ = ["semdedup"]

N_CLUSTER_PARTITIONS = 32


def _removed_in_partition(df: pd.DataFrame, t_num: int, t_den: int,
                          cap: int) -> pd.DataFrame:
    """Per cluster inside one hash partition: rank members by id, keep
    the ``cap`` smallest (accounted drop), and emit every member that
    has a >=-threshold cosine pair with a lower-id member (dup_of =
    the smallest such id)."""
    df = df.sort_values(["cluster", "vec_id"], kind="mergesort")
    ids = df["vec_id"].to_numpy(dtype="int64")
    cl = df["cluster"].to_numpy(dtype="int64")
    change = np.zeros(len(df), dtype=bool)
    if len(df):
        change[0] = True
        change[1:] = cl[1:] != cl[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], len(df))
    out_id, out_dup, out_cl = [], [], []
    dropped = 0
    for s, e in zip(starts, ends):
        if e - s > cap:
            dropped += int(e - s - cap)
            e = s + cap
        n = e - s
        if n < 2:
            continue
        q = np.stack(df["qvec"].iloc[s:e].to_numpy())  # (n, d) int64
        gram = q @ q.T
        norms = np.diag(gram)
        # dup test on the strict lower triangle (i < j by id order)
        lhs = gram.astype(np.int64) ** 2 * t_den
        rhs = t_num * np.outer(norms, norms)
        dup = (gram > 0) & (lhs >= rhs)
        dup &= np.tri(n, k=-1, dtype=bool).T  # keep i<j (upper tri)
        hit = dup.any(axis=0)
        if not hit.any():
            continue
        # dup_of = smallest i with dup[i, j]; argmax finds first True
        first_i = np.argmax(dup, axis=0)
        out_id.append(ids[s:e][hit])
        out_dup.append(ids[s:e][first_i[hit]])
        out_cl.append(cl[s:e][hit])
    empty = np.array([], dtype="int64")
    res = pd.DataFrame({
        "vec_id": np.concatenate(out_id) if out_id else empty,
        "dup_of": np.concatenate(out_dup) if out_dup else empty,
        "cluster": np.concatenate(out_cl) if out_cl else empty,
    })
    res["n_dropped"] = np.int64(0)
    if dropped:
        # sentinel row: decoded and summed driver-side by semdedup()
        res = pd.concat([res, pd.DataFrame(
            {"vec_id": [-1], "dup_of": [-1], "cluster": [-1],
             "n_dropped": [dropped]})], ignore_index=True)
    return res.astype({"vec_id": "int64", "dup_of": "int64",
                       "cluster": "int64", "n_dropped": "int64"})


def semdedup(ds, vec_col: str = "embedding", id_col: str = "vec_id",
             k: int = 8, iters: int = 2, cluster_scale: int = 1 << 16,
             cos_scale: int = 1 << 10, t_num: int = 361,
             t_den: int = 400, cap: int = 512):
    """Returns a Dataset of removed members: (vec_id, dup_of, cluster).
    Default threshold t^2 = 361/400 i.e. cos >= 0.95."""
    import ray

    from warcio_ray.ops.kmeans import kmeans_exact

    _, cents = kmeans_exact(ds, vec_col=vec_col, id_col=id_col, k=k,
                            iters=iters, scale=cluster_scale,
                            return_centroids=True)
    cref = ray.put(cents)

    def assign_and_quantize(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({
                "vec_id": pd.Series(dtype="int64"),
                "cluster": pd.Series(dtype="int64"),
                "_part": pd.Series(dtype="int64"),
                "qvec": pd.Series(dtype="object")})
        c = ray.get(cref)
        mat = np.stack([np.asarray(v, dtype=np.float64)
                        for v in batch[vec_col]])
        qk = np.floor(mat * cluster_scale + 0.5).astype(np.int64)
        diff = qk[:, None, :] - c[None, :, :]
        cluster = np.argmin((diff * diff).sum(axis=2), axis=1)
        qc = np.floor(mat * cos_scale + 0.5).astype(np.int64)
        max_q = int(np.abs(qc).max()) if len(qc) else 0
        d = qc.shape[1]
        if (d * max_q * max_q) ** 2 * max(t_num, t_den) >= 2 ** 63:
            raise OverflowError(
                f"semdedup pair test would overflow int64 at max|q|="
                f"{max_q}, d={d}: lower cos_scale or the threshold "
                "denominator")
        return pd.DataFrame({
            "vec_id": batch[id_col].astype("int64"),
            "cluster": cluster.astype("int64"),
            "_part": (cluster % N_CLUSTER_PARTITIONS).astype("int64"),
            "qvec": list(qc),
        })

    assigned = ds.map_batches(assign_and_quantize, batch_format="pandas")
    removed = assigned.groupby("_part").map_groups(
        lambda g: _removed_in_partition(g, t_num, t_den, cap),
        batch_format="pandas").materialize()  # bounded: dup rows only
    n_dropped = int(removed.filter(expr="vec_id < 0")
                    .sum("n_dropped") or 0)
    if n_dropped:
        warnings.warn(
            f"semdedup: {n_dropped} cluster members beyond cap={cap} "
            "dropped from the pair test (raise cap or k)",
            RuntimeWarning)
    return removed.filter(expr="vec_id >= 0") \
        .drop_columns(["n_dropped"])
