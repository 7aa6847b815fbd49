"""Scalar quantization (SQ8) for embedding search — the third ANN
family next to IVF (ops/ivf.py) and PQ (ops/pq.py): each dimension
maps linearly onto an 8-bit code between the corpus-wide per-dim min
and max (the FAISS ScalarQuantizer / Lucene int8-HNSW storage trick:
4x smaller vectors, integer SIMD distance). Scores are integer dot
products of codes — exact int64 arithmetic end to end, so results are
partitioning-invariant and SQL-replayable.

Scale shape: pass 1 folds per-dim min/max through a bounded combiner
tree (key space = dim); the driver quantizes the query and broadcasts
(mins, scales, query codes) once via ray.put; pass 2 is a stateless
per-batch quantize + integer matmul + partial top-k, merged on the
driver over O(batches x k) rows. The corpus never shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from warcio_ray.ops.knn import _to_matrix


def sq8_train(ds) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension corpus (min, max) as float64 arrays — the SQ8
    codebook. One bounded tree fold keyed by dim."""
    from warcio_ray.ops.blocks import tree_aggregate

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        m = _to_matrix(batch["embedding"])
        d = m.shape[1]
        return pd.DataFrame({"dim": np.arange(d, dtype="int64"),
                             "mx": m.max(axis=0),
                             "neg_mn": (-m).max(axis=0)})

    folded = tree_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        ["dim"], maxs=("mx", "neg_mn"))
    folded = folded.sort_values("dim").reset_index(drop=True)
    return (-folded["neg_mn"].to_numpy(dtype="float64"),
            folded["mx"].to_numpy(dtype="float64"))


def _sq8_encode(m: np.ndarray, mn: np.ndarray,
                mx: np.ndarray) -> np.ndarray:
    """Quantize rows of ``m`` to int64 codes in [0, 255]: floor of the
    per-dim linear map + 0.5, clamped — ONE fixed float expression
    tree (left-assoc, matching the SQL LEAST/GREATEST/floor chain).
    Degenerate dims (mx == mn) code to 0."""
    span = mx - mn
    safe = np.where(span == 0, 1.0, span)
    t = (m - mn) / safe * 255.0 + 0.5
    c = np.clip(np.floor(t).astype(np.int64), 0, 255)
    return np.where(span == 0, 0, c)


def sq8_topk(ds, query: np.ndarray, k: int = 10) -> pd.DataFrame:
    """Approximate top-k by integer dot product of SQ8 codes.
    Returns (vec_id, dot) sorted by (dot desc, vec_id), dot int64."""
    import ray

    mn, mx = sq8_train(ds)
    q = np.asarray(query, dtype=np.float64).reshape(1, -1)
    qc = _sq8_encode(q, mn, mx)[0]
    model = ray.put((mn, mx, qc))

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                                 "dot": pd.Series(dtype="int64")})
        mns, mxs, qcs = ray.get(model)
        codes = _sq8_encode(_to_matrix(batch["embedding"]), mns, mxs)
        dots = codes @ qcs                      # exact int64
        ids = batch["vec_id"].to_numpy(dtype="int64")
        kk = min(k, len(ids))
        part = np.argpartition(-dots, kk - 1)[:kk]
        kth = dots[part].min()
        cand = np.flatnonzero(dots >= kth)
        order = cand[np.lexsort((ids[cand], -dots[cand]))][:kk]
        return pd.DataFrame({"vec_id": ids[order],
                             "dot": dots[order]})

    parts = ds.map_batches(partial_topk,
                           batch_format="pandas").to_pandas()
    if not len(parts):
        return pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                             "dot": pd.Series(dtype="int64")})
    return parts.sort_values(["dot", "vec_id"],
                             ascending=[False, True]).head(k) \
        .reset_index(drop=True).astype({"vec_id": "int64",
                                        "dot": "int64"})
