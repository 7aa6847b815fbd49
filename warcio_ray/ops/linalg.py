"""Distributed linear algebra over the embeddings table — the exact
Gram matrix (X^T X), the building block for PCA whitening / covariance
statistics over an embedding corpus.

Scale shape: each batch computes a d x d int64 partial via ONE numpy
matmul (vectorized, zero Python per-row work), so exactly d*d rows
leave any task regardless of batch size; the global merge is
``groupby(i, j).sum`` over the d*d cell space, and the driver fold
reassembles a d x d matrix — all corpus-size independent. The
eigendecomposition a PCA would run on the result is O(d^3) driver-side
math on a tiny matrix, not a data job.

Determinism / oracle: values are quantized to fixed point FIRST
(q = floor(x*scale + 0.5), computed in float64 — identical IEEE ops in
DuckDB's ``floor(CAST(x AS DOUBLE) * scale + 0.5)``), then all products
and sums are int64 — exact, hence partitioning-invariant and
recomputable in SQL. Overflow bound: n * (scale * max|x|)^2 must stay
under 2^62; with the default scale 2^16 and |x| <= 2 that is ~2.6e8
rows — pass a smaller ``scale`` for bigger corpora (the driver fold
checks n * qmax^2 < 2^62 exactly, from ride-along (bn, qmax) partials,
and raises instead of silently wrapping).

No reference counterpart (warcio has no vector layer).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["embedding_gram"]


def embedding_gram(ds, vec_col: str = "embedding",
                   scale: int = 1 << 16) -> pd.DataFrame:
    """Exact fixed-point Gram matrix of a list<float> column.
    Returns d*d rows (i, j, gram) with 0-based dims, ordered (i, j)."""
    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        vecs = batch[vec_col]
        if len(vecs) == 0:
            return pd.DataFrame({"i": pd.Series(dtype="int64"),
                                 "j": pd.Series(dtype="int64"),
                                 "gram": pd.Series(dtype="int64"),
                                 "bn": pd.Series(dtype="int64"),
                                 "qmax": pd.Series(dtype="int64")})
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        q = np.floor(mat * scale + 0.5).astype(np.int64)
        g = q.T @ q  # d x d int64 partial — the whole batch in one matmul
        d = g.shape[0]
        ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        # bn/qmax ride the same d*d rows: summed/maxed per group they
        # reconstruct (total row count, global max |q|) for the exact
        # overflow bound below — no extra pass over the corpus
        return pd.DataFrame({"i": ii.ravel().astype("int64"),
                             "j": jj.ravel().astype("int64"),
                             "gram": g.ravel(),
                             "bn": np.full(d * d, len(mat), dtype="int64"),
                             "qmax": np.full(d * d, np.abs(q).max(),
                                             dtype="int64")})

    from warcio_ray.ops.blocks import tree_aggregate

    # bounded key space (d*d cells) -> vectorized combiner tree, not
    # Ray's per-group sort aggregate (see tree_aggregate docstring)
    out = tree_aggregate(ds.map_batches(partials, batch_format="pandas"),
                         ["i", "j"], sums=("gram", "bn"), maxs=("qmax",))
    if len(out) == 0:  # empty input: typed empty result
        return pd.DataFrame({"i": pd.Series(dtype="int64"),
                             "j": pd.Series(dtype="int64"),
                             "gram": pd.Series(dtype="int64")})
    out = out.rename(columns={"bn": "n"})  # d*d rows — the reduced matrix
    # every batch contributes every (i, j) cell, so any group's bn
    # sum is the total row count; |gram cell| <= n * qmax^2 exactly
    # (Cauchy-Schwarz not even needed), checked in Python ints
    n_total = int(out["n"].iloc[0])
    qmax = int(out["qmax"].max())
    if n_total * qmax * qmax >= 1 << 62:
        raise OverflowError(
            f"embedding_gram: n*qmax^2 = {n_total * qmax * qmax:.3g} "
            f"can exceed int64 — rerun with a smaller scale "
            f"(got scale={scale}, n={n_total}, max|q|={qmax})")
    out = out[["i", "j", "gram"]].sort_values(["i", "j"], kind="mergesort") \
        .reset_index(drop=True).astype("int64")
    return out
