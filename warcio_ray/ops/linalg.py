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

__all__ = ["embedding_gram", "pca_project"]


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


def pca_project(ds, vec_col: str = "embedding", id_col: str = "vec_id",
                scale: int = 1 << 8, iters: int = 8,
                renorm_bits: int = 13):
    """Project every embedding onto the corpus's top principal
    direction — EXACT-INTEGER centered PCA by quantized power
    iteration, the embedding-curation rung between the Gram matrix
    (above) and k-means (density/outlier scoring, curriculum ordering
    by the dominant axis).

    Pipeline: ONE distributed pass folds the fixed-point Gram cells
    AND per-dim column sums into a bounded (d*d + d)-cell combiner
    tree; the driver forms the n-scaled centered covariance
    C = n*G - s s^T in PYTHON ints (exact, no overflow by
    construction) and runs ``iters`` power steps v <- C v with integer
    renormalization v_i <- sign(w_i) * (|w_i| // (max|w| // 2^renorm_bits
    + 1)) — truncation toward zero, exactly DuckDB's ``//`` — so the
    direction vector is a deterministic integer object, no float in
    the loop; a second stateless pass broadcasts (v, s.v, n) and emits
    the exact centered projection proj_q = n*(q_x . v) - s . v per
    row. Everything is partitioning/order-invariant and replayable in
    SQL over HUGEINT.

    Scale shape: corpus touches the cluster twice (one bounded-key
    combiner fold, one stateless scan); driver state is O(d^2). The
    int64 bound on the DISTRIBUTED projection, n * d * qmax * 2^renorm
    < 2^62, is checked exactly and raised on, with ``scale`` /
    ``renorm_bits`` as the pressure valves for bigger corpora (the
    driver loop itself cannot overflow — Python ints).

    Returns (Dataset of (id_col, proj_q) int64, direction list[int]).
    No reference counterpart (warcio has no vector layer)."""
    import ray

    from warcio_ray.ops.blocks import tree_aggregate

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        vecs = batch[vec_col]
        if len(vecs) == 0:
            return pd.DataFrame({c: pd.Series(dtype="int64")
                                 for c in ("i", "j", "val", "bn",
                                           "qmax")})
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        q = np.floor(mat * scale + 0.5).astype(np.int64)
        g = q.T @ q
        d = g.shape[0]
        ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        # column-sum cells ride as j = -1 rows through the same tree
        i_all = np.concatenate([ii.ravel(), np.arange(d)])
        j_all = np.concatenate([jj.ravel(), np.full(d, -1)])
        v_all = np.concatenate([g.ravel(), q.sum(axis=0)])
        return pd.DataFrame({
            "i": i_all.astype("int64"), "j": j_all.astype("int64"),
            "val": v_all.astype("int64"),
            "bn": np.full(len(i_all), len(mat), dtype="int64"),
            "qmax": np.full(len(i_all), np.abs(q).max(),
                            dtype="int64")})

    cells = tree_aggregate(ds.map_batches(partials,
                                          batch_format="pandas"),
                           ["i", "j"], sums=("val", "bn"),
                           maxs=("qmax",))
    if len(cells) == 0:
        import ray.data
        empty = pd.DataFrame({id_col: pd.Series(dtype="int64"),
                              "proj_q": pd.Series(dtype="int64")})
        return ray.data.from_pandas(empty), []

    n = int(cells["bn"].iloc[0])  # every batch stamps every cell
    qmax = int(cells["qmax"].max())
    gm = cells[cells["j"] >= 0]
    d = int(gm["i"].max()) + 1
    G = [[0] * d for _ in range(d)]
    for i, j, v in zip(gm["i"], gm["j"], gm["val"]):
        G[int(i)][int(j)] = int(v)
    sm = cells[cells["j"] == -1].set_index("i")["val"]
    s = [int(sm.get(i, 0)) for i in range(d)]

    # int64 guard for the DISTRIBUTED projection pass (driver loop is
    # Python ints, exempt): |proj_q| <= n*d*qmax*2^renorm + d*n*qmax
    # * 2^renorm — bound both terms together with a factor 2
    if 2 * n * d * qmax * (1 << renorm_bits) >= 1 << 62:
        raise OverflowError(
            f"pca_project: projection bound 2*n*d*qmax*2^renorm = "
            f"{2 * n * d * qmax * (1 << renorm_bits):.3g} can exceed "
            f"int64 — lower scale (={scale}) or renorm_bits "
            f"(={renorm_bits})")

    # exact centered covariance (scaled by n) + power iteration,
    # all Python ints — overflow-free at any corpus size
    C = [[n * G[i][j] - s[i] * s[j] for j in range(d)]
         for i in range(d)]
    v = [1] * d
    for _ in range(iters):
        w = [sum(C[i][j] * v[j] for j in range(d)) for i in range(d)]
        m = max(abs(x) for x in w)
        if m == 0:
            break
        qd = (m >> renorm_bits) + 1
        # truncation toward zero on both engines (DuckDB // truncates)
        v = [(-((-x) // qd) if x < 0 else x // qd) for x in w]

    sv = sum(s[i] * v[i] for i in range(d))
    vref = ray.put((np.array(v, dtype=np.int64), int(sv), int(n)))

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        va, svi, ni = ray.get(vref)
        vecs = batch[vec_col]
        if len(vecs) == 0:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "proj_q": pd.Series(dtype="int64")})
        mat = np.stack([np.asarray(x, dtype=np.float64) for x in vecs])
        q = np.floor(mat * scale + 0.5).astype(np.int64)
        proj = ni * (q @ va) - svi
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(dtype="int64"),
            "proj_q": proj.astype("int64")})

    return ds.map_batches(project, batch_format="pandas"), v
