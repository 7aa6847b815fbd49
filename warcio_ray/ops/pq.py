"""Product quantization (PQ) for embedding columns — the compressed
similarity-search path past IVF: vectors become m uint8 codes (m bytes
instead of 4·d), and approximate distances come from m table lookups
(ADC, Jégou et al. 2011, "Product Quantization for Nearest Neighbor
Search"). At 100 TB this is THE memory lever: 64-dim float32 corpora
compress 64x, so a node's worth of codes covers billions of vectors
and the float vectors are only fetched to re-rank a shortlist.

Exactness (the repo's fixed-point trick, ops/kmeans.py /
ops/graph.py): vectors quantize to q = floor(x*scale + 0.5) int64;
per-subspace Lloyd runs in int64 (argmin ties -> lowest codeword,
mathematical floor-division centroid updates, emptied codewords keep
their previous value); codes and ADC scores are pure integers. Every
stage is therefore partitioning-invariant and an unrolled SQL CTE
reproduces train -> encode -> search bit-for-bit (hard oracle for an
iterative, approximate algorithm).

Scale shape: ALL m subspaces train in the SAME corpus pass — each
batch folds to m·k·(d/m+1) partial rows (per-(subspace, codeword)
counts + per-dim sums), merged by tree_aggregate over that bounded
cell space; driver state is the m·k·(d/m) codebook. Encoding is one
stateless pass emitting (id, code_0..code_{m-1}); search broadcasts
the m·k ADC table in a closure and keeps per-batch partial top-k by
(score, id), so only batches·k rows reach the driver merge.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

__all__ = ["pq_train_encode", "pq_adc_topk", "ivfpq_topk"]


def _quantize(vecs, scale: int) -> np.ndarray:
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
    return np.floor(mat * scale + 0.5).astype(np.int64)


def _assign(q3: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """q3 (n, m, dsub) int64, cents (m, k, dsub) int64 -> (n, m) codes.
    First argmin -> ties break on lowest codeword id."""
    diff = q3[:, :, None, :] - cents[None, :, :, :]
    return np.argmin((diff * diff).sum(axis=3), axis=2)


def pq_train_encode(ds, vec_col: str = "embedding",
                    id_col: str = "vec_id", m: int = 4, k: int = 16,
                    iters: int = 2, scale: int = 1 << 16):
    """Train per-subspace codebooks (exact-integer Lloyd, init = the k
    smallest ids' subvectors) and encode the corpus.

    Returns ``(codes_ds, cents)``: a Dataset of
    (id_col, code_0..code_{m-1}) int64 columns and the (m, k, d/m)
    int64 codebook array."""
    import ray

    from warcio_ray.ops.blocks import tree_aggregate

    def min_k(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.nsmallest(k, id_col)[[id_col, vec_col]]

    seed = ds.map_batches(min_k, batch_format="pandas").to_pandas()
    if len(seed) == 0:
        import ray.data
        empty = {id_col: pd.Series(dtype="int64")}
        empty.update({f"code_{s}": pd.Series(dtype="int64")
                      for s in range(m)})
        return ray.data.from_pandas(pd.DataFrame(empty)), \
            np.zeros((m, k, 0), dtype=np.int64)
    seed = seed.nsmallest(k, id_col).sort_values(id_col)
    mat = _quantize(seed[vec_col], scale)  # (n<=k, d)
    if mat.shape[0] < k:
        # fewer corpus vectors than codewords: pad by repeating the
        # last seed row so the (m, k, dsub) codebook shape holds;
        # duplicate centroids lose argmin ties to the lowest id and
        # empty clusters keep their centroid, so this is deterministic
        pad = np.repeat(mat[-1:], k - mat.shape[0], axis=0)
        mat = np.concatenate([mat, pad], axis=0)
    d = mat.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    # (m, k, dsub): every subspace initializes from the same k ids
    cents = mat.reshape(k, m, dsub).transpose(1, 0, 2).copy()

    for _ in range(iters):
        cref = ray.put(cents)

        def partials(batch: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(cref)
            if len(batch) == 0:
                return pd.DataFrame({
                    "sub": pd.Series(dtype="int64"),
                    "cl": pd.Series(dtype="int64"),
                    "i": pd.Series(dtype="int64"),
                    "s": pd.Series(dtype="int64")})
            q3 = _quantize(batch[vec_col], scale).reshape(-1, m, dsub)
            codes = _assign(q3, c)  # (n, m)
            rows = []
            for sub in range(m):
                for g in np.unique(codes[:, sub]):
                    mem = q3[codes[:, sub] == g, sub]
                    rows.append(pd.DataFrame({
                        "sub": np.full(dsub + 1, sub, dtype="int64"),
                        "cl": np.full(dsub + 1, g, dtype="int64"),
                        # i = -1 carries the member count
                        "i": np.arange(-1, dsub, dtype="int64"),
                        "s": np.concatenate(
                            [[len(mem)], mem.sum(axis=0)])
                            .astype("int64")}))
            return pd.concat(rows, ignore_index=True)

        merged = tree_aggregate(
            ds.map_batches(partials, batch_format="pandas"),
            ["sub", "cl", "i"], sums=("s",))
        new = cents.copy()
        for (sub, g), grp in merged.groupby(["sub", "cl"]):
            grp = grp.sort_values("i")
            n = int(grp[grp["i"] == -1]["s"].iloc[0])
            if n > 0:
                sums = grp[grp["i"] >= 0]["s"].to_numpy(dtype="int64")
                new[int(sub), int(g)] = sums // n  # mathematical floor
        cents = new

    cref = ray.put(cents)

    def encode(batch: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cref)
        out = {id_col: batch[id_col].astype("int64")}
        if len(batch) == 0:
            out.update({f"code_{s}": pd.Series(dtype="int64")
                        for s in range(m)})
            return pd.DataFrame(out)
        q3 = _quantize(batch[vec_col], scale).reshape(-1, m, dsub)
        codes = _assign(q3, c)
        for s in range(m):
            out[f"code_{s}"] = codes[:, s].astype("int64")
        return pd.DataFrame(out)

    return ds.map_batches(encode, batch_format="pandas"), cents


def pq_adc_topk(codes_ds, cents: np.ndarray, query_vec,
                id_col: str = "vec_id", k_top: int = 10,
                scale: int = 1 << 16) -> pd.DataFrame:
    """Asymmetric distance computation: the query's (m, k) integer
    distance table broadcasts in the closure; each batch scores its
    codes with m table lookups + an integer sum and keeps its top
    ``k_top`` by (adc, id) — the global top-k by the same total order
    is a subset of the union of per-batch top-k, so the driver merge
    sees only batches x k_top rows. Returns (id_col, adc) sorted."""
    m, k, dsub = cents.shape
    q = np.floor(np.asarray(query_vec, dtype=np.float64)
                 * scale + 0.5).astype(np.int64).reshape(m, dsub)
    diff = q[:, None, :] - cents  # (m, k, dsub)
    table = (diff * diff).sum(axis=2)  # (m, k) int64

    code_cols = [f"code_{s}" for s in range(m)]

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "adc": pd.Series(dtype="int64")})
        codes = batch[code_cols].to_numpy(dtype="int64")  # (n, m)
        adc = np.zeros(len(batch), dtype=np.int64)
        for s in range(m):
            adc += table[s][codes[:, s]]
        out = pd.DataFrame({id_col: batch[id_col].astype("int64"),
                            "adc": adc})
        return out.sort_values(["adc", id_col]).head(k_top)

    parts = codes_ds.map_batches(partial_topk,
                                 batch_format="pandas").to_pandas()
    return parts.sort_values(["adc", id_col]).head(k_top) \
        .reset_index(drop=True)


def ivfpq_topk(ds, query_vec, vec_col: str = "embedding",
               id_col: str = "vec_id", n_clusters: int = 4,
               nprobe: Optional[int] = None, m: int = 4, k_codes: int = 16,
               iters: int = 2, shortlist: int = 64, k_top: int = 10,
               scale: int = 1 << 16,
               num_partitions: Optional[int] = None) -> pd.DataFrame:
    """IVF + PQ composed search (the FAISS-IVFPQ production shape):
    coarse exact-integer k-means partitions the corpus, a global PQ
    codebook compresses every vector to m codes, and a query touches
    only the ``nprobe`` nearest clusters' CODES (ADC lookups) to build
    a ``shortlist`` that is re-ranked EXACTLY against the full vectors.
    At 100 TB: codes live hive-partitioned by cluster (the persisted
    layout pattern of ops/ivf.py:build_ivf_layout / ops/search.py
    postings), so a query reads nprobe/k of the m-byte codes and
    fetches full vectors only for the shortlist.

    Everything is fixed-point int64 (coarse Lloyd via kmeans_exact,
    codes/ADC via pq_train_encode, exact rerank on quantized vectors),
    so results are partitioning-invariant; with nprobe == n_clusters
    and shortlist >= corpus the result EQUALS the exact quantized-L2
    top-k (the SQL-oracle configuration), and the approximate settings
    are covered by recall tests. Returns (id_col, dist) sorted by
    (dist, id)."""
    import ray
    import pyarrow.compute as pc
    import pyarrow as pa

    from warcio_ray.ops.blocks import safe_join
    from warcio_ray.ops.kmeans import kmeans_exact

    if num_partitions is None:
        num_partitions = min(
            32, max(2, int(ray.cluster_resources().get("CPU", 8))))
    if nprobe is None:
        nprobe = max(1, n_clusters // 2)

    # the composition scans ds 2*iters + 3 times (coarse Lloyd, PQ
    # Lloyd, assign, encode, rerank): materialize ONCE so every pass
    # reads object-store blocks instead of re-decoding the source
    ds = ds.materialize()

    assign_ds, coarse = kmeans_exact(ds, vec_col=vec_col, id_col=id_col,
                                     k=n_clusters, iters=iters,
                                     scale=scale, return_centroids=True)
    codes_ds, cents = pq_train_encode(ds, vec_col=vec_col, id_col=id_col,
                                      m=m, k=k_codes, iters=iters,
                                      scale=scale)
    if coarse.shape[1] == 0:
        return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                             "dist": pd.Series(dtype="int64")})
    # the cluster-tagged code table — the layout a deployment persists
    codes = safe_join(codes_ds, assign_ds, "inner", num_partitions,
                      (id_col,))

    q = np.floor(np.asarray(query_vec, dtype=np.float64)
                 * scale + 0.5).astype(np.int64)
    cdiff = q[None, :] - coarse
    cdist = (cdiff * cdiff).sum(axis=1)
    # probe the nprobe nearest clusters; ties break on cluster id
    probe = np.lexsort((np.arange(n_clusters), cdist))[:nprobe]
    probe_arr = np.sort(probe)

    dsub = q.shape[0] // m
    qd = q.reshape(m, dsub)[:, None, :] - cents
    table = (qd * qd).sum(axis=2)  # (m, k_codes) int64
    code_cols = [f"code_{s}" for s in range(m)]

    def adc_partial(batch: pd.DataFrame) -> pd.DataFrame:
        mask = np.isin(batch["cluster"].to_numpy(dtype="int64"),
                       probe_arr)
        batch = batch[mask]
        if not len(batch):
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "adc": pd.Series(dtype="int64")})
        cm = batch[code_cols].to_numpy(dtype="int64")
        adc = np.zeros(len(batch), dtype=np.int64)
        for s in range(m):
            adc += table[s][cm[:, s]]
        out = pd.DataFrame({id_col: batch[id_col].astype("int64"),
                            "adc": adc})
        return out.sort_values(["adc", id_col]).head(shortlist)

    short = codes.map_batches(adc_partial,
                              batch_format="pandas").to_pandas()
    if not len(short):
        return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                             "dist": pd.Series(dtype="int64")})
    short_ids = np.sort(short.sort_values(["adc", id_col])
                        .head(shortlist)[id_col].to_numpy(dtype="int64"))
    ids_arr = pa.array(short_ids, pa.int64())

    def rerank(batch: pa.Table) -> pd.DataFrame:
        batch = batch.filter(pc.is_in(batch[id_col],
                                      value_set=ids_arr))
        if batch.num_rows == 0:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "dist": pd.Series(dtype="int64")})
        mat = _quantize(batch[vec_col].to_pylist(), scale)
        d = mat - q[None, :]
        dist = (d * d).sum(axis=1)
        out = pd.DataFrame({
            id_col: np.asarray(batch[id_col], dtype="int64"),
            "dist": dist.astype("int64")})
        return out.sort_values(["dist", id_col]).head(k_top)

    parts = ds.map_batches(rerank, batch_format="pyarrow").to_pandas()
    return parts.sort_values(["dist", id_col]).head(k_top) \
        .reset_index(drop=True)
