"""IVF (inverted-file) approximate nearest neighbor — the similarity
search scale path.

Shape: a deterministic k-means (seeded, fixed Lloyd iterations, hash
sample) trains centroids once; an assignment ``map_batches`` stamps each
vector with its nearest centroid (the partition key); a search probes
only the ``nprobe`` centroids closest to each query, so per-query work is
cluster-local instead of corpus-wide. With ``nprobe == n_centroids`` the
search is EXACT and equals brute force — which is how the correctness
oracle checks it (knn_top10's SQL); smaller nprobe trades recall for
read volume.

The persisted form (``build_ivf_layout`` / ``ivf_search_layout``)
writes the assigned table hive-partitioned by ``centroid_id`` plus the
centroid matrix, so a probe READS only its clusters' files — at 100 TB
per-query IO is cluster-local and the train sample stays
O(sample_size) regardless of corpus size.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from warcio_ray.ops.knn import _normalize, _to_matrix

_HASH_MULT = 2654435761  # Knuth multiplicative hash (deterministic sample)


def _sample_mask(vec_ids: np.ndarray, rate_num: int, rate_den: int) -> np.ndarray:
    h = (vec_ids.astype(np.uint64) * np.uint64(_HASH_MULT)) % np.uint64(rate_den)
    return h < np.uint64(rate_num)


def train_centroids(ds, n_centroids: int = 16, sample_size: int = 4096,
                    iters: int = 10, seed: int = 17) -> np.ndarray:
    """Deterministic k-means on a hash-sampled subset.

    The sample is chosen by a fixed multiplicative hash of vec_id (never
    by arrival order), so the same corpus always trains the same
    centroids at any parallelism. Sample collection is O(sample_size);
    Lloyd runs driver-side on the small sample."""
    import pyarrow.compute as pc

    total = ds.count()
    rate_den = 1 << 20
    rate_num = min(rate_den, max(1, int(rate_den * sample_size / max(total, 1))))

    def take_sample(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        mask = _sample_mask(ids, rate_num, rate_den)
        return batch.filter(pa.array(mask))

    # Ray Data does NOT preserve block order: sort the (small) sample by
    # vec_id so k-means init indexing and the float mean's accumulation
    # order are identical at any parallelism — without this, trained
    # centroids (and any nprobe<all search) could vary run to run
    sample = ds.map_batches(take_sample, batch_format="pyarrow").to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    mat = _normalize(_to_matrix(sample["embedding"]))
    if len(mat) < n_centroids:
        raise ValueError(f"sample too small ({len(mat)}) for "
                         f"{n_centroids} centroids")

    rng = np.random.RandomState(seed)
    # k-means++ style init on the sample, deterministic
    centroids = mat[rng.choice(len(mat), size=n_centroids, replace=False)]
    for _ in range(iters):
        sims = mat @ centroids.T                      # cosine on unit vecs
        assign = sims.argmax(axis=1)
        for c in range(n_centroids):
            members = mat[assign == c]
            if len(members):
                m = members.mean(axis=0)
                norm = np.linalg.norm(m)
                if norm > 0:
                    centroids[c] = m / norm
    return centroids


def assign_centroids(ds, centroids: np.ndarray):
    """Vector dataset -> same rows + ``centroid_id`` (the IVF partition
    key). Centroids ship once via ray.put, not per batch."""
    import ray

    cref = ray.put(np.asarray(centroids, dtype=np.float64))

    class Assign:
        def __init__(self):
            self.centroids = ray.get(cref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            vecs = _normalize(_to_matrix(batch["embedding"]))
            assign = (vecs @ self.centroids.T).argmax(axis=1)
            out = batch.copy()
            out["centroid_id"] = assign.astype(np.int32)
            return out

    return ds.map_batches(Assign, batch_format="pandas",
                          batch_size=4096, concurrency=2, num_cpus=0.5)


class _ProbeTopK:
    """map_batches stage: per-batch top-k for every query whose probe
    set intersects the batch's centroids (query matrix + probe sets
    loaded once per actor from the broadcast refs)."""

    def __init__(self, qref, pref, k: int):
        import ray

        self.q = ray.get(qref)
        self.probes = ray.get(pref)
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        vecs = _normalize(_to_matrix(batch["embedding"]))
        cids = batch["centroid_id"].to_numpy().astype(np.int64)
        vec_ids = batch["vec_id"].to_numpy()
        scores = vecs @ self.q.T
        out_q, out_v, out_s = [], [], []
        for qi, probe in enumerate(self.probes):
            mask = np.isin(cids, probe)
            if not mask.any():
                continue
            col = scores[mask, qi]
            vids = vec_ids[mask]
            kk = min(self.k, len(col))
            part = np.argpartition(-col, kk - 1)[:kk]
            kth = col[part].min()
            cand = np.flatnonzero(col >= kth)
            order = cand[np.lexsort((vids[cand], -col[cand]))][:kk]
            out_q.extend([qi] * len(order))
            out_v.extend(int(v) for v in vids[order])
            out_s.extend(float(s) for s in col[order])
        return pd.DataFrame({"query_id": out_q, "vec_id": out_v,
                             "score": out_s})


def _probe_sets(queries_norm: np.ndarray, centroids: np.ndarray,
                nprobe: int):
    """Top-nprobe centroids per query, computed once on the driver
    (tiny); sorted arrays so the per-batch membership mask is np.isin."""
    idx = np.argsort(-(queries_norm @ centroids.T), axis=1)[:, :nprobe]
    return [np.sort(row.astype(np.int64)) for row in idx]


def _probe_and_merge(assigned_ds, qn: np.ndarray, probes, k: int
                     ) -> pd.DataFrame:
    """Shared tail of both search paths: broadcast the query matrix +
    probe sets, run the per-batch top-k stage, merge on the driver."""
    import ray

    qref = ray.put(qn)
    pref = ray.put(probes)
    partials = assigned_ds.map_batches(
        _ProbeTopK, batch_format="pandas", batch_size=4096,
        concurrency=2, num_cpus=0.5,
        fn_constructor_args=(qref, pref, k)).to_pandas()
    return _merge_topk(partials, k)


def _merge_topk(partials: pd.DataFrame, k: int) -> pd.DataFrame:
    out = []
    for qi, grp in partials.groupby("query_id"):
        grp = grp.sort_values(["score", "vec_id"],
                              ascending=[False, True]).head(k)
        out.append(grp)
    if not out:
        return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                             "vec_id": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})
    return pd.concat(out, ignore_index=True)


def ivf_search(ds, queries: np.ndarray, k: int = 10, n_centroids: int = 16,
               nprobe: Optional[int] = None,
               centroids: Optional[np.ndarray] = None) -> pd.DataFrame:
    """ANN top-k per query over an in-stream IVF assignment.
    ``nprobe=None`` probes every centroid (EXACT, equals brute force);
    else only vectors in the nprobe closest clusters per query score.
    Returns (query_id, vec_id, score) sorted by (query_id, -score,
    vec_id), k rows per query."""
    import ray

    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    if centroids is None:
        centroids = train_centroids(ds, n_centroids=n_centroids)
    nprobe = nprobe or len(centroids)

    qn = _normalize(queries)
    probes = _probe_sets(qn, centroids, nprobe)
    return _probe_and_merge(assign_centroids(ds, centroids), qn, probes, k)


# ---------------------------------------------------------------------------
# persisted IVF layout: the 100-TB read path
# ---------------------------------------------------------------------------

def build_ivf_layout(ds, out_dir: str, n_centroids: int = 16,
                     centroids: Optional[np.ndarray] = None,
                     force: bool = False) -> str:
    """Write the assigned vector table hive-partitioned by centroid
    (``centroid=K/``) plus the trained centroid matrix — the persisted
    IVF index. A probe then READS only its clusters' files (file-level
    pruning at the storage layer), so per-query IO is cluster-local no
    matter the corpus size. One distributed pass; ``_DONE`` marker makes
    rebuilds resumable/skippable."""
    import shutil

    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker) and not force:
        # validate the cached layout against THIS request: a stale index
        # built with different centroids silently returns wrong
        # neighbors. Centroid count always checks; an explicitly passed
        # matrix checks bitwise. (A changed dataset with identical
        # centroids is undetectable here — pass force=True.)
        old = np.load(os.path.join(out_dir, "centroids.npy"))
        want_n = len(centroids) if centroids is not None else n_centroids
        if len(old) == want_n and (
                centroids is None or np.array_equal(
                    old, np.asarray(centroids, dtype=np.float64))):
            return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    if centroids is None:
        centroids = train_centroids(ds, n_centroids=n_centroids)
    np.save(os.path.join(out_dir, "centroids.npy"),
            np.asarray(centroids, dtype=np.float64))
    assign_centroids(ds, centroids).write_parquet(
        os.path.join(out_dir, "vectors"), partition_cols=["centroid_id"])
    with open(marker, "w") as f:
        f.write(str(len(centroids)))
    return out_dir


def ivf_search_layout(layout_dir: str, queries: np.ndarray, k: int = 10,
                      nprobe: Optional[int] = None) -> pd.DataFrame:
    """ANN top-k over a persisted IVF layout: only the partitions in the
    union of the queries' probe sets are read at all. Same output
    contract as ``ivf_search`` (and identical results for the same
    centroids/nprobe)."""
    import ray
    import ray.data

    centroids = np.load(os.path.join(layout_dir, "centroids.npy"))
    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    nprobe = nprobe or len(centroids)
    qn = _normalize(queries)
    probes = _probe_sets(qn, centroids, nprobe)

    needed = sorted({int(c) for p in probes for c in p})
    # base layout + every COMMITTED append generation, or the
    # compacted root that absorbed them — still cluster-pruned
    roots, _ = _ivf_roots(layout_dir)
    paths = [os.path.join(layout_dir, r, f"centroid_id={c}")
             for r in roots for c in needed]
    paths = [p for p in paths if os.path.isdir(p)]
    if not paths:
        return _merge_topk(pd.DataFrame(
            {"query_id": [], "vec_id": [], "score": []}), k)

    def restore_cid(batch: pd.DataFrame) -> pd.DataFrame:
        # hive-partitioned files don't store the partition column, and
        # reading leaf dirs directly skips partition inference: recover
        # centroid_id from each file's path
        cids = batch["path"].str.extract(r"centroid_id=(\d+)")[0] \
            .astype("int64")
        batch = batch.drop(columns=["path"])
        batch["centroid_id"] = cids
        return batch

    ds = ray.data.read_parquet(paths, file_extensions=["parquet"],
                               include_paths=True) \
        .map_batches(restore_cid, batch_format="pandas")
    return _probe_and_merge(ds, qn, probes, k)


def _ivf_roots(layout_dir: str):
    """Current root dirs of an IVF layout: base ``vectors`` + committed
    generations, unless a compaction entry (``replaces_base``)
    absorbed everything before it. Shared by search and compaction."""
    import json

    gens = []
    gen_path = os.path.join(layout_dir, "generations.json")
    if os.path.exists(gen_path):
        with open(gen_path) as f:
            gens = json.load(f)
    last_compact = max((i for i, g in enumerate(gens)
                        if g.get("replaces_base")), default=None)
    if last_compact is None:
        return ["vectors"] + [g["dir"] for g in gens], gens
    return [g["dir"] for g in gens[last_compact:]], gens


def compact_ivf_layout(layout_dir: str) -> str:
    """Merge the base + every committed append generation into ONE
    fresh centroid-partitioned dir — the FAISS-side segment merge
    keeping per-probe file counts bounded as `IVF.add` generations
    accumulate. Observationally a no-op: assignments are immutable
    under the frozen codebook, so any search reads the same vector
    multiset before and after.

    Same commit protocol as search.compact_postings_layout: merged
    rows land uncommitted in ``vectors_c<N>/``, ONE atomic
    ``generations.json`` rewrite installs the ``replaces_base`` entry
    (carrying absorbed tags so replayed appends stay no-ops),
    absorbed dirs reclaimed after commit. Monotonic c-numbering so a
    retry can never rmtree its own input. Single writer assumed."""
    import json
    import re
    import shutil

    import ray.data

    marker = os.path.join(layout_dir, "_DONE")
    if not os.path.exists(marker):
        raise FileNotFoundError(
            f"compact_ivf_layout: no built layout at {layout_dir} "
            "(run build_ivf_layout first)")

    roots, gens = _ivf_roots(layout_dir)
    if len(roots) <= 1:
        return layout_dir  # single root: nothing to merge

    prev_c = max((int(m.group(1)) for g in gens
                  if (m := re.fullmatch(r"vectors_c(\d+)", g["dir"]))),
                 default=0)
    comp_dir = f"vectors_c{prev_c + 1}"
    shutil.rmtree(os.path.join(layout_dir, comp_dir),
                  ignore_errors=True)
    paths = [os.path.join(layout_dir, r) for r in roots]
    paths = [p for p in paths if os.path.isdir(p)]

    def restore_cid(batch: pd.DataFrame) -> pd.DataFrame:
        cids = batch["path"].str.extract(r"centroid_id=(\d+)")[0] \
            .astype("int64")
        batch = batch.drop(columns=["path"])
        batch["centroid_id"] = cids
        return batch

    ray.data.read_parquet(paths, file_extensions=["parquet"],
                          include_paths=True) \
        .map_batches(restore_cid, batch_format="pandas") \
        .write_parquet(os.path.join(layout_dir, comp_dir),
                       partition_cols=["centroid_id"])

    absorbed = sorted({g["tag"] for g in gens} |
                      {t for g in gens
                       for t in g.get("absorbed_tags", [])})
    new_gens = [{"tag": f"__compact_{prev_c + 1}__",
                 "dir": comp_dir, "replaces_base": True,
                 "absorbed_tags": absorbed}]
    gen_path = os.path.join(layout_dir, "generations.json")
    tmp = gen_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(new_gens, f)
    os.replace(tmp, gen_path)

    for r in roots:
        shutil.rmtree(os.path.join(layout_dir, r), ignore_errors=True)
    return layout_dir


def append_ivf_layout(ds_new, layout_dir: str, batch_tag: str) -> str:
    """Append NEW vectors to a standing IVF index using its STORED
    centroids — the FAISS `IVF.add` ingestion path (assignments use
    the frozen codebook; retraining is a rebuild, not an append).
    Completes the incremental-layout family (exact / LSH / CDXJ /
    postings / IVF).

    Only the delta is assigned — O(new vectors) work, base partitions
    untouched. Each append batch writes its own generation dir
    (``vectors_g<N>/centroid_id=K/``) and COMMITS by atomically
    rewriting ``generations.json``; torn appends are invisible and a
    repeated ``batch_tag`` is a no-op (same protocol as
    search.append_postings_layout)."""
    import json
    import shutil

    marker = os.path.join(layout_dir, "_DONE")
    if not os.path.exists(marker):
        raise FileNotFoundError(
            f"append_ivf_layout: no built layout at {layout_dir} "
            "(run build_ivf_layout first)")
    centroids = np.load(os.path.join(layout_dir, "centroids.npy"))

    gen_path = os.path.join(layout_dir, "generations.json")
    gens = []
    if os.path.exists(gen_path):
        with open(gen_path) as f:
            gens = json.load(f)
    if any(g["tag"] == batch_tag or
           batch_tag in g.get("absorbed_tags", []) for g in gens):
        return layout_dir

    gen_dir = f"vectors_g{len(gens) + 1}"
    # clear any torn (uncommitted) attempt at this generation number
    shutil.rmtree(os.path.join(layout_dir, gen_dir), ignore_errors=True)
    assign_centroids(ds_new, centroids).write_parquet(
        os.path.join(layout_dir, gen_dir),
        partition_cols=["centroid_id"])

    gens.append({"tag": batch_tag, "dir": gen_dir})
    tmp = gen_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(gens, f)
    os.replace(tmp, gen_path)
    return layout_dir
