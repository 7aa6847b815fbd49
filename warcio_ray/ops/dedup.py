"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding near-dup.

Scale shapes (SURVEY §2.6 / ray_guide aggregation notes):
  * exact: content-hash column in map_batches -> groupby(hash) keep-first.
    Only (hash, id) rows shuffle, never text.
  * MinHash-LSH: shingle -> minhash signature per batch -> explode to
    (band_id, band_hash, doc_id) rows -> groupby bands -> candidate pairs
    -> Jaccard verify -> connected components by iterated min-label
    propagation (a groupby per iteration, no driver-side union-find on
    the big set).
  * SimHash: 64-bit signature, banded into 4x16-bit chunks for candidate
    generation, verified by Hamming distance.
All hashing is seeded/stable (md5 / blake2b) — no PYTHONHASHSEED.
"""

from __future__ import annotations

import hashlib
from typing import List, Tuple

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def add_md5_batch(batch: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    batch = batch.copy()
    batch["text_hash"] = [hashlib.md5((t or "").encode("utf-8")).hexdigest()
                          for t in batch[col]]
    return batch


def exact_dedup(ds, id_col: str = "doc_id"):
    """Dataset -> survivors (min id per text hash). Matches the SQL oracle
    ``SELECT md5(text) AS text_hash, min(doc_id) AS doc_id GROUP BY 1``."""
    from ray.data.aggregate import Min

    hashed = ds.map_batches(add_md5_batch, batch_format="pandas") \
        .select_columns(["text_hash", id_col])
    return hashed.groupby("text_hash").aggregate(
        Min(id_col, alias_name=id_col))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


class MinHasher:
    """Stateful minhash stage: permutation parameters generated once per
    actor from a fixed seed (actor-pool __init__ pattern)."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3,
                 seed: int = 1234):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k

    def shingles(self, text: str) -> np.ndarray:
        toks = (text or "").split()
        if len(toks) < self.k:
            grams = [" ".join(toks)] if toks else []
        else:
            grams = [" ".join(toks[i:i + self.k])
                     for i in range(len(toks) - self.k + 1)]
        out = np.fromiter(
            (int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(),
                            "big") & _MERSENNE for g in set(grams)),
            dtype=np.uint64, count=len(set(grams)))
        return out

    def signature(self, text: str) -> np.ndarray:
        sh = self.shingles(text)
        if len(sh) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        # (a*x + b) mod p, min over shingles — vectorized outer product
        prod = (sh[None, :] * self.a[:, None] + self.b[:, None]) % np.uint64(_MERSENNE)
        return prod.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([self.signature(t) for t in batch["text"]])
        return pd.DataFrame({"doc_id": batch["doc_id"].astype("int64"),
                             "signature": list(sigs)})


def explode_bands_batch(batch: pd.DataFrame, bands: int = 16) -> pd.DataFrame:
    """signature -> (band_id, band_hash, doc_id) rows (the LSH keys)."""
    rows_per_band = len(batch["signature"].iloc[0]) // bands
    out_doc, out_band, out_hash = [], [], []
    for doc_id, sig in zip(batch["doc_id"], batch["signature"]):
        sig = np.asarray(sig, dtype=np.uint64)
        for b in range(bands):
            chunk = sig[b * rows_per_band:(b + 1) * rows_per_band]
            h = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
            out_doc.append(int(doc_id))
            out_band.append(b)
            out_hash.append(int.from_bytes(h, "big"))
    return pd.DataFrame({"band_id": out_band,
                         "band_hash": np.array(out_hash, dtype=np.uint64),
                         "doc_id": out_doc})


def _pairs_from_bucket(grp: pd.DataFrame) -> pd.DataFrame:
    ids = sorted(set(int(d) for d in grp["doc_id"]))
    if len(ids) < 2:
        return pd.DataFrame({"a": [], "b": []}, dtype="int64")
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pd.DataFrame({"a": a, "b": b})


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    def grams(t):
        toks = (t or "").split()
        if len(toks) < k:
            return {" ".join(toks)} if toks else set()
        return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}

    ga, gb = grams(text_a), grams(text_b)
    if not ga and not gb:
        return 1.0
    inter = len(ga & gb)
    union = len(ga | gb)
    return inter / union if union else 0.0


def minhash_lsh_dedup(ds, threshold: float = 0.7, num_perm: int = 64,
                      bands: int = 16, shingle_k: int = 3,
                      concurrency: int = 2):
    """Full near-dup pipeline. Returns (pairs_df, clusters_df):
    verified duplicate pairs and doc_id -> cluster_id (min-id labels via
    label propagation). Text travels only into the verify step, fetched
    via a broadcast id->text lookup (candidate pairs are rare).
    """
    import ray

    sigs = ds.map_batches(MinHasher, batch_format="pandas",
                          batch_size=512, concurrency=concurrency,
                          num_cpus=0.5,  # never reserve the whole session
                          fn_constructor_kwargs={"num_perm": num_perm,
                                                 "shingle_k": shingle_k})
    bands_ds = sigs.map_batches(explode_bands_batch, batch_format="pandas",
                                fn_kwargs={"bands": bands})
    cand = bands_ds.groupby(["band_id", "band_hash"]) \
        .map_groups(_pairs_from_bucket, batch_format="pandas") \
        .to_pandas().drop_duplicates().reset_index(drop=True)

    if cand.empty:
        return cand, pd.DataFrame({"doc_id": [], "cluster_id": []},
                                  dtype="int64")

    # verify candidates with true n-gram Jaccard (broadcast texts)
    texts = dict(zip(ds.to_pandas()["doc_id"], ds.to_pandas()["text"]))
    texts_ref = ray.put(texts)

    def verify(batch: pd.DataFrame, threshold=threshold, k=shingle_k):
        lookup = ray.get(texts_ref)
        keep = [ngram_jaccard(lookup.get(a), lookup.get(b), k) >= threshold
                for a, b in zip(batch["a"], batch["b"])]
        return batch[pd.Series(keep, index=batch.index)]

    import ray.data
    verified = ray.data.from_pandas(cand) \
        .map_batches(verify, batch_format="pandas").to_pandas()

    clusters = _connected_components(verified)
    return verified.reset_index(drop=True), clusters


def _connected_components(pairs: pd.DataFrame) -> pd.DataFrame:
    """Min-label propagation until fixpoint (pairs are small after
    verification; at scale this is a groupby per iteration)."""
    if pairs.empty:
        return pd.DataFrame({"doc_id": [], "cluster_id": []}, dtype="int64")
    label = {}
    for a, b in zip(pairs["a"], pairs["b"]):
        label.setdefault(int(a), int(a))
        label.setdefault(int(b), int(b))
    changed = True
    while changed:
        changed = False
        for a, b in zip(pairs["a"], pairs["b"]):
            ra, rb = label[int(a)], label[int(b)]
            m = min(ra, rb)
            if ra != m:
                label[int(a)] = m
                changed = True
            if rb != m:
                label[int(b)] = m
                changed = True
    # path-compress to the minimum transitively
    def root(x):
        while label[x] != x:
            label[x] = label[label[x]]
            x = label[x]
        return x
    items = sorted((d, root(d)) for d in label)
    return pd.DataFrame({"doc_id": [d for d, _ in items],
                         "cluster_id": [c for _, c in items]})


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """64-bit SimHash over whitespace tokens + 4x16-bit band keys."""
    out_id, out_sim = [], []
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        acc = np.zeros(64, dtype=np.int64)
        for w in (text or "").split():
            h = np.uint64(int.from_bytes(
                hashlib.blake2b(w.encode(), digest_size=8).digest(), "big"))
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits == 1, 1, -1)
        sim = int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
        out_id.append(int(doc_id))
        out_sim.append(sim)
    df = pd.DataFrame({"doc_id": out_id,
                       "simhash": np.array(out_sim, dtype=np.uint64)})
    for b in range(4):
        df[f"band{b}"] = (df["simhash"] >> np.uint64(16 * b)) & np.uint64(0xFFFF)
    return df


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    # popcount via unpackbits on the byte view
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)


def simhash_dedup(ds, max_hamming: int = 3):
    """SimHash near-dup: band-bucket candidates, Hamming-verified pairs."""
    sims = ds.map_batches(simhash_batch, batch_format="pandas")
    frames = []
    for b in range(4):
        grp = sims.groupby(f"band{b}").map_groups(
            _simhash_pairs_in_bucket, batch_format="pandas")
        frames.append(grp.to_pandas())
    pairs = pd.concat(frames, ignore_index=True).drop_duplicates(
        subset=["a", "b"]).reset_index(drop=True)
    if pairs.empty:
        return pairs
    keep = hamming64(pairs["sim_a"].to_numpy(dtype=np.uint64),
                     pairs["sim_b"].to_numpy(dtype=np.uint64)) <= max_hamming
    return pairs[keep][["a", "b"]].sort_values(["a", "b"]).reset_index(drop=True)


def _simhash_pairs_in_bucket(grp: pd.DataFrame) -> pd.DataFrame:
    rows = sorted(zip(grp["doc_id"].astype("int64"),
                      grp["simhash"].astype("uint64")))
    if len(rows) < 2:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64"),
                             "sim_a": pd.Series(dtype="uint64"),
                             "sim_b": pd.Series(dtype="uint64")})
    a, b, sa, sb = [], [], [], []
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a.append(rows[i][0]); sa.append(rows[i][1])
            b.append(rows[j][0]); sb.append(rows[j][1])
    return pd.DataFrame({"a": a, "b": b,
                         "sim_a": np.array(sa, dtype=np.uint64),
                         "sim_b": np.array(sb, dtype=np.uint64)})
