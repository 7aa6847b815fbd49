"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding near-dup.

Scale shapes (SURVEY §2.6 / ray_guide aggregation notes):
  * exact: content-hash column in map_batches -> groupby(hash) keep-first.
    Only (hash, id) rows shuffle, never text.
  * MinHash-LSH: shingle -> minhash signature per batch (Arrow
    fixed_size_list column) -> explode to (band_id, band_hash, doc_id)
    rows -> ``candidate_pairs`` (ONE hash-shuffle into ~32 partitions,
    numpy run-length sweep per partition; hot buckets CAPPED with
    explicit drop accounting, never silent) -> distributed pair dedup ->
    Jaccard verify via a double hash JOIN attaching text_a/text_b (one
    row per pair, vectorized verify; only candidate texts ever shuffle,
    the corpus never reaches the driver) -> connected components on the
    (small) verified set.
  * SimHash: 64-bit signature, melted to 4x16-bit band rows in ONE
    pass, same candidate_pairs path with the signature riding along,
    Hamming verified in a vectorized map_batches.
All hashing is seeded/stable (md5 / blake2b) — no PYTHONHASHSEED.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

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

    from warcio_ray.ops.blocks import arrow_blocks

    hashed = ds.map_batches(add_md5_batch, batch_format="pandas") \
        .select_columns(["text_hash", id_col])
    # arrow blocks: Ray's aggregate is per-ROW Python on pandas blocks
    return arrow_blocks(hashed).groupby("text_hash").aggregate(
        Min(id_col, alias_name=id_col))


def incremental_dedup(new_ds, seen_ds, id_col: str = "doc_id",
                      num_partitions: Optional[int] = None):
    """Cross-snapshot exact dedup: drop rows of ``new_ds`` whose text
    hash already appears in ``seen_ds`` (the monthly-recrawl shape: a
    fresh crawl deduplicated against the standing corpus index).

    Scale shape: both sides reduce to (text_hash) / (text_hash, id)
    projections before the ONE hash-partitioned ``left_anti`` join —
    document text never shuffles; survivors come back via a second hash
    join on the id column (ids + 16-byte hashes only in both exchanges).
    The seen side is distinct-ed first so a heavily duplicated standing
    corpus doesn't inflate the anti-join build side.

    ``new_ds`` must carry only primitive columns (acero joins reject
    nested non-key fields — see ROUND3_NOTES perf learning 9); project
    T2-shaped inputs down to (id, text, ...) scalars first.
    """
    from warcio_ray.ops.blocks import safe_join

    import ray
    from ray.data.aggregate import Count

    if num_partitions is None:
        # two JoinOperators chained: partition counts above the
        # session's CPU count starve each other's aggregator pools on
        # small sessions (observed 4-cpu hang at 32) — and at scale
        # partitions ~ cores is the right width anyway
        num_partitions = min(
            32, max(2, int(ray.cluster_resources().get("CPU", 8))))

    new_keys = new_ds.map_batches(add_md5_batch, batch_format="pandas") \
        .select_columns(["text_hash", id_col])
    from warcio_ray.ops.blocks import arrow_blocks

    seen_keys = arrow_blocks(
        seen_ds.map_batches(add_md5_batch, batch_format="pandas")
        .select_columns(["text_hash"])) \
        .groupby("text_hash").aggregate(Count(alias_name="_n")) \
        .select_columns(["text_hash"])
    survivors = safe_join(new_keys, seen_keys, "left_anti",
                          num_partitions, ("text_hash",))
    ids = survivors.select_columns([id_col])
    return safe_join(new_ds, ids, "inner", num_partitions, (id_col,))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1

# LSH buckets above this many distinct ids are truncated (the smallest
# ids are kept) and the drop is surfaced in the result — one hot bucket
# (all-empty docs, boilerplate) otherwise goes O(n^2)
MAX_BUCKET = 512

# sentinel rows (a = b = _DROP_SENTINEL) carry per-bucket drop counts
# through the pair stream so truncation is accounted, never silent
_DROP_SENTINEL = -1


def _shingle_set(text: str, k: int) -> set:
    toks = (text or "").split()
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


class MinHasher:
    """Stateful minhash stage: permutation parameters generated once per
    actor from a fixed seed (actor-pool __init__ pattern). Emits the
    signature as an Arrow fixed_size_list<uint64> column (hashable
    schema, vectorized banding downstream)."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3,
                 seed: int = 1234):
        rng = np.random.RandomState(seed)
        # a < 2^32 keeps every partial product below 2^64 in the split
        # 128-bit-safe reduction in signature(); b ranges over the full
        # field -> a TRUE (a*x+b) mod p universal family over 64-bit
        # shingle hashes (32-bit hashes birthday-collide at ~2^16
        # distinct shingles, i.e. long web pages, biasing Jaccard up)
        self.a = rng.randint(1, 1 << 32, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k

    def shingles(self, text: str) -> np.ndarray:
        uniq = _shingle_set(text, self.k)
        return np.fromiter(
            (int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(),
                            "big") for g in uniq),
            dtype=np.uint64, count=len(uniq))

    def signature(self, text: str) -> np.ndarray:
        sh = self.shingles(text)
        if len(sh) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        # (a*x + b) mod p over 64-bit x without 128-bit ints: split
        # x = xh*2^32 + xl (xh, xl < 2^32; a < 2^32, so both partial
        # products are EXACT in uint64), then fold t*2^32 mod p via
        # 2^61 ≡ 1 (mod p):  t*2^32 = (t>>29)*2^61 + ((t<<32) & MASK61)
        #                          ≡ (t>>29) + ((t<<32) & MASK61)
        # each term < p + 2^32, and the final 3-term sum < 2^63 — exact.
        p = np.uint64(_MERSENNE)
        mask61 = np.uint64(_MERSENNE)
        xh = sh >> np.uint64(32)
        xl = sh & np.uint64(0xFFFFFFFF)
        with np.errstate(over="ignore"):
            t = (self.a[:, None] * xh[None, :]) % p
            t = ((t << np.uint64(32)) & mask61) + (t >> np.uint64(29))
            lo = (self.a[:, None] * xl[None, :]) % p
            prod = (t + lo + self.b[:, None]) % p
        return prod.min(axis=1)

    def __call__(self, batch) -> pa.Table:
        if isinstance(batch, pa.Table):
            doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            texts = batch["text"].to_pylist()
        else:
            doc_ids = batch["doc_id"].to_numpy()
            texts = list(batch["text"])
        if len(texts):
            sigs = np.stack([self.signature(t) for t in texts])
        else:
            sigs = np.zeros((0, self.num_perm), dtype=np.uint64)
        sig_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1), pa.uint64()), self.num_perm)
        return pa.table({"doc_id": pa.array(doc_ids.astype("int64")),
                         "signature": sig_arr})


# worker-process-global MinHasher cache: the permutation state is cheap
# to build but per-BATCH rebuilds would still waste work — a module
# global gives init-once-per-worker without paying actor-pool spin-up
# (the pool's only advantage here, measured ~5 s at session start)
_MINHASHER_CACHE: dict = {}


def minhash_batch(batch, num_perm: int = 64, shingle_k: int = 3,
                  seed: int = 1234) -> pa.Table:
    key = (num_perm, shingle_k, seed)
    mh = _MINHASHER_CACHE.get(key)
    if mh is None:
        mh = _MINHASHER_CACHE.setdefault(key, MinHasher(num_perm, shingle_k,
                                                        seed))
    return mh(batch)


def _mix_bands(mat: np.ndarray, bands: int) -> np.ndarray:
    """(n, num_perm) uint64 -> (n, bands) uint64 band hashes, fully
    vectorized (splitmix-style fold per band, wrapping mul is fine for
    bucketing)."""
    n, num_perm = mat.shape
    rpb = num_perm // bands
    out = np.empty((n, bands), dtype=np.uint64)
    C = np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        for b in range(bands):
            h = np.full(n, np.uint64(b + 1), dtype=np.uint64)
            for c in range(rpb):
                h = (h ^ mat[:, b * rpb + c]) * C
                h ^= h >> np.uint64(29)
            out[:, b] = h
    return out


def explode_bands_batch(batch: pa.Table, bands: int = 16) -> pa.Table:
    """signature -> (band_id, band_hash, doc_id) rows (the LSH keys)."""
    if isinstance(batch, pd.DataFrame):  # tolerate pandas callers
        batch = pa.Table.from_pandas(batch)
    n = len(batch)
    sig = batch["signature"].combine_chunks()
    num_perm = sig.type.list_size
    mat = np.asarray(sig.flatten()).reshape(n, num_perm)
    hashes = _mix_bands(mat, bands)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype("int64")
    # row-major reshape: doc0's bands 0..B-1, then doc1's, ...
    return pa.table({
        "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
        "band_hash": pa.array(hashes.reshape(-1), pa.uint64()),
        "doc_id": pa.array(np.repeat(doc_ids, bands)),
    })


_PAIRS_SCHEMA = {"a": "int64", "b": "int64", "n_dropped": "int64"}

# candidate generation shuffles into this many PARTITIONS (not one group
# per bucket): Ray's per-group map_groups costs ~1-5 ms of machinery per
# group, which dominated when every LSH bucket was its own group (~8000
# groups -> 11 s at sf0.01); inside a partition the buckets are
# processed with a numpy run-length sweep
N_PAIR_PARTITIONS = 32


def _pairs_from_partition(df: pd.DataFrame, key_cols: List[str],
                          max_bucket: int,
                          value_col: Optional[str] = None) -> pd.DataFrame:
    """All (a, b) candidate pairs per bucket within one partition.
    Buckets = distinct key_cols combos; ids deduped + sorted per bucket;
    buckets over max_bucket truncated to the smallest ids with a
    sentinel drop row. ``value_col`` (e.g. simhash) rides along as
    ``val_a``/``val_b``."""
    cols = [*key_cols, "doc_id"] + ([value_col] if value_col else [])
    df = df[cols].drop_duplicates([*key_cols, "doc_id"]) \
        .sort_values([*key_cols, "doc_id"], kind="mergesort")
    ids = df["doc_id"].to_numpy(dtype="int64")
    vals = df[value_col].to_numpy() if value_col else None
    # bucket boundaries via run-length over the sorted key columns.
    # Compare COLUMN BY COLUMN: a combined df[key_cols].to_numpy() on
    # mixed int32/uint64 promotes to float64, where distinct 64-bit
    # hashes can compare EQUAL (2^63 == 2^63+1 in float64) and adjacent
    # buckets silently merge
    if len(df) == 0:
        starts = np.array([], dtype=np.int64)
        ends = starts
    else:
        change = np.zeros(len(df), dtype=bool)
        change[0] = True
        for kc in key_cols:
            col = df[kc].to_numpy()
            change[1:] |= col[1:] != col[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(df))
    a_out, b_out, va_out, vb_out = [], [], [], []
    dropped = 0
    for s, e in zip(starts, ends):
        n = e - s
        if n > max_bucket:
            dropped += int(n - max_bucket)
            e = s + max_bucket
            n = max_bucket
        if n < 2:
            continue
        ai, bi = np.triu_indices(n, k=1)
        a_out.append(ids[s:e][ai])
        b_out.append(ids[s:e][bi])
        if value_col:
            va_out.append(vals[s:e][ai])
            vb_out.append(vals[s:e][bi])
    out = {"a": (np.concatenate(a_out) if a_out
                 else np.array([], dtype="int64")),
           "b": (np.concatenate(b_out) if b_out
                 else np.array([], dtype="int64"))}
    if value_col:
        out["val_a"] = (np.concatenate(va_out) if va_out
                        else np.array([], dtype="uint64"))
        out["val_b"] = (np.concatenate(vb_out) if vb_out
                        else np.array([], dtype="uint64"))
    res = pd.DataFrame(out)
    res["n_dropped"] = np.int64(0)
    if dropped:
        sent = {"a": [_DROP_SENTINEL], "b": [_DROP_SENTINEL],
                "n_dropped": [dropped]}
        if value_col:
            sent["val_a"] = np.array([0], dtype="uint64")
            sent["val_b"] = np.array([0], dtype="uint64")
        res = pd.concat([res, pd.DataFrame(sent)], ignore_index=True)
    return res.astype({"a": "int64", "b": "int64", "n_dropped": "int64"})


def candidate_pairs(rows_ds, key_cols: List[str], max_bucket: int,
                    value_col: Optional[str] = None,
                    num_partitions: int = N_PAIR_PARTITIONS):
    """(key_cols..., doc_id[, value_col]) rows -> candidate (a, b) pairs
    Dataset (+ sentinel drop rows). One hash-shuffle into
    ``num_partitions`` groups; buckets never split across partitions
    because the partition key is derived from the bucket key."""

    import zlib

    def _col_hash(col: pd.Series) -> np.ndarray:
        """Batch-stable per-column hash. NEVER pandas hash_pandas_object
        here: its khash path truncates object strings at NUL bytes and
        proved batch-UNSTABLE for such keys, silently splitting buckets
        across partitions (lost pairs; see round-2 notes)."""
        if pd.api.types.is_integer_dtype(col):
            return col.to_numpy().astype(np.uint64, copy=False)
        return np.fromiter(
            (zlib.crc32(str(v).encode("utf-8")) for v in col),
            dtype=np.uint64, count=len(col))

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        h = np.zeros(len(batch), dtype=np.uint64)
        C = np.uint64(0x9E3779B97F4A7C15)
        with np.errstate(over="ignore"):
            for kc in key_cols:
                h = (h ^ _col_hash(batch[kc])) * C
                h ^= h >> np.uint64(29)
        batch["_part"] = (h % np.uint64(num_partitions)).astype("int32")
        return batch

    parted = rows_ds.map_batches(add_part, batch_format="pandas")
    return parted.groupby("_part").map_groups(
        _pairs_from_partition, batch_format="pandas",
        fn_kwargs={"key_cols": key_cols, "max_bucket": max_bucket,
                   "value_col": value_col})


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    ga, gb = _shingle_set(text_a, k), _shingle_set(text_b, k)
    if not ga and not gb:
        return 1.0
    inter = len(ga & gb)
    union = len(ga | gb)
    return inter / union if union else 0.0


def _sum_dropped(materialized_pairs_ds) -> int:
    """Total ids truncated out of hot buckets, summed from the sentinel
    rows (the single place the sentinel protocol is decoded)."""
    import pyarrow.compute as pc

    dropped = materialized_pairs_ds.filter(
        expr=f"a == {_DROP_SENTINEL}") \
        .map_batches(lambda t: pa.table(
            {"n": pa.array([int(pc.sum(t["n_dropped"]).as_py() or 0)],
                           pa.int64())}), batch_format="pyarrow")
    dropped_df = dropped.to_pandas()  # empty filter result has no columns
    return int(dropped_df["n"].sum()) if "n" in dropped_df.columns else 0


def _dedup_pairs(pairs_ds, extra_cols: Tuple[str, ...] = ()):
    """Distributed (a, b) pair dedup: one row survives per pair (extra
    columns ride along — they are keyed by the pair's docs, so every
    duplicate carries identical values and the surviving row is
    deterministic). Splits off the drop-sentinel rows; returns
    (deduped pairs Dataset, total dropped ids).

    Shape: ONE pair-hash shuffle into a bounded number of partitions,
    then a vectorized ``drop_duplicates`` sweep per partition — never a
    per-pair map_groups (the original groupby(["a","b"]).map_groups
    built millions of one-row pandas groups on gram-dense corpora:
    containment_join at sf0.1 spent ~9 minutes there vs seconds here)."""
    import ray

    # pairs are bucket-capped -> bounded; materialize once so the two
    # filter branches below don't re-execute the whole upstream pipeline
    pairs_ds = pairs_ds.materialize()
    n_dropped = _sum_dropped(pairs_ds)
    real = pairs_ds.filter(expr=f"a != {_DROP_SENTINEL}")

    cols = ["a", "b", *extra_cols]
    n_parts = min(64, max(2, int(ray.cluster_resources().get("CPU", 8))))

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch["a"].to_numpy("int64").astype(np.uint64)
        b = batch["b"].to_numpy("int64").astype(np.uint64)
        C1 = np.uint64(0x9E3779B97F4A7C15)
        C2 = np.uint64(0xC2B2AE3D27D4EB4F)
        with np.errstate(over="ignore"):
            h = (a * C1) ^ (b * C2)
            h ^= h >> np.uint64(31)
        out = batch[cols].copy()
        out["_part"] = (h % np.uint64(n_parts)).astype("int64")
        return out

    def sweep(grp: pd.DataFrame) -> pd.DataFrame:
        return grp.drop_duplicates(["a", "b"])[cols]

    deduped = real.map_batches(add_part, batch_format="pandas") \
        .groupby("_part").map_groups(sweep, batch_format="pandas")
    return deduped, n_dropped


def attach_pair_payloads(pairs_ds, ds, id_col: str, payload_col: str,
                         payload_type: "pa.DataType",
                         out_a: str, out_b: str,
                         encode_batch=None, num_partitions: int = 8):
    """Hash-join candidate pairs back to a per-id payload column — the
    scale-safe verify fetch (VERDICT r1 item 2). Two joins attach
    ``out_a``/``out_b`` so each pair stays ONE row and verification runs
    as a vectorized map_batches (a per-pair map_groups was ~1k tiny
    pandas groups and dominated sf0.01 wall time). Only candidate
    payloads ever shuffle (broadcast-id pre-filter); nothing corpus-sized
    reaches the driver. ``encode_batch(values) -> pa.Array`` optionally
    re-encodes the payload (e.g. list<float> -> binary, which Arrow's
    join requires)."""
    import ray

    # candidate id set is small (pairs are rare, buckets capped): collect
    # just the distinct ids to broadcast-filter the corpus scan
    ids_df = pairs_ds.map_batches(
        lambda t: pa.table({id_col: pa.concat_arrays([
            t["a"].combine_chunks().cast(pa.int64()),
            t["b"].combine_chunks().cast(pa.int64())]).unique()}),
        batch_format="pyarrow").to_pandas()
    id_arr = pa.array(np.unique(ids_df[id_col].to_numpy(dtype="int64")),
                      pa.int64())
    id_ref = ray.put(id_arr)

    def keep_candidates(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        wanted = ray.get(id_ref)
        mask = pc.is_in(batch[id_col].combine_chunks().cast(pa.int64()),
                        value_set=wanted)
        kept = batch.filter(mask)
        payload = kept[payload_col]
        if encode_batch is not None:
            payload = encode_batch(payload)
        return pa.table({
            id_col: kept[id_col].combine_chunks().cast(pa.int64()),
            payload_col: payload,
        })

    from warcio_ray.ops.blocks import drop_empty_blocks

    # tiny; both joins below probe it. drop_empty_blocks: zero-schema
    # empty blocks (possible whenever ds came through a groupby/join
    # chain) poison the hash-shuffle join — see ops/blocks.py
    cand_rows = drop_empty_blocks(
        ds.map_batches(keep_candidates, batch_format="pyarrow"))

    def rename_norm(ds_in, mapping: dict, schema: pa.Schema):
        """Rename + normalize: empty hash-join partitions come back as
        zero-COLUMN tables, which breaks the next join's key lookup —
        stamp every block with the explicit output schema."""
        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or t.num_columns == 0:
                return schema.empty_table()
            t = t.rename_columns([mapping.get(c, c) for c in t.column_names])
            return t.select(schema.names).cast(schema)
        return ds_in.map_batches(fn, batch_format="pyarrow")

    s1 = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                    (out_a, payload_type)])
    s2 = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                    (out_a, payload_type), (out_b, payload_type)])
    # sanitize the pairs side too (same zero-schema empty-block hazard)
    j1 = drop_empty_blocks(pairs_ds) \
        .join(cand_rows, join_type="inner",
              num_partitions=num_partitions,
              on=("a",), right_on=(id_col,))
    # repartition between the joins: a join emits zero-COLUMN empty
    # partitions that bypass map_batches untouched and crash the second
    # join's key lookup; the (pairs-sized) repartition coalesces them
    j1 = rename_norm(j1, {payload_col: out_a}, s1) \
        .repartition(num_partitions)
    j2 = j1.join(cand_rows, join_type="inner",
                 num_partitions=num_partitions,
                 on=("b",), right_on=(id_col,))
    return rename_norm(j2, {payload_col: out_b}, s2)


def _attach_pair_texts(pairs_ds, ds, num_partitions: int = 8):
    return attach_pair_payloads(pairs_ds, ds, "doc_id", "text",
                                pa.string(), "text_a", "text_b",
                                num_partitions=num_partitions)


def minhash_lsh_dedup_ds(ds, threshold: float = 0.7, num_perm: int = 64,
                         bands: int = 16, shingle_k: int = 3,
                         max_bucket: int = MAX_BUCKET):
    """Dataset-returning near-dup core — the bounded-driver path.
    Returns (verified_pairs_ds, n_dropped): a MATERIALIZED Dataset of
    verified (a, b) pairs plus the hot-bucket drop count. NOTHING
    edge-set-sized touches the driver; pair clusters come from
    ``connected_components_ds(verified_pairs_ds)`` when needed."""
    sigs = ds.map_batches(minhash_batch, batch_format="pyarrow",
                          batch_size=512,
                          fn_kwargs={"num_perm": num_perm,
                                     "shingle_k": shingle_k})
    bands_ds = sigs.map_batches(explode_bands_batch, batch_format="pyarrow",
                                fn_kwargs={"bands": bands})
    raw_pairs = candidate_pairs(bands_ds, ["band_id", "band_hash"],
                                max_bucket)
    cand, n_dropped = _dedup_pairs(raw_pairs)
    cand = cand.materialize()  # small, capped; reused for ids + join sides
    if cand.count() == 0:
        import ray.data
        empty_ds = ray.data.from_pandas(pd.DataFrame(
            {"a": pd.Series(dtype="int64"),
             "b": pd.Series(dtype="int64")}))
        return empty_ds, n_dropped

    joined = _attach_pair_texts(cand.select_columns(["a", "b"]),
                                ds.select_columns(["doc_id", "text"]))

    def verify_batch(batch: pd.DataFrame, threshold=threshold,
                     k=shingle_k) -> pd.DataFrame:
        keep = [ngram_jaccard(ta, tb, k) >= threshold
                for ta, tb in zip(batch["text_a"], batch["text_b"])]
        out = batch.loc[keep, ["a", "b"]]
        return out.astype({"a": "int64", "b": "int64"})

    verified_ds = joined.map_batches(verify_batch,
                                     batch_format="pandas").materialize()
    return verified_ds, n_dropped


def minhash_lsh_dedup(ds, threshold: float = 0.7, num_perm: int = 64,
                      bands: int = 16, shingle_k: int = 3,
                      max_bucket: int = MAX_BUCKET,
                      max_rows: int = 5_000_000):
    """Full near-dup pipeline, driver-convenience form. Returns
    (pairs_df, clusters_df): verified duplicate pairs and doc_id ->
    cluster_id (min-id labels). ``pairs_df.attrs['lsh_dropped_ids']``
    carries the number of ids truncated out of hot LSH buckets
    (0 normally).

    NOTE: this wrapper materializes the verified pairs as pandas by
    contract — at corpus scales where that is itself too large, use
    ``minhash_lsh_dedup_ds`` + ``connected_components_ds`` and keep
    everything a Dataset. The clusters here still run distributed above
    CC_DISTRIBUTED_THRESHOLD (the union-find CPU bound hits long before
    the pairs-DataFrame memory bound)."""
    from warcio_ray.ops.blocks import guarded_to_pandas

    verified_ds, n_dropped = minhash_lsh_dedup_ds(
        ds, threshold=threshold, num_perm=num_perm, bands=bands,
        shingle_k=shingle_k, max_bucket=max_bucket)
    n_verified = verified_ds.count()
    verified = guarded_to_pandas(verified_ds, "minhash_lsh_dedup",
                                 "minhash_lsh_dedup_ds", max_rows)
    verified = verified.sort_values(["a", "b"]).reset_index(drop=True) \
        if len(verified) else pd.DataFrame({"a": pd.Series(dtype="int64"),
                                            "b": pd.Series(dtype="int64")})
    verified.attrs["lsh_dropped_ids"] = n_dropped
    if n_verified > CC_DISTRIBUTED_THRESHOLD:
        clusters = connected_components_ds(verified_ds).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
    else:
        clusters = _connected_components(verified)
    return verified, clusters


# verified-pair sets above this size run connected components as the
# distributed star-contraction loop instead of the in-process union-find
CC_DISTRIBUTED_THRESHOLD = 200_000

# star-contraction shuffles into this many partitions; inside each the
# per-node min/emit kernels are vectorized pandas groupbys
N_CC_PARTITIONS = 32


def _cc_add_part(batch: pd.DataFrame, key: str,
                 num_partitions: int) -> pd.DataFrame:
    h = batch[key].to_numpy().astype(np.uint64, copy=True)
    C = np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        h = (h ^ (h >> np.uint64(30))) * C
        h ^= h >> np.uint64(29)
    batch = batch.copy()
    batch["_part"] = (h % np.uint64(num_partitions)).astype("int32")
    return batch


def _cc_large_star_kernel(df: pd.DataFrame) -> pd.DataFrame:
    """Partition of mirrored (node, nbr) rows -> large-star edges:
    for each node u, every strictly larger neighbor connects to
    min(N(u) ∪ {u}). Fully vectorized (groupby-min + map)."""
    df = df[["node", "nbr"]].drop_duplicates()
    if not len(df):
        return pd.DataFrame({"u": pd.Series(dtype="int64"),
                             "v": pd.Series(dtype="int64")})
    mn = df.groupby("node")["nbr"].min()
    m = np.minimum(mn.to_numpy(), mn.index.to_numpy())
    m_of = pd.Series(m, index=mn.index)
    mm = df["node"].map(m_of).to_numpy()
    keep = df["nbr"].to_numpy() > df["node"].to_numpy()
    out = pd.DataFrame({"u": df["nbr"].to_numpy()[keep],
                        "v": mm[keep]}).drop_duplicates()
    return out.astype({"u": "int64", "v": "int64"})


def _cc_small_star_kernel(df: pd.DataFrame) -> pd.DataFrame:
    """Partition of max->min directed (u, v) rows -> small-star edges:
    every smaller neighbor (and u itself) connects to min(N(u))."""
    df = df[["u", "v"]].drop_duplicates()
    if not len(df):
        return df.astype({"u": "int64", "v": "int64"})
    mn = df.groupby("u")["v"].min()
    mm = df["u"].map(mn).to_numpy()
    vs = df["v"].to_numpy()
    keep = vs != mm
    out = pd.concat([
        pd.DataFrame({"u": vs[keep], "v": mm[keep]}),
        pd.DataFrame({"u": mn.index.to_numpy(), "v": mn.to_numpy()}),
    ], ignore_index=True).drop_duplicates()
    return out.astype({"u": "int64", "v": "int64"})


def _cc_checksum(edges_ds) -> Tuple[int, int]:
    """Order-independent (count, sum-of-edge-hashes) fingerprint of a
    materialized edge Dataset — O(1) driver state per round."""
    def fp(batch: pd.DataFrame) -> pd.DataFrame:
        u = batch["u"].to_numpy().astype(np.uint64)
        v = batch["v"].to_numpy().astype(np.uint64)
        C1 = np.uint64(0x9E3779B97F4A7C15)
        C2 = np.uint64(0xC2B2AE3D27D4EB4F)
        with np.errstate(over="ignore"):
            h = (u * C1) ^ (v * C2)
            h ^= h >> np.uint64(29)
            s = h.sum(dtype=np.uint64)
        # dtype MUST be pinned uint64: a bare python int >= 2^63 in one
        # block and < 2^63 in another gives mixed int64/uint64 blocks,
        # which Ray's concat silently promotes to float64 — truncating
        # the fingerprint to a 53-bit mantissa compare
        return pd.DataFrame({"n": np.array([len(batch)], dtype=np.int64),
                             "s": np.array([s], dtype=np.uint64)})

    out = edges_ds.map_batches(fp, batch_format="pandas").to_pandas()
    if "n" not in out.columns or not len(out):
        return 0, 0
    return int(out["n"].sum()), int(out["s"].to_numpy(
        dtype=np.uint64).sum(dtype=np.uint64))


def connected_components_ds(edges_ds, num_partitions: int = N_CC_PARTITIONS,
                            max_iters: int = 64):
    """Distributed connected components over an (a, b) edge Dataset via
    alternating large-star / small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14): converges
    in O(log n) practical rounds with bounded intermediate edge sets.

    Each half-round is ONE hash shuffle of the (bounded) edge set; the
    per-partition kernels are vectorized pandas groupbys — never a
    per-node map_groups. The driver loop holds only an O(1)
    (count, hash) fingerprint per round, never the edges.

    Returns a Dataset (doc_id, cluster_id): every endpoint labeled with
    its component's minimum id — identical semantics to the in-process
    ``_connected_components``.
    """
    def canon(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch["a"].to_numpy(dtype="int64")
        b = batch["b"].to_numpy(dtype="int64")
        keep = a != b
        a, b = a[keep], b[keep]
        return pd.DataFrame({"u": np.maximum(a, b), "v": np.minimum(a, b)})

    edges = edges_ds.map_batches(canon, batch_format="pandas").materialize()
    prev = _cc_checksum(edges)
    if prev[0] == 0:
        import ray.data
        return ray.data.from_pandas(pd.DataFrame(
            {"doc_id": pd.Series(dtype="int64"),
             "cluster_id": pd.Series(dtype="int64")}))

    def mirror(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.concat([
            pd.DataFrame({"node": batch["u"].to_numpy(dtype="int64"),
                          "nbr": batch["v"].to_numpy(dtype="int64")}),
            pd.DataFrame({"node": batch["v"].to_numpy(dtype="int64"),
                          "nbr": batch["u"].to_numpy(dtype="int64")}),
        ], ignore_index=True)

    for _ in range(max_iters):
        # large star: mirrored rows, group by node
        large = edges.map_batches(mirror, batch_format="pandas") \
            .map_batches(_cc_add_part, batch_format="pandas",
                         fn_kwargs={"key": "node",
                                    "num_partitions": num_partitions}) \
            .groupby("_part").map_groups(_cc_large_star_kernel,
                                         batch_format="pandas")
        # small star: output is already max->min directed (u > v)
        edges = large.map_batches(_cc_add_part, batch_format="pandas",
                                  fn_kwargs={"key": "u",
                                             "num_partitions": num_partitions}) \
            .groupby("_part").map_groups(_cc_small_star_kernel,
                                         batch_format="pandas").materialize()
        cur = _cc_checksum(edges)
        if cur == prev:
            break
        prev = cur

    # at convergence every component is a star on its min id: label each
    # endpoint with min(neighbors ∪ self) in one partition sweep
    def label_kernel(df: pd.DataFrame) -> pd.DataFrame:
        mn = df.groupby("node")["nbr"].min()
        lab = np.minimum(mn.to_numpy(), mn.index.to_numpy())
        return pd.DataFrame({"doc_id": mn.index.to_numpy(dtype="int64"),
                             "cluster_id": lab.astype("int64")})

    return edges.map_batches(mirror, batch_format="pandas") \
        .map_batches(_cc_add_part, batch_format="pandas",
                     fn_kwargs={"key": "node",
                                "num_partitions": num_partitions}) \
        .groupby("_part").map_groups(label_kernel, batch_format="pandas")


def _connected_components(pairs: pd.DataFrame) -> pd.DataFrame:
    """Min-label propagation until fixpoint (the in-process path for
    post-verification pair sets below CC_DISTRIBUTED_THRESHOLD; larger
    sets go through ``connected_components_ds``)."""
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
    """64-bit SimHash over whitespace tokens. Token hashes are computed
    once per distinct token in the batch; the per-doc bit accumulation is
    vectorized via unpackbits (no per-bit Python loop).

    Token hashes are md5-derived (first 16 hex chars -> uint64) —
    deliberately SQL-derivable (DuckDB:
    CAST('0x' || substr(md5(w),1,16) AS UBIGINT)) so the whole
    simhash -> band -> Hamming-verify chain can be hard-oracled."""
    vocab: dict = {}

    def tok_hash(w: str) -> int:
        h = vocab.get(w)
        if h is None:
            h = int(hashlib.md5(w.encode("utf-8")).hexdigest()[:16], 16)
            vocab[w] = h
        return h

    out_id, out_sim = [], []
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        toks = (text or "").split()
        if toks:
            hs = np.fromiter((tok_hash(w) for w in toks), dtype=np.uint64,
                             count=len(toks))
            # bits: (n_words, 64), little-endian bit order per uint64
            bits = np.unpackbits(
                hs.view(np.uint8).reshape(-1, 8), axis=1,
                bitorder="little").astype(np.int32)
            acc = 2 * bits.sum(axis=0) - len(toks)
            sim = int(((acc > 0).astype(np.uint64) * weights).sum())
        else:
            sim = 0
        out_id.append(int(doc_id))
        out_sim.append(sim)
    return pd.DataFrame({"doc_id": np.array(out_id, dtype="int64"),
                         "simhash": np.array(out_sim, dtype=np.uint64)})


def melt_simhash_bands(batch: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, simhash) -> 4 rows (band_id, band_key, doc_id, simhash):
    ONE pass, one downstream groupby for all bands."""
    sims = batch["simhash"].to_numpy(dtype=np.uint64)
    ids = batch["doc_id"].to_numpy(dtype="int64")
    n = len(batch)
    frames = []
    for b in range(4):
        frames.append(pd.DataFrame({
            "band_id": np.full(n, b, dtype=np.int32),
            "band_key": ((sims >> np.uint64(16 * b)) & np.uint64(0xFFFF)),
            "doc_id": ids,
            "simhash": sims,
        }))
    return pd.concat(frames, ignore_index=True)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    # popcount via unpackbits on the byte view
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)


def simhash_dedup(ds, max_hamming: int = 3,
                  max_bucket: int = MAX_BUCKET) -> pd.DataFrame:
    """SimHash near-dup: melted band rows -> one groupby -> distributed
    pair dedup -> vectorized Hamming verify. Returns sorted (a, b) with
    ``attrs['lsh_dropped_ids']`` drop accounting."""
    sims = ds.map_batches(simhash_batch, batch_format="pandas")
    melted = sims.map_batches(melt_simhash_bands, batch_format="pandas")
    raw_pairs = candidate_pairs(melted, ["band_id", "band_key"],
                                max_bucket, value_col="simhash")
    deduped, n_dropped = _dedup_pairs(raw_pairs,
                                      extra_cols=("val_a", "val_b"))

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return batch[["a", "b"]]
        keep = hamming64(batch["val_a"].to_numpy(dtype=np.uint64),
                         batch["val_b"].to_numpy(dtype=np.uint64)) \
            <= max_hamming
        return batch[keep][["a", "b"]]

    out = deduped.map_batches(verify, batch_format="pandas").to_pandas()
    out = out.sort_values(["a", "b"]).reset_index(drop=True) if len(out) \
        else pd.DataFrame({"a": pd.Series(dtype="int64"),
                           "b": pd.Series(dtype="int64")})
    out.attrs["lsh_dropped_ids"] = n_dropped
    return out


# ---------------------------------------------------------------------------
# exact n-gram Jaccard similarity join (prefix filtering)
# ---------------------------------------------------------------------------

def _prefix_grams(text: str, k: int, threshold: float,
                  hot_ranks: Optional[dict] = None) -> List[str]:
    """Prefix-filter index keys: under ANY fixed total order of grams,
    two docs with Jaccard >= t must share a gram in each other's first
    |S| - ceil(t*|S|) + 1 grams — so only those are indexed (the
    PPJoin-style candidate bound; the rest of the set never shuffles).

    ``hot_ranks`` (gram -> frequency rank of the globally most frequent
    grams) refines the total order to rarest-first: grams NOT in the hot
    set sort first (lexicographically), hot grams last ordered by
    ascending frequency — so prefixes are built from the rarest grams
    and hot-gram index buckets shrink. Any consistent total order keeps
    the exactness guarantee."""
    import math

    gram_set = _shingle_set(text, k)
    if not gram_set:
        return []
    if hot_ranks:
        grams = sorted(gram_set,
                       key=lambda g: (1, hot_ranks[g], g) if g in hot_ranks
                       else (0, 0, g))
    else:
        grams = sorted(gram_set)
    keep = len(grams) - math.ceil(threshold * len(grams)) + 1
    return grams[:keep]


def _hot_gram_ranks(ds, shingle_k: int, top_n: int = 1024) -> dict:
    """gram -> rank for the ``top_n`` globally most frequent grams
    (ascending frequency = lower rank). One distributed pass: per-batch
    partial counts -> small groupby -> driver top-n. The broadcast stays
    O(top_n) regardless of corpus size."""
    from ray.data.aggregate import Sum

    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: "Counter" = __import__("collections").Counter()
        for text in batch["text"]:
            c.update(_shingle_set(text, shingle_k))
        if not c:
            return pd.DataFrame({"gram": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        return pd.DataFrame({"gram": list(c.keys()),
                             "n": np.fromiter(c.values(), dtype="int64")})

    from warcio_ray.ops.blocks import arrow_blocks

    counts = arrow_blocks(
        ds.map_batches(partial_counts, batch_format="pandas")) \
        .groupby("gram").aggregate(Sum("n", alias_name="n")) \
        .sort("n", descending=True).limit(top_n).to_pandas()
    counts = counts.sort_values(["n", "gram"]).reset_index(drop=True)
    return {g: i for i, g in enumerate(counts["gram"])}


def jaccard_similarity_join(ds, threshold: float = 0.5, shingle_k: int = 3,
                            max_bucket: int = MAX_BUCKET,
                            df_order: bool = True) -> pd.DataFrame:
    """EXACT similarity join: all pairs of docs with n-gram Jaccard >=
    threshold (empty-text docs excluded — they have no grams). Unlike the
    MinHash pipeline this has no false negatives, so it is hard-oracle
    checkable against DuckDB's list_intersect arithmetic.

    Shape: prefix grams -> inverted-index groupby(gram) -> candidate
    pairs (capped hot grams, accounted) -> distributed pair dedup ->
    verify via the same text join-back as MinHash. Verification compares
    2*intersection >= union in INTEGERS so the threshold boundary is
    exact on both engines (threshold=0.5 only; other thresholds compare
    in float).
    """
    def index_batch(batch: pd.DataFrame) -> pd.DataFrame:
        import ray

        ranks = ray.get(ranks_ref)
        doc_ids, grams = [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            for g in _prefix_grams(text, shingle_k, threshold, ranks):
                doc_ids.append(int(doc_id))
                grams.append(g)
        return pd.DataFrame({"gram": grams,
                             "doc_id": np.array(doc_ids, dtype="int64")})

    import ray

    # rarest-first prefix ordering (df_order): one distributed
    # gram-count pass feeds an O(top_n) broadcast of the hottest grams,
    # shrinking candidate pairs (-30% on sf0.01) and flattening hot
    # index buckets. The extra pass costs ~1 corpus scan — a win at
    # scale, overhead at toy corpora (flag off to skip). Any consistent
    # total order preserves exactness, so results are identical.
    ranks_ref = ray.put(_hot_gram_ranks(ds, shingle_k) if df_order else None)
    inv = ds.map_batches(index_batch, batch_format="pandas")
    raw_pairs = candidate_pairs(inv, ["gram"], max_bucket)
    cand, n_dropped = _dedup_pairs(raw_pairs)
    cand = cand.materialize()
    empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                          "b": pd.Series(dtype="int64")})
    empty.attrs["lsh_dropped_ids"] = n_dropped
    if cand.count() == 0:
        return empty

    joined = _attach_pair_texts(cand.select_columns(["a", "b"]),
                                ds.select_columns(["doc_id", "text"]))

    def verify_batch(batch: pd.DataFrame) -> pd.DataFrame:
        keep = []
        for ta, tb in zip(batch["text_a"], batch["text_b"]):
            ga = _shingle_set(ta, shingle_k)
            gb = _shingle_set(tb, shingle_k)
            inter = len(ga & gb)
            union = len(ga | gb)
            if threshold == 0.5:
                keep.append(union > 0 and 2 * inter >= union)
            else:
                keep.append(union > 0 and inter / union >= threshold)
        out = batch.loc[keep, ["a", "b"]]
        return out.astype({"a": "int64", "b": "int64"})

    out = joined.map_batches(verify_batch, batch_format="pandas").to_pandas()
    if not len(out):
        return empty
    out = out.sort_values(["a", "b"]).reset_index(drop=True)
    out.attrs["lsh_dropped_ids"] = n_dropped
    return out


# ---------------------------------------------------------------------------
# benchmark decontamination (eval-set n-gram overlap)
# ---------------------------------------------------------------------------

def decontaminate(ds, eval_texts: List[str], shingle_k: int = 3,
                  min_overlap: int = 1) -> "pd.DataFrame":
    """Flag training docs sharing >= min_overlap k-gram shingles with a
    (small) eval/benchmark set — the standard pretraining
    decontamination pass. The eval shingle set is broadcast ONCE via
    ray.put (it is small by definition: benchmarks are thousands of
    docs, not billions); the scan is a stateless map_batches, no
    shuffle. Returns (doc_id, n_overlap) for flagged docs, sorted."""
    import ray

    eval_grams = frozenset().union(
        *(_shingle_set(t, shingle_k) for t in eval_texts)) \
        if eval_texts else frozenset()
    gref = ray.put(eval_grams)

    def flag(batch: pd.DataFrame) -> pd.DataFrame:
        grams = ray.get(gref)
        ids, overlaps = [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            n = len(_shingle_set(text, shingle_k) & grams)
            if n >= min_overlap:
                ids.append(int(doc_id))
                overlaps.append(n)
        return pd.DataFrame({"doc_id": np.array(ids, dtype="int64"),
                             "n_overlap": np.array(overlaps,
                                                   dtype="int64")})

    out = ds.map_batches(flag, batch_format="pandas").to_pandas()
    if not len(out):
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "n_overlap": pd.Series(dtype="int64")})
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# asymmetric n-gram containment join (doc-inside-doc detection)
# ---------------------------------------------------------------------------

def containment_join(ds, threshold_num: int = 4, threshold_den: int = 5,
                     shingle_k: int = 3,
                     max_bucket: int = MAX_BUCKET) -> pd.DataFrame:
    """EXACT asymmetric containment join: directed pairs (a, b) where
    |grams(a) ∩ grams(b)| / |grams(a)| >= threshold_num/threshold_den —
    doc a is (near-)CONTAINED in doc b. The asymmetric sibling of
    ``jaccard_similarity_join``: Jaccard misses a snippet quoted inside
    a much larger page (union is dominated by the big doc), containment
    is the signal wrapper pages / quotations / syndicated excerpts
    actually emit. Standard curation pass (SSJoin/PPJoin literature's
    containment variant; CCNet-style excerpt filtering).

    Exactness: any pair with containment >= t > 0 shares at least one
    gram, so the shared-gram inverted index loses no candidates (the
    hot-bucket cap is the only truncation and it is ACCOUNTED in
    ``.attrs['dropped_ids']``). The threshold comparison is pure
    integer (inter * den >= num * |A|) — no float boundary.

    Shape: all-distinct-gram explode -> one hash shuffle into gram
    buckets (candidate_pairs) -> distributed pair dedup -> hash-join
    texts back -> vectorized-per-pair verify emitting BOTH directions.
    Scale note: the contained side only needs its
    |A| - ceil(t*|A|) + 1 rarest grams indexed (directed PPJoin prefix
    bound), but the CONTAINER side must index every gram regardless, so
    bucket sizes — the scale hazard — are identical either way; the
    prefix refinement only trims verify candidates and is skipped here
    for oracle-exactness of the candidate set.

    Returns a DataFrame (a, b, n_common, n_a) sorted by (a, b); docs
    with zero grams (empty text) never appear on either side.
    """
    if threshold_num < 1 or threshold_den < 1:
        raise ValueError("containment threshold must be positive")

    def index_batch(batch: pd.DataFrame) -> pd.DataFrame:
        doc_ids, grams = [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            for g in _shingle_set(text, shingle_k):
                doc_ids.append(int(doc_id))
                grams.append(g)
        return pd.DataFrame({"gram": grams,
                             "doc_id": np.array(doc_ids, dtype="int64")})

    inv = ds.map_batches(index_batch, batch_format="pandas")
    raw_pairs = candidate_pairs(inv, ["gram"], max_bucket)
    cand, n_dropped = _dedup_pairs(raw_pairs)
    cand = cand.materialize()
    empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                          "b": pd.Series(dtype="int64"),
                          "n_common": pd.Series(dtype="int64"),
                          "n_a": pd.Series(dtype="int64")})
    empty.attrs["dropped_ids"] = n_dropped
    if cand.count() == 0:
        return empty

    joined = _attach_pair_texts(cand.select_columns(["a", "b"]),
                                ds.select_columns(["doc_id", "text"]))

    def verify_batch(batch: pd.DataFrame) -> pd.DataFrame:
        a_o, b_o, nc_o, na_o = [], [], [], []
        for a, b, ta, tb in zip(batch["a"], batch["b"],
                                batch["text_a"], batch["text_b"]):
            ga = _shingle_set(ta, shingle_k)
            gb = _shingle_set(tb, shingle_k)
            inter = len(ga & gb)
            if not inter:
                continue
            if inter * threshold_den >= threshold_num * len(ga):
                a_o.append(int(a)); b_o.append(int(b))
                nc_o.append(inter); na_o.append(len(ga))
            if inter * threshold_den >= threshold_num * len(gb):
                a_o.append(int(b)); b_o.append(int(a))
                nc_o.append(inter); na_o.append(len(gb))
        return pd.DataFrame({
            "a": np.array(a_o, dtype="int64"),
            "b": np.array(b_o, dtype="int64"),
            "n_common": np.array(nc_o, dtype="int64"),
            "n_a": np.array(na_o, dtype="int64")})

    out = joined.map_batches(verify_batch,
                             batch_format="pandas").to_pandas()
    if not len(out):
        return empty
    out = out.sort_values(["a", "b"]).reset_index(drop=True)
    out.attrs["dropped_ids"] = n_dropped
    return out


# ---------------------------------------------------------------------------
# paragraph-level exact dedup
# ---------------------------------------------------------------------------

_PARA_POS_BITS = 20  # positions per doc packed into the low bits of k


def paragraph_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                    sep: str = "\n\n",
                    num_partitions: Optional[int] = None):
    """Corpus-wide paragraph-level exact dedup (the Gopher / CCNet
    cleaning primitive): every paragraph that appears more than once in
    the WHOLE corpus is kept only at its first occurrence — ordered by
    (doc id, position) — and removed everywhere else; each doc's
    surviving paragraphs are re-joined in their original order (a doc
    whose every paragraph is owned elsewhere comes back empty, not
    dropped — row count is stable).

    Scale shape: paragraphs explode to (hash, k) rows where k packs
    (id << 20 | position) into one int64 — 16-byte blake2b hex + one
    int64 per paragraph, text never enters the wide exchange. The
    winner per paragraph is ONE ``groupby(hash).min(k)`` (unbounded key
    space -> real aggregate over arrow blocks, not a driver fold), the
    keep decision is one hash join back to the narrow exploded rows,
    and surviving positions travel to the rebuild as a per-doc csv
    string so the only join that touches document text is the final
    (id)-keyed one, where text moves exactly once.

    Determinism / oracle: the winner rule is an integer min, so results
    are partitioning-invariant; DuckDB reproduces the whole chain with
    string_split + zipped unnest + min() + string_agg(ORDER BY pos).
    The Ray side groups on a 128-bit blake2b of the paragraph instead
    of the paragraph text itself (collision odds ~2^-64 at corpus
    scale; the SQL oracle would surface any).

    No reference counterpart (warcio has no text-cleaning layer); the
    operator family is SURVEY §2.7 (training-data dedup).
    """
    import ray
    from ray.data.aggregate import Min

    from warcio_ray.ops.blocks import arrow_blocks, safe_join

    if num_partitions is None:
        num_partitions = min(
            32, max(2, int(ray.cluster_resources().get("CPU", 8))))
    cap = 1 << _PARA_POS_BITS

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].fillna("").astype(str)
        # regex=False: pandas >=1.4 treats a multi-char sep as a regex
        # by default, while rebuild() uses Python's LITERAL str.split —
        # a sep with metacharacters ('. ', '* ') would desync kept
        # positions between the two stages
        parts = texts.str.split(sep, regex=False)
        lens = parts.str.len().to_numpy(dtype="int64")
        ids = batch[id_col].to_numpy(dtype="int64")
        if len(lens) and int(lens.max()) >= cap:
            raise ValueError(
                f"doc with >= 2^{_PARA_POS_BITS} paragraphs; raise "
                "_PARA_POS_BITS (k packs id and position in one int64)")
        if len(ids) and int(ids.max()) >= (1 << (62 - _PARA_POS_BITS)):
            raise ValueError(f"{id_col} too large to pack with "
                             f"{_PARA_POS_BITS} position bits")
        rep_ids = np.repeat(ids, lens)
        starts = np.repeat(np.cumsum(lens) - lens, lens)
        pos = np.arange(int(lens.sum()), dtype="int64") - starts
        paras = [p for lst in parts for p in lst]
        h = [hashlib.blake2b(p.encode("utf-8"), digest_size=16).hexdigest()
             for p in paras]
        return pd.DataFrame({"h": h, "k": rep_ids * cap + pos})

    exploded = ds.map_batches(explode, batch_format="pandas")
    # unbounded key space (distinct paragraphs) -> real groupby; arrow
    # blocks because Ray's aggregate is per-row Python on pandas blocks
    winners = arrow_blocks(exploded).groupby("h").aggregate(
        Min("k", alias_name="wk"))

    def keep_positions(batch: pd.DataFrame) -> pd.DataFrame:
        kept = batch.loc[batch["k"] == batch["wk"], "k"]
        k = kept.to_numpy(dtype="int64")
        return pd.DataFrame({id_col: k // cap, "pos": k % cap})

    kept = safe_join(exploded, winners, "inner", num_partitions, ("h",)) \
        .map_batches(keep_positions, batch_format="pandas")

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch["_part"] = (batch[id_col] % num_partitions).astype("int32")
        return batch

    def csv_partition(grp: pd.DataFrame) -> pd.DataFrame:
        # one group per PARTITION (not per doc): Ray's per-group
        # dispatch costs ~ms, so docs fold inside with a pandas agg
        grp = grp.sort_values([id_col, "pos"], kind="mergesort")
        out = grp.assign(_s=grp["pos"].astype(str)) \
            .groupby(id_col, sort=False)["_s"] \
            .agg(",".join).reset_index(name="keep_csv")
        out[id_col] = out[id_col].astype("int64")
        return out

    kept_csv = kept.map_batches(add_part, batch_format="pandas") \
        .groupby("_part").map_groups(csv_partition, batch_format="pandas")
    joined = safe_join(ds.select_columns([id_col, text_col]), kept_csv,
                       "left_outer", num_partitions, (id_col,))

    def rebuild(batch: pd.DataFrame) -> pd.DataFrame:
        # per-doc variable-length list indexing has no vectorized
        # kernel; this loop is O(docs) string work, same cost class as
        # the split in explode
        out = []
        for text, csv in zip(batch[text_col].fillna(""),
                             batch["keep_csv"]):
            if not isinstance(csv, str):
                out.append("")  # every paragraph owned elsewhere
            else:
                parts = text.split(sep)
                out.append(sep.join(
                    parts[i] for i in (int(x) for x in csv.split(","))))
        return pd.DataFrame({id_col: batch[id_col].to_numpy(dtype="int64"),
                             text_col: out})

    return joined.map_batches(rebuild, batch_format="pandas")


# ---------------------------------------------------------------------------
# persisted LSH band-bucket layout (incremental near-dup lookups)
# ---------------------------------------------------------------------------

def build_lsh_layout(ds, out_dir: str, num_perm: int = 64,
                     bands: int = 16, shingle_k: int = 3,
                     seed: int = 1234, n_buckets: int = 64,
                     force: bool = False) -> str:
    """Persist the corpus's MinHash-LSH band rows —
    (band_id, band_hash, doc_id) — hive-partitioned by
    ``bucket = band_hash % n_buckets``: the near-dup sibling of the
    postings (`ops/search.py`) and IVF (`ops/ivf.py`) layouts. A probe
    document then READS ONLY the buckets its own band hashes land in,
    so checking fresh documents against a standing 100 TB corpus costs
    bucket-local IO instead of a corpus rescan (the incremental
    companion of ``incremental_dedup``'s exact path).

    One distributed pass (signatures -> band explode -> partitioned
    write); ``_DONE`` carries the layout params so mismatched reuse is
    rejected."""
    import os
    import shutil

    params = f"{num_perm},{bands},{shingle_k},{seed},{n_buckets}"
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker) and not force:
        if open(marker).read().strip() == params:
            return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def bucketize(batch: pa.Table) -> pa.Table:
        bh = batch["band_hash"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array((bh % np.uint64(n_buckets))
                               .astype("int64")))

    ds.map_batches(minhash_batch, batch_format="pyarrow",
                   fn_kwargs={"num_perm": num_perm,
                              "shingle_k": shingle_k, "seed": seed}) \
        .map_batches(explode_bands_batch, batch_format="pyarrow",
                     fn_kwargs={"bands": bands}) \
        .map_batches(bucketize, batch_format="pyarrow") \
        .write_parquet(os.path.join(out_dir, "bands"),
                       partition_cols=["bucket"])
    with open(marker, "w") as f:
        f.write(params)
    return out_dir


def lsh_layout_neardups(layout_dir: str, probes: pd.DataFrame, docs_ds,
                        threshold: float = 0.5, num_perm: int = 64,
                        bands: int = 16, shingle_k: int = 3,
                        seed: int = 1234, n_buckets: int = 64,
                        max_bucket: int = MAX_BUCKET,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> pd.DataFrame:
    """Verified near-duplicates of a (small) probe set against the
    persisted layout: probe signatures on the driver (probes are small
    by definition), a PRUNED read of only the buckets the probes hash
    into, a vectorized two-column merge per batch for candidates
    (per-probe-band candidates capped at ``max_bucket``, count surfaced
    in ``attrs['lsh_dropped_candidates']``), candidate texts fetched
    with ONE ``pc.is_in`` scan of ``docs_ds``, exact shingle-Jaccard
    verify. Returns (a, b) with a < b, sorted; only candidate rows and
    candidate texts ever reach the driver."""
    import os

    import pyarrow.compute as pc
    import ray.data

    mh = MinHasher(num_perm, shingle_k, seed)
    pids = probes[id_col].to_numpy(dtype="int64")
    ptexts = list(probes[text_col].fillna(""))
    if not len(pids):
        out = pd.DataFrame({"a": pd.Series(dtype="int64"),
                            "b": pd.Series(dtype="int64")})
        out.attrs["lsh_dropped_candidates"] = 0
        return out
    sigs = np.stack([mh.signature(t) for t in ptexts])
    bh = _mix_bands(sigs, bands)  # (n_probes, bands)
    probe_bands = pd.DataFrame({
        "band_id": np.tile(np.arange(bands, dtype=np.int32), len(pids)),
        "band_hash": bh.reshape(-1),
        "probe_id": np.repeat(pids, bands)})

    needed = sorted({int(x) % n_buckets
                     for x in probe_bands["band_hash"].to_numpy()})
    paths = [os.path.join(layout_dir, "bands", f"bucket={b}")
             for b in needed]
    paths = [p for p in paths if os.path.isdir(p)]
    dropped = 0
    if paths:
        def candidates(batch: pd.DataFrame) -> pd.DataFrame:
            m = batch.merge(probe_bands, on=["band_id", "band_hash"])
            m = m[m["doc_id"] != m["probe_id"]]
            capped = m.groupby(["probe_id", "band_id", "band_hash"],
                               sort=False).head(max_bucket)
            n_drop = len(m) - len(capped)
            out = capped[["probe_id", "doc_id"]].drop_duplicates()
            out = out.astype({"probe_id": "int64", "doc_id": "int64"})
            out["n_drop"] = np.int64(0)
            if n_drop:  # ride the drop count on a sentinel row
                out = pd.concat([out, pd.DataFrame(
                    {"probe_id": [np.int64(_DROP_SENTINEL)],
                     "doc_id": [np.int64(_DROP_SENTINEL)],
                     "n_drop": [np.int64(n_drop)]})],
                    ignore_index=True)
            return out

        cand = ray.data.read_parquet(paths, file_extensions=["parquet"]) \
            .map_batches(candidates, batch_format="pandas").to_pandas()
        if len(cand):
            dropped = int(cand.loc[cand["probe_id"] == _DROP_SENTINEL,
                                   "n_drop"].sum())
            cand = cand[cand["probe_id"] != _DROP_SENTINEL]
        cand = cand[["probe_id", "doc_id"]].drop_duplicates()
    else:
        cand = pd.DataFrame({"probe_id": pd.Series(dtype="int64"),
                             "doc_id": pd.Series(dtype="int64")})

    pairs = []
    if len(cand):
        need_ids = pa.array(np.unique(cand["doc_id"].to_numpy()),
                            pa.int64())

        def fetch(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.is_in(batch[id_col],
                                         value_set=need_ids))

        cand_docs = docs_ds.map_batches(fetch, batch_format="pyarrow") \
            .to_pandas().set_index(id_col)[text_col]
        probe_sh = {int(i): _shingle_set(t, shingle_k)
                    for i, t in zip(pids, ptexts)}
        for pid, did in zip(cand["probe_id"], cand["doc_id"]):
            ct = cand_docs.get(int(did))
            if ct is None:
                continue
            sa = probe_sh[int(pid)]
            sb = _shingle_set(ct or "", shingle_k)
            union = len(sa | sb)
            if union and len(sa & sb) / union >= threshold:
                pairs.append((min(int(pid), int(did)),
                              max(int(pid), int(did))))
    out = pd.DataFrame(sorted(set(pairs)), columns=["a", "b"]) \
        if pairs else pd.DataFrame({"a": pd.Series(dtype="int64"),
                                    "b": pd.Series(dtype="int64")})
    out.attrs["lsh_dropped_candidates"] = dropped
    return out


def append_lsh_layout(new_ds, layout_dir: str, num_perm: int = 64,
                      bands: int = 16, shingle_k: int = 3,
                      seed: int = 1234, n_buckets: int = 64) -> str:
    """Append a FRESH batch's band rows to an existing persisted LSH
    layout — the incremental companion ``incremental_dedup`` has for
    exact hashes: the standing corpus is never re-signed. Same one
    distributed pass as ``build_lsh_layout``; Ray names output files
    uniquely per run, so writing into the same hive bucket partitions
    appends instead of clobbering. The ``_DONE`` params must match the
    layout's (a signature under different params would silently never
    collide)."""
    import os

    params = f"{num_perm},{bands},{shingle_k},{seed},{n_buckets}"
    marker = os.path.join(layout_dir, "_DONE")
    if not os.path.exists(marker):
        raise ValueError(f"no completed LSH layout at {layout_dir}")
    have = open(marker).read().strip()
    if have != params:
        raise ValueError(
            f"layout params {have} != append params {params}")

    def bucketize(batch: pa.Table) -> pa.Table:
        bh = batch["band_hash"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array((bh % np.uint64(n_buckets))
                               .astype("int64")))

    new_ds.map_batches(minhash_batch, batch_format="pyarrow",
                       fn_kwargs={"num_perm": num_perm,
                                  "shingle_k": shingle_k,
                                  "seed": seed}) \
        .map_batches(explode_bands_batch, batch_format="pyarrow",
                     fn_kwargs={"bands": bands}) \
        .map_batches(bucketize, batch_format="pyarrow") \
        .write_parquet(os.path.join(layout_dir, "bands"),
                       partition_cols=["bucket"])
    return layout_dir


def _probe_pairs_partition(df: pd.DataFrame,
                           max_bucket: int) -> pd.DataFrame:
    """One partition of side-tagged band rows (side 1 = fresh probes,
    side 0 = layout members) -> candidate (a, b) pairs: probes merge
    members on the band key, self-matches drop, each (probe, band
    bucket) keeps the ``max_bucket`` smallest member ids (sentinel
    drop accounting, same protocol as _pairs_from_partition)."""
    cols = ["band_id", "band_hash", "doc_id"]
    probes = df.loc[df["side"] == 1, cols].drop_duplicates()
    members = df.loc[df["side"] == 0, cols].drop_duplicates()
    empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                          "b": pd.Series(dtype="int64"),
                          "n_dropped": pd.Series(dtype="int64")})
    if not len(probes) or not len(members):
        return empty
    m = probes.merge(members, on=["band_id", "band_hash"],
                     suffixes=("_p", "_m"))
    m = m[m["doc_id_p"] != m["doc_id_m"]]
    if not len(m):
        return empty
    m = m.sort_values(["band_id", "band_hash", "doc_id_p", "doc_id_m"],
                      kind="mergesort")
    capped = m.groupby(["band_id", "band_hash", "doc_id_p"],
                       sort=False).head(max_bucket)
    dropped = len(m) - len(capped)
    pa_ = capped["doc_id_p"].to_numpy(dtype="int64")
    ma_ = capped["doc_id_m"].to_numpy(dtype="int64")
    out = pd.DataFrame({"a": np.minimum(pa_, ma_),
                        "b": np.maximum(pa_, ma_)}).drop_duplicates()
    out["n_dropped"] = np.int64(0)
    if dropped:
        out = pd.concat([out, pd.DataFrame(
            {"a": [np.int64(_DROP_SENTINEL)],
             "b": [np.int64(_DROP_SENTINEL)],
             "n_dropped": [np.int64(dropped)]})], ignore_index=True)
    return out.astype(_PAIRS_SCHEMA)


def lsh_append_dedup(layout_dir: str, new_ds, corpus_ds,
                     threshold: float = 0.5, num_perm: int = 64,
                     bands: int = 16, shingle_k: int = 3,
                     seed: int = 1234, n_buckets: int = 64,
                     max_bucket: int = MAX_BUCKET,
                     num_partitions: int = N_PAIR_PARTITIONS):
    """Near-dup pairs of a FRESH batch against a standing persisted
    layout, fully distributed (the Dataset sibling of the driver-probe
    ``lsh_layout_neardups``): fresh docs sign once, ONLY the layout
    buckets their band hashes land in are read (pruned hive read),
    one band-key hash shuffle joins probes to members, and candidates
    verify by exact shingle-Jaccard with texts fetched through the
    broadcast-id pair join (``attach_pair_payloads``) over
    ``corpus_ds`` (standing ∪ fresh). Call AFTER ``append_lsh_layout``
    so fresh-fresh duplicates are found through their layout copies
    (self-pairs are excluded by id).

    At 100 TB: the standing corpus contributes only bucket-local IO —
    nothing corpus-sized is re-signed, shuffled, or collected. Returns
    (verified_pairs_ds of (a, b) with a < b, n_dropped)."""
    import os

    import ray.data

    fresh = new_ds.map_batches(minhash_batch, batch_format="pyarrow",
                               fn_kwargs={"num_perm": num_perm,
                                          "shingle_k": shingle_k,
                                          "seed": seed}) \
        .map_batches(explode_bands_batch, batch_format="pyarrow",
                     fn_kwargs={"bands": bands}).materialize()

    def bucket_partial(t: pa.Table) -> pa.Table:
        bh = t["band_hash"].to_numpy(zero_copy_only=False)
        return pa.table({"bucket": pa.array(np.unique(
            (bh % np.uint64(n_buckets)).astype("int64")))})

    # <= n_buckets rows ever reach the driver
    bdf = fresh.map_batches(bucket_partial,
                            batch_format="pyarrow").to_pandas()
    empty_pairs = ray.data.from_pandas(pd.DataFrame(
        {"a": pd.Series(dtype="int64"),
         "b": pd.Series(dtype="int64")}))
    if not len(bdf):
        return empty_pairs, 0
    needed = sorted(set(bdf["bucket"].astype(int)))
    paths = [os.path.join(layout_dir, "bands", f"bucket={b}")
             for b in needed]
    paths = [p for p in paths if os.path.isdir(p)]
    if not paths:
        return empty_pairs, 0
    members = ray.data.read_parquet(paths, file_extensions=["parquet"],
                                    columns=["band_id", "band_hash",
                                             "doc_id"])

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            t = t.select(["band_id", "band_hash", "doc_id"])
            return t.append_column(
                "side", pa.array(np.full(t.num_rows, side,
                                         dtype="int8")))
        return fn

    rows = members.map_batches(tag(0), batch_format="pyarrow").union(
        fresh.map_batches(tag(1), batch_format="pyarrow"))

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        C = np.uint64(0x9E3779B97F4A7C15)
        with np.errstate(over="ignore"):
            h = batch["band_id"].to_numpy().astype(np.uint64)
            h = (h ^ batch["band_hash"].to_numpy()
                 .astype(np.uint64)) * C
            h ^= h >> np.uint64(29)
        batch["_part"] = (h % np.uint64(num_partitions)).astype("int32")
        return batch

    raw_pairs = rows.map_batches(add_part, batch_format="pandas") \
        .groupby("_part").map_groups(
            _probe_pairs_partition, batch_format="pandas",
            fn_kwargs={"max_bucket": max_bucket})
    cand, n_dropped = _dedup_pairs(raw_pairs)
    cand = cand.materialize()
    if cand.count() == 0:
        return empty_pairs, n_dropped

    joined = _attach_pair_texts(cand.select_columns(["a", "b"]),
                                corpus_ds.select_columns(
                                    ["doc_id", "text"]))

    def verify_batch(batch: pd.DataFrame) -> pd.DataFrame:
        keep = [ngram_jaccard(ta, tb, shingle_k) >= threshold
                for ta, tb in zip(batch["text_a"], batch["text_b"])]
        out = batch.loc[keep, ["a", "b"]]
        return out.astype({"a": "int64", "b": "int64"})

    verified = joined.map_batches(verify_batch,
                                  batch_format="pandas").materialize()
    return verified, n_dropped


def snapshot_delta(old_ds, new_ds, id_col: str = "doc_id",
                   text_col: str = "text",
                   num_partitions: int = 32):
    """Crawl-snapshot diff — the recrawl monitoring primitive: compare
    two snapshots by content hash and emit one row per difference,
    ``(id, status)`` with status in {'added', 'removed', 'changed'}
    (unchanged docs emit nothing, so the result is O(churn), not
    O(corpus)).

    Scale shape: each side projects to (id, md5-hash, side) — text
    never shuffles — then ONE id-hash-partitioned shuffle groups both
    sides' key rows; inside a partition the diff is a vectorized
    pandas outer merge (the pair-partition idiom: O(#ids/partitions)
    per task, no per-id groups, no Dataset full-outer join)."""
    from warcio_ray.ops.blocks import drop_empty_blocks

    def keyed(side: int):
        def project(batch: pd.DataFrame) -> pd.DataFrame:
            ids = batch[id_col].astype("int64")
            out = add_md5_batch(
                pd.DataFrame({id_col: ids, "text": batch[text_col]}))
            return pd.DataFrame({
                id_col: ids.to_numpy(),
                "h": out["text_hash"],
                "side": np.int64(side),
                "_part": (ids.to_numpy() % num_partitions)})
        return project

    rows = drop_empty_blocks(
        old_ds.map_batches(keyed(0), batch_format="pandas")
        .union(new_ds.map_batches(keyed(1), batch_format="pandas")))

    def diff_partition(grp: pd.DataFrame) -> pd.DataFrame:
        o = grp[grp["side"] == 0][[id_col, "h"]]
        n = grp[grp["side"] == 1][[id_col, "h"]]
        m = o.merge(n, on=id_col, how="outer", suffixes=("_o", "_n"))
        added = m["h_o"].isna()
        removed = m["h_n"].isna()
        changed = (~added) & (~removed) & (m["h_o"] != m["h_n"])
        status = np.where(added, "added",
                          np.where(removed, "removed",
                                   np.where(changed, "changed", "")))
        keep = status != ""
        return pd.DataFrame({
            id_col: m[id_col].to_numpy(dtype="int64")[keep],
            "status": status[keep]})

    return rows.groupby("_part").map_groups(diff_partition,
                                            batch_format="pandas")


_REP_ID_BITS = 40  # doc ids packed into the low bits of the argmax key


def cluster_best_representative(clusters_ds, quality_ds,
                                id_col: str = "doc_id",
                                cluster_col: str = "cluster_id",
                                quality_col: str = "n_chars",
                                num_partitions: Optional[int] = None):
    """Quality-aware fuzzy-dedup winner selection: given component
    labels (e.g. from ``connected_components_ds``) and an integer
    per-doc quality column, keep exactly one doc per cluster — the one
    maximizing (quality desc, id asc) — and label every clustered doc
    with a ``kept`` flag. The CCNet/RefinedWeb refinement over
    min-id winners: dedup should discard the SHORT near-copies, not
    whichever happened to crawl first.

    Scale shape: the argmax is ONE ``groupby(cluster).min(key)`` over
    packed int64 keys ((qmax - quality) << 40 | id — an integer min is
    partitioning-invariant and oracle-exact), then one hash join back
    to the narrow (id, cluster) rows. Quality must be an exact integer
    (char/token counts, quantized scores); nothing corpus-sized
    reaches the driver.

    Returns a Dataset (id_col, cluster_col, quality_col, kept).
    """
    import ray
    from ray.data.aggregate import Min

    from warcio_ray.ops.blocks import arrow_blocks, safe_join

    if num_partitions is None:
        num_partitions = min(
            32, max(2, int(ray.cluster_resources().get("CPU", 8))))
    qcap = 1 << (62 - _REP_ID_BITS)  # quality < 2^22
    icap = 1 << _REP_ID_BITS

    labeled = safe_join(clusters_ds, quality_ds, "inner",
                        num_partitions, (id_col,))

    def pack(batch: pd.DataFrame) -> pd.DataFrame:
        q = batch[quality_col].to_numpy(dtype="int64")
        ids = batch[id_col].to_numpy(dtype="int64")
        if len(q) and (int(q.max()) >= qcap or int(q.min()) < 0):
            raise ValueError(
                f"{quality_col} must be in [0, 2^{62 - _REP_ID_BITS}) "
                "to pack into the argmax key")
        if len(ids) and (int(ids.max()) >= icap or int(ids.min()) < 0):
            raise ValueError(
                f"{id_col} must be in [0, 2^{_REP_ID_BITS}) to pack")
        return pd.DataFrame({
            cluster_col: batch[cluster_col].to_numpy(dtype="int64"),
            id_col: ids, quality_col: q,
            "_k": (qcap - 1 - q) * icap + ids})

    packed = labeled.map_batches(pack, batch_format="pandas")
    winners = arrow_blocks(packed.select_columns([cluster_col, "_k"])) \
        .groupby(cluster_col).aggregate(Min("_k", alias_name="_wk"))

    def label(batch: pd.DataFrame) -> pd.DataFrame:
        wid = batch["_wk"].to_numpy(dtype="int64") % icap
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(dtype="int64"),
            cluster_col: batch[cluster_col].to_numpy(dtype="int64"),
            quality_col: batch[quality_col].to_numpy(dtype="int64"),
            "kept": batch[id_col].to_numpy(dtype="int64") == wid})

    return safe_join(packed, winners, "inner", num_partitions,
                     (cluster_col,)) \
        .map_batches(label, batch_format="pandas")


def continuation_pairs(ds, k: int = 8, max_per_key: int = 64,
                       text_col: str = "text",
                       id_col: str = "doc_id",
                       num_partitions=None):
    """Pagination-stitching detection — the multi-page-article crawl
    artifact: find ordered document pairs (a, b) where a's LAST ``k``
    whitespace tokens equal b's FIRST ``k`` (a's tail continues into
    b's head), so downstream curation can stitch or dedup paginated
    splits. Docs shorter than ``k`` tokens can't participate.

    Shape at scale: ONE stateless scan emits two narrow md5-key rows
    per doc — (tail_key, id) and (head_key, id); one key-hash
    partition sweep joins tails to heads with a vectorized
    per-partition merge (never per-key map_groups). A boilerplate key
    shared by many docs explodes quadratically, so per-key fan-out is
    capped at ``max_per_key`` tails x heads (smallest ids kept) with
    the dropped-key count returned — (pairs_ds, n_capped_keys).
    md5 of the joined token string stands in for token-list equality
    (collision odds ~2^-64 at these key counts).
    """
    import hashlib

    import ray
    import ray.data

    if num_partitions is None:
        num_partitions = min(64, max(2, int(
            ray.cluster_resources().get("CPU", 8))))

    def keys(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(dtype="int64")
        toks = batch[text_col].fillna("").str.split()
        out_k, out_id, out_side = [], [], []
        for d, t in zip(ids, toks):
            if len(t) < k:
                continue
            hk = int(hashlib.md5(
                " ".join(t[:k]).encode("utf-8")).hexdigest()[:15], 16)
            tk = int(hashlib.md5(
                " ".join(t[-k:]).encode("utf-8")).hexdigest()[:15], 16)
            out_k += [tk, hk]
            out_id += [d, d]
            out_side += [0, 1]  # 0 = tail, 1 = head
        return pd.DataFrame({
            "key": pd.Series(out_k, dtype="int64"),
            id_col: pd.Series(out_id, dtype="int64"),
            "side": pd.Series(out_side, dtype="int64"),
            "_part": pd.Series(
                np.asarray(out_k, dtype="int64") % num_partitions
                if out_k else [], dtype="int64")})

    def sweep(grp: pd.DataFrame) -> pd.DataFrame:
        g = grp.drop_duplicates(["key", id_col, "side"]) \
            .sort_values(["key", "side", id_col], kind="mergesort")
        out_a, out_b, capped = [], [], 0
        for key, kg in g.groupby("key", sort=False):
            tails = kg.loc[kg["side"] == 0, id_col] \
                .to_numpy(dtype="int64")
            heads = kg.loc[kg["side"] == 1, id_col] \
                .to_numpy(dtype="int64")
            if not len(tails) or not len(heads):
                continue
            if len(tails) > max_per_key or len(heads) > max_per_key:
                capped += 1
                tails = tails[:max_per_key]  # smallest ids (sorted)
                heads = heads[:max_per_key]
            aa = np.repeat(tails, len(heads))
            bb = np.tile(heads, len(tails))
            ok = aa != bb
            out_a.append(aa[ok])
            out_b.append(bb[ok])
        a = np.concatenate(out_a) if out_a else \
            np.array([], dtype="int64")
        b = np.concatenate(out_b) if out_b else \
            np.array([], dtype="int64")
        out = pd.DataFrame({"a": a, "b": b})
        if capped:
            out = pd.concat([out, pd.DataFrame(
                {"a": [-1], "b": [-capped]})], ignore_index=True)
        return out.astype({"a": "int64", "b": "int64"})

    pairs = ds.map_batches(keys, batch_format="pandas") \
        .groupby("_part").map_groups(sweep, batch_format="pandas") \
        .materialize()
    n_capped = -int(pairs.filter(expr="a == -1").sum("b") or 0)
    return pairs.filter(expr="a >= 0"), n_capped


def cluster_size_sample(ids_ds, labels_ds, id_col: str = "doc_id",
                        num_partitions=None):
    """Dedup-aware sampling — downweight near-duplicate clusters
    instead of hard-deleting them (the soft-dedup recipe: a cluster of
    s near-copies keeps each member with probability 1/sqrt(s), so
    cluster mass grows ~sqrt(s) instead of s; unclustered docs always
    survive). ``labels_ds``: (id_col, cluster_id) from
    ``connected_components_ds``; ``ids_ds``: the full corpus ids.

    Keep rule (deterministic, the temperature_sample convention):
        md5_32(id) < floor(2^32 / sqrt(s))
    ONE IEEE sqrt + division per cluster — bit-identical in SQL.

    Shape: one bounded cluster-size aggregate, one labels⋈sizes join
    + one ids left-join (ids only), then a stateless keep scan.
    Returns (id_col, cluster_size, kept) for the whole corpus.
    """
    import math

    import ray
    import ray.data
    from ray.data.aggregate import Count

    from warcio_ray.ops.blocks import arrow_blocks, safe_join
    from warcio_ray.ops.textstats import _id_hash_u32

    if num_partitions is None:
        num_partitions = min(32, max(2, int(
            ray.cluster_resources().get("CPU", 8))))

    sizes = arrow_blocks(labels_ds).groupby("cluster_id") \
        .aggregate(Count(alias_name="s"))
    lab_sz = safe_join(labels_ds, sizes, "inner", num_partitions,
                       ("cluster_id",)).drop_columns(["cluster_id"])
    joined = safe_join(ids_ds, lab_sz, "left_outer", num_partitions,
                       (id_col,))

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].astype("int64")
        s = batch["s"].fillna(1).astype("int64").to_numpy() \
            if "s" in batch else np.ones(len(batch), dtype="int64")
        thr = np.array([math.floor((1 << 32) / math.sqrt(float(x)))
                        for x in s], dtype="int64")
        h = _id_hash_u32(ids)
        return pd.DataFrame({
            id_col: ids.to_numpy(dtype="int64"),
            "cluster_size": s,
            "kept": (h < thr).astype("int64")})

    return joined.map_batches(keep, batch_format="pandas")


def ngram_coverage(ds, id_col: str = "doc_id", text_col: str = "text",
                   n: int = 5, num: int = 1, den: int = 2,
                   num_partitions=None):
    """Onion-style n-gram coverage dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", the coverage variant):
    a document's coverage is the fraction of its DISTINCT word n-grams
    whose first occurrence in the corpus (min doc id over all holders)
    belongs to an EARLIER document; docs at or above ``num/den``
    coverage are marked dropped. Unlike exact/minhash dedup (whole-doc
    or sampled similarity) this charges per-gram ownership, so a doc
    stitched from many earlier docs is caught even when no single
    source is similar.

    Gram definition (mirrored exactly by the SQL oracle): tokens are
    ``\\S+`` runs; docs with 0 tokens contribute the single empty gram
    ``''``; docs with fewer than ``n`` tokens contribute one gram (the
    whole token string, space-joined); otherwise the distinct n-grams.
    Gram identity is the md5-derived 32-bit hash of the gram string
    (same convention as the winnowing fingerprints), deduped per doc
    AFTER hashing so both sides agree on collision behavior.

    Shape at scale: one stateless scan emits (gram_hash, doc_id) rows
    bounded by total token count; ownership is ONE bounded
    ``groupby(h).min(id)``; the ownership lookup is a hash join back on
    the same key (same partitioning, no second shuffle pattern); the
    per-doc tally is one aggregate keyed by doc id. No driver state,
    no full-text movement — text never leaves the first scan.

    Returns a Dataset of (id_col, total_grams, covered_grams, kept)
    with kept=1 iff ``den*covered < num*total`` (exact integers; a doc
    is never covered by itself, so the corpus-first holder of every
    gram set is always kept).
    """
    import hashlib

    import ray
    import ray.data
    from ray.data.aggregate import Count, Min, Sum

    from warcio_ray.ops.blocks import arrow_blocks, safe_join

    if num_partitions is None:
        num_partitions = min(32, max(2, int(
            ray.cluster_resources().get("CPU", 8))))

    def grams(batch: pd.DataFrame) -> pd.DataFrame:
        import re
        ids_out, hs_out = [], []
        for did, text in zip(batch[id_col].astype("int64"),
                             batch[text_col].astype(str)):
            toks = re.findall(r"\S+", text)
            if not toks:
                gset = ("",)
            elif len(toks) < n:
                gset = (" ".join(toks),)
            else:
                gset = {" ".join(toks[i:i + n])
                        for i in range(len(toks) - n + 1)}
            hset = {int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
                    for g in gset}
            ids_out.extend([did] * len(hset))
            hs_out.extend(hset)
        return pd.DataFrame({"h": np.array(hs_out, dtype="int64"),
                             id_col: np.array(ids_out, dtype="int64")})

    pairs = ds.select_columns([id_col, text_col]) \
        .map_batches(grams, batch_format="pandas").materialize()
    owners = arrow_blocks(pairs).groupby("h") \
        .aggregate(Min(id_col, alias_name="owner"))
    joined = safe_join(pairs, owners, "inner", num_partitions, ("h",))

    def tally(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(dtype="int64"),
            "cov": (batch["owner"].to_numpy(dtype="int64")
                    < batch[id_col].to_numpy(dtype="int64"))
            .astype("int64")})

    per_doc = arrow_blocks(joined.map_batches(tally, batch_format="pandas")) \
        .groupby(id_col) \
        .aggregate(Count(alias_name="total_grams"),
                   Sum("cov", alias_name="covered_grams"))

    def verdict(batch: pd.DataFrame) -> pd.DataFrame:
        tot = batch["total_grams"].to_numpy(dtype="int64")
        cov = batch["covered_grams"].to_numpy(dtype="int64")
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(dtype="int64"),
            "total_grams": tot, "covered_grams": cov,
            "kept": (den * cov < num * tot).astype("int64")})

    return per_doc.map_batches(verdict, batch_format="pandas")


def sorted_neighbor_pairs(ds, id_col: str = "doc_id",
                          text_col: str = "text", window: int = 4,
                          max_hamming: int = 8, bucket_bits: int = 10,
                          num_partitions=None):
    """Sorted-neighborhood dedup (Hernandez & Stolfo 1995, SNM): sort
    the corpus by a fingerprint KEY (here the 64-bit SimHash) and
    compare only rows within ``window`` ranks — the linear-scan
    alternative to banding when the key clusters duplicates (exact
    copies share a simhash and become rank-adjacent; near-copies with
    equal high bits likewise). Single-key SNM misses high-bit-flipped
    near-dups by design — production runs multiple passes with rotated
    keys; the banding op (simhash_dedup) is the recall-complete
    sibling.

    Distributed without a global sort materialization: the
    shuffle_order bucket trick — rows bucket by the simhash's top
    ``bucket_bits`` bits, bucket counts cumsum to broadcast base
    ranks, ONE hash shuffle ranks each bucket locally; then neighbor
    candidates come from ONE self-join on the rank block g = r //
    window (each left row also probes g+1), filtered to
    0 < r_b - r_a <= window and Hamming <= ``max_hamming``.

    Returns (a, b, hd): id pairs (a < b) with their Hamming distance.
    """
    import ray

    from warcio_ray.ops.blocks import arrow_blocks, safe_join, \
        tree_aggregate

    if num_partitions is None:
        num_partitions = min(32, max(2, int(
            ray.cluster_resources().get("CPU", 8))))
    shift = np.uint64(64 - bucket_bits)

    sims = ds.select_columns([id_col, text_col]) \
        .map_batches(simhash_batch, batch_format="pandas")

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["simhash"].to_numpy(dtype=np.uint64)
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(dtype="int64"),
            "_s": s.view(np.int64),
            "bucket": (s >> shift).astype("int64")})

    keyed = sims.map_batches(project, batch_format="pandas") \
        .materialize()

    def bucket_counts(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch["bucket"].value_counts()
        return pd.DataFrame({"bucket": vc.index.to_numpy(dtype="int64"),
                             "c": vc.to_numpy(dtype="int64")})

    totals = tree_aggregate(
        keyed.map_batches(bucket_counts, batch_format="pandas"),
        ["bucket"], sums=("c",))
    if len(totals) == 0:
        return ray.data.from_pandas(pd.DataFrame({
            "a": pd.Series(dtype="int64"),
            "b": pd.Series(dtype="int64"),
            "hd": pd.Series(dtype="int64")}))
    totals = totals.sort_values("bucket").reset_index(drop=True)
    c = totals["c"].to_numpy(dtype="int64")
    base = np.concatenate([[0], np.cumsum(c)[:-1]])
    base_ref = ray.put(dict(zip(totals["bucket"].astype("int64"),
                                base)))

    def rank_group(grp: pd.DataFrame) -> pd.DataFrame:
        bases = ray.get(base_ref)
        out = []
        for bk, g in grp.groupby("bucket", sort=False):
            g = g.copy()
            key = g["_s"].to_numpy().view(np.uint64)
            order = np.lexsort((g[id_col].to_numpy(), key))
            g = g.iloc[order]
            g["r"] = bases[int(bk)] + np.arange(len(g), dtype="int64")
            out.append(g)
        return pd.concat(out, ignore_index=True) \
            .drop(columns=["bucket"])

    ranked = keyed.groupby("bucket") \
        .map_groups(rank_group, batch_format="pandas").materialize()

    def left_keys(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch["r"].to_numpy(dtype="int64") // window
        return pd.DataFrame({
            "k": np.concatenate([g, g + 1]),
            "ra": np.tile(batch["r"].to_numpy(dtype="int64"), 2),
            "ia": np.tile(batch[id_col].to_numpy(dtype="int64"), 2),
            "sa": np.tile(batch["_s"].to_numpy(dtype="int64"), 2)})

    def right_keys(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "k": batch["r"].to_numpy(dtype="int64") // window,
            "rb": batch["r"].to_numpy(dtype="int64"),
            "ib": batch[id_col].to_numpy(dtype="int64"),
            "sb": batch["_s"].to_numpy(dtype="int64")})

    cand = safe_join(
        ranked.map_batches(left_keys, batch_format="pandas"),
        ranked.map_batches(right_keys, batch_format="pandas"),
        "inner", num_partitions, ("k",))

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        ra = batch["ra"].to_numpy(dtype="int64")
        rb = batch["rb"].to_numpy(dtype="int64")
        keep = (rb > ra) & (rb - ra <= window)
        sa = batch["sa"].to_numpy()[keep].view(np.uint64)
        sb = batch["sb"].to_numpy()[keep].view(np.uint64)
        hd = hamming64(sa, sb)
        ok = hd <= max_hamming
        ia = batch["ia"].to_numpy(dtype="int64")[keep][ok]
        ib = batch["ib"].to_numpy(dtype="int64")[keep][ok]
        return pd.DataFrame({"a": np.minimum(ia, ib),
                             "b": np.maximum(ia, ib),
                             "hd": hd[ok].astype("int64")})

    return cand.map_batches(verify, batch_format="pandas")
