"""Content-defined chunking (CDC) — the shift-resilient storage-dedup
primitive (LBFS/Venti lineage: chunk boundaries come from the CONTENT,
so an insertion early in a document only perturbs one chunk, unlike
fixed windows where every later chunk shifts). Used here as the
cross-document shared-chunk detector: identical passages dedup at the
chunk level no matter where they sit.

Boundary rule (exact, SQL-replayable — deliberately multiplicative
hashing over byte windows, NOT a Python-only rolling hash):

    w(i) = b[i]*2^24 + b[i+1]*2^16 + b[i+2]*2^8 + b[i+3]
    cut after byte i+3  iff  (w(i) * 2654435761) mod 2^32 mod mask == 0

over the UTF-8 bytes of the text (the corpus is ASCII, so SQL's
per-character ascii() replay coincides byte-for-byte; non-ASCII
corpora would need a BLOB-side oracle). Expected chunk size ~= mask
bytes plus the window tail. No min/max clamps: they would make the
rule sequential (each boundary depends on the previous), killing both
vectorization and the SQL replay — the unclamped rule is positionally
independent, so the whole scan is one numpy sliding-window multiply.

Shape at scale: ONE stateless scan chunks each batch (vectorized
window hash per doc, boundaries via flatnonzero); per-batch distinct
(chunk_hash, doc) fold, then ONE bounded-ish hash aggregate counts
occurrences and distinct docs per chunk hash. Text never shuffles —
only 16-byte (hash, doc) rows.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

__all__ = ["cdc_chunk_batch", "cdc_shared_chunks"]

_K = np.uint64(2654435761)
_M32 = np.uint64(0xFFFFFFFF)


def _cuts(b: np.ndarray, mask: int) -> np.ndarray:
    """Sorted exclusive chunk-end byte positions for one doc."""
    n = len(b)
    if n < 4:
        return np.array([], dtype=np.int64)
    w = (b[:-3].astype(np.uint64) << np.uint64(24)) \
        + (b[1:-2].astype(np.uint64) << np.uint64(16)) \
        + (b[2:-1].astype(np.uint64) << np.uint64(8)) \
        + b[3:].astype(np.uint64)
    h = (w * _K) & _M32
    return (np.flatnonzero(h % np.uint64(mask) == 0) + 4) \
        .astype(np.int64)


def cdc_chunk_batch(batch: pd.DataFrame, mask: int = 16,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> pd.DataFrame:
    """Batch -> one row per content-defined chunk:
    (id, chunk_id, start, n_bytes, h) with h = int(md5(chunk)[:15])."""
    rows_id, rows_ch, rows_st, rows_ln, rows_h = [], [], [], [], []
    ids = batch[id_col].to_numpy(dtype="int64")
    for d, t in zip(ids, batch[text_col].fillna("")):
        raw = t.encode("utf-8")
        n = len(raw)
        if n == 0:
            continue
        cuts = _cuts(np.frombuffer(raw, dtype=np.uint8), mask)
        bounds = np.concatenate([[0], cuts, [n]]) \
            if (not len(cuts) or cuts[-1] != n) \
            else np.concatenate([[0], cuts])
        for ci, (s, e) in enumerate(zip(bounds[:-1], bounds[1:])):
            seg = raw[s:e]
            rows_id.append(d)
            rows_ch.append(ci)
            rows_st.append(int(s))
            rows_ln.append(int(e - s))
            rows_h.append(int(hashlib.md5(seg).hexdigest()[:15], 16))
    return pd.DataFrame({
        id_col: pd.Series(rows_id, dtype="int64"),
        "chunk_id": pd.Series(rows_ch, dtype="int64"),
        "start": pd.Series(rows_st, dtype="int64"),
        "n_bytes": pd.Series(rows_ln, dtype="int64"),
        "h": pd.Series(rows_h, dtype="int64")})


def cdc_shared_chunks(ds, mask: int = 16, min_docs: int = 2,
                      text_col: str = "text",
                      id_col: str = "doc_id"):
    """Cross-document shared chunks: (h, n_bytes, n_docs, n_occ) for
    every chunk hash appearing in >= ``min_docs`` distinct documents
    — the dedup-storage savings ledger."""
    from ray.data.aggregate import Count, Max, Sum

    from warcio_ray.ops.blocks import arrow_blocks

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        ch = cdc_chunk_batch(batch, mask=mask, text_col=text_col,
                             id_col=id_col)
        # per-batch combine: one row per (h, doc) with its own count
        g = ch.groupby(["h", id_col], sort=False).agg(
            n_occ=("chunk_id", "size"),
            n_bytes=("n_bytes", "max")).reset_index()
        return g.astype({"n_occ": "int64", "n_bytes": "int64"})

    per_doc = arrow_blocks(
        ds.map_batches(fold, batch_format="pandas")) \
        .groupby(["h", id_col]) \
        .aggregate(Sum("n_occ", alias_name="n_occ"),
                   Max("n_bytes", alias_name="n_bytes"))
    agg = arrow_blocks(per_doc).groupby("h") \
        .aggregate(Count(alias_name="n_docs"),
                   Sum("n_occ", alias_name="n_occ"),
                   Max("n_bytes", alias_name="n_bytes"))
    return agg.filter(expr=f"n_docs >= {int(min_docs)}")
