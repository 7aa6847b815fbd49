"""Sequence packing for pretraining: concatenate documents in doc_id
order and chop the token stream into fixed-size context windows
(GPT-style "concat and chop"), emitting one row per (document, window)
segment.

This is the packing layout a training loader consumes: window ``bin_id``
is filled from token ``bin_off`` with ``n_tok`` tokens taken from the
document starting at ``doc_off``. Tokens are whitespace tokens (same
tokenization as ``token_stats``), so the whole chain is recomputable in
SQL (window cumsum + per-doc bin range explode) and hard-oracled.

Scale shape (the interesting part — an exact distributed prefix sum):

* pass A: one ``map_batches`` projects each doc to ``(doc_id, n)``
  (two int64 columns; the text never shuffles),
* bucket totals: docs bucket by ``doc_id // bucket_size``; a tiny
  ``groupby(bucket).sum`` yields O(#buckets) rows, the ONLY thing the
  driver ever holds. bucket_size trades driver memory against BOTH
  group width and group COUNT: per-tiny-group map_groups costs ~1-5 ms
  of machinery each, so the default 2^20 docs/bucket keeps a 10^10-doc
  corpus at ~10^4 groups (seconds of overhead, 16 MB of int rows per
  group) while the driver cumsum stays 10^4 rows,
* pass B: one hash shuffle of the (doc_id, n) rows into bucket groups;
  inside each group a vectorized sort + cumsum plus the broadcast
  bucket-base offset gives every doc its exact global token offset,
* segment explode: pure numpy (``repeat`` + ``arange``), no Python loop.

Driver memory O(#buckets); worker memory O(bucket). No corpus-sized
materialization; the output is 5 int64 columns.

No reference counterpart (warcio has no training-data ops); packing
semantics follow the standard causal-LM pretraining layout (e.g. GPT-2's
concatenated-corpus chunking).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

__all__ = ["pack_sequences"]


def _token_counts(batch: pd.DataFrame, text_col: str) -> pd.DataFrame:
    n = batch[text_col].fillna("").str.split().str.len() \
        .astype("int64").to_numpy()
    return pd.DataFrame({"doc_id": batch["doc_id"].astype("int64"),
                         "n": n})


def _explode_segments(batch: pd.DataFrame, window: int) -> pd.DataFrame:
    """(doc_id, n, off) -> one row per (doc, bin) overlap segment."""
    empty = pd.DataFrame({
        "doc_id": pd.Series(dtype="int64"),
        "bin_id": pd.Series(dtype="int64"),
        "doc_off": pd.Series(dtype="int64"),
        "bin_off": pd.Series(dtype="int64"),
        "n_tok": pd.Series(dtype="int64")})
    batch = batch[batch["n"] > 0]
    if not len(batch):
        return empty
    ids = batch["doc_id"].to_numpy(dtype="int64")
    n = batch["n"].to_numpy(dtype="int64")
    off = batch["off"].to_numpy(dtype="int64")
    first_bin = off // window
    last_bin = (off + n - 1) // window
    reps = (last_bin - first_bin + 1).astype("int64")
    # bin ids per segment: first_bin[i], first_bin[i]+1, ..., last_bin[i]
    idx = np.repeat(np.arange(len(ids)), reps)
    local = np.arange(reps.sum(), dtype="int64") - \
        np.repeat(np.cumsum(reps) - reps, reps)
    bins = first_bin[idx] + local
    seg_start = np.maximum(bins * window, off[idx])
    seg_end = np.minimum((bins + 1) * window, off[idx] + n[idx])
    return pd.DataFrame({
        "doc_id": ids[idx],
        "bin_id": bins,
        "doc_off": seg_start - off[idx],
        "bin_off": seg_start - bins * window,
        "n_tok": seg_end - seg_start})


def pack_sequences(ds, window: int = 1024, text_col: str = "text",
                   bucket_size: int = 1 << 20,
                   num_partitions: Optional[int] = None,
                   precounted: bool = False):
    """Pack documents (in doc_id order) into ``window``-token bins.

    With ``precounted=True`` the input is already a (doc_id, n) count
    table (e.g. BPE token counts from ``ops.bpe.encode_bpe_batch``)
    and the whitespace-count pass is skipped — packing is
    tokenizer-agnostic, only the counts differ.

    Returns a Dataset with one row per (doc, bin) segment:
    ``doc_id, bin_id, doc_off, bin_off, n_tok`` — all int64. Exact and
    deterministic at any parallelism (the prefix sum is computed from
    integer bucket totals, not float accumulation).
    """
    import ray

    counts = ds if precounted else ds.map_batches(
        _token_counts, batch_format="pandas",
        fn_kwargs={"text_col": text_col})

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["bucket"] = batch["doc_id"] // bucket_size
        return batch

    bucketed = counts.map_batches(add_bucket, batch_format="pandas")

    # O(#buckets) driver state: per-bucket token totals -> exclusive
    # prefix sum of bucket base offsets
    from ray.data.aggregate import Sum
    from warcio_ray.ops.blocks import arrow_blocks

    totals = arrow_blocks(bucketed).groupby("bucket") \
        .aggregate(Sum("n", alias_name="tot")).to_pandas()
    totals = totals.sort_values("bucket").reset_index(drop=True)
    base = np.concatenate(
        [[0], np.cumsum(totals["tot"].to_numpy(dtype="int64"))[:-1]])
    base_ref = ray.put(dict(zip(totals["bucket"].astype("int64"), base)))

    def local_offsets(grp: pd.DataFrame) -> pd.DataFrame:
        grp = grp.sort_values("doc_id", kind="mergesort")
        n = grp["n"].to_numpy(dtype="int64")
        local = np.cumsum(n) - n
        bases = ray.get(base_ref)
        out = grp[["doc_id", "n"]].copy()
        out["off"] = local + bases[int(grp["bucket"].iloc[0])]
        return out

    offs = bucketed.groupby("bucket").map_groups(
        local_offsets, batch_format="pandas")
    return offs.map_batches(_explode_segments, batch_format="pandas",
                            fn_kwargs={"window": window})
