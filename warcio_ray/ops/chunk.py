"""Sliding token-window chunking — the RAG / context-window prep
primitive: split each document into ``window``-token chunks advancing
by ``stride`` tokens (overlap = window - stride), keeping full
coverage with no degenerate tail suffixes.

Chunk rule (exact, SQL-mirrorable): for a doc of n whitespace tokens
(n > 0), chunks are k = 0 .. ceil(max(n - window, 0) / stride), chunk
k covering tokens [k*stride, min(k*stride + window, n)). The last
chunk is the FIRST one whose window reaches the end of the doc — every
token is covered, and no chunk is a pure suffix of its predecessor
beyond that one. n = 0 docs emit nothing.

Scale shape: a stateless ``map_batches`` explode — each task splits
its own documents once (one C-level ``str.split`` per batch), flattens
the token arrays, and emits chunk rows; no shuffle, no driver state,
no cross-doc dependency, so it parallelizes embarrassingly and the
output order/content is partitioning-invariant by construction. The
only per-chunk Python is the final ``' '.join`` building the chunk
string (string assembly has no vectorized kernel); token *accounting*
(starts, lengths, doc boundaries) is all numpy.

No reference counterpart (warcio has no tokenizer layer); the
fixed-window + stride rule follows the standard LLM retrieval /
long-context preprocessing recipe.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["chunk_windows"]


def _chunk_batch(batch: pd.DataFrame, window: int, stride: int,
                 text_col: str, id_col: str) -> pd.DataFrame:
    empty = pd.DataFrame({
        id_col: pd.Series(dtype="int64"),
        "chunk_id": pd.Series(dtype="int64"),
        "start_tok": pd.Series(dtype="int64"),
        "n_tok": pd.Series(dtype="int64"),
        "chunk_text": pd.Series(dtype="object")})
    toks = batch[text_col].fillna("").str.split()
    n = toks.str.len().to_numpy(dtype="int64")
    live = n > 0
    if not live.any():
        return empty
    ids = batch[id_col].to_numpy(dtype="int64")[live]
    toklists = toks.to_numpy(dtype=object)[live]
    n = n[live]

    n_chunks = (np.maximum(n - window, 0) + stride - 1) // stride + 1
    idx = np.repeat(np.arange(len(ids)), n_chunks)
    k = np.arange(n_chunks.sum(), dtype="int64") \
        - np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
    start = k * stride
    end = np.minimum(start + window, n[idx])

    # flatten once; chunk slices address the flat array via doc bases
    flat = np.concatenate([np.asarray(t, dtype=object)
                           for t in toklists])
    base = (np.cumsum(n) - n)[idx]
    lo, hi = base + start, base + end
    text = [" ".join(flat[a:b]) for a, b in zip(lo, hi)]
    return pd.DataFrame({
        id_col: ids[idx],
        "chunk_id": k,
        "start_tok": start,
        "n_tok": end - start,
        "chunk_text": text})


def chunk_windows(ds, window: int = 256, stride: int = 192,
                  text_col: str = "text", id_col: str = "doc_id"):
    """Explode documents into overlapping token-window chunks.

    Returns a Dataset of (id_col, chunk_id, start_tok, n_tok,
    chunk_text) rows per the module chunk rule. ``stride`` must be
    in (0, window].
    """
    if not (0 < stride <= window):
        raise ValueError(f"stride must be in (0, window]; got "
                         f"stride={stride}, window={window}")
    return ds.map_batches(
        _chunk_batch, batch_format="pandas",
        fn_kwargs={"window": window, "stride": stride,
                   "text_col": text_col, "id_col": id_col})
