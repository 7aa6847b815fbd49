"""TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
the word co-occurrence graph — the graph-based complement of
tfidf_keywords (frequency-based): a word ranks high when it co-occurs
with other high-ranking words, which surfaces hub terms that plain
counts miss and demotes frequent-but-isolated boilerplate tokens.

Exact-integer contract (SQL-replayable): co-occurrence edges are
unordered token pairs within a distance-2 window (self-pairs
excluded), weighted by corpus count; the weighted PageRank is
quantized at 2^30 — per-edge transition weights q_ij =
(w_ij << 30) // W_i, per-edge floor on every share, damping as the
integer 15/100 + 85/100 split (the pagerank_ds damping_pct
convention). Ranks are therefore bit-identical across partitionings
and engines.

Shape at scale: ONE stateless scan emits per-batch co-occurrence pair
partials (two shifted-array window joins, no per-token Python loop);
one vocab-bounded (wa, wb) aggregate is the only shuffle; the driver
iterates the word graph. The word-graph iteration is driver-side by
the same gate PageRank uses for its broadcast path (node count =
vocabulary, bounded by construction here; a join-path iteration is
the swap above it for open-vocabulary corpora).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["textrank_keywords"]


def textrank_keywords(ds, k: int = 20, iters: int = 5,
                      window: int = 2, qbits: int = 30,
                      text_col: str = "text") -> pd.DataFrame:
    """Top-``k`` corpus keywords by quantized TextRank. Returns a
    pandas DataFrame (term, rank_q) ordered by (rank_q desc, term
    asc); only words with at least one co-occurrence participate."""
    from warcio_ray.ops.blocks import arrow_blocks

    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        parts = batch[text_col].fillna("").astype(str).str.split()
        lens = parts.str.len().to_numpy(dtype="int64")
        flat = np.array([w for tl in parts for w in tl], dtype=object)
        if not len(flat):
            return pd.DataFrame({"wa": pd.Series(dtype=object),
                                 "wb": pd.Series(dtype=object),
                                 "c": pd.Series(dtype="int64")})
        doc = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
        frames = []
        for off in range(1, window + 1):
            if len(flat) <= off:
                break
            same = doc[:-off] == doc[off:]
            a, b = flat[:-off][same], flat[off:][same]
            ne = a != b
            a, b = a[ne], b[ne]
            frames.append(pd.DataFrame({
                "wa": np.minimum(a, b), "wb": np.maximum(a, b)}))
        if not frames:
            return pd.DataFrame({"wa": pd.Series(dtype=object),
                                 "wb": pd.Series(dtype=object),
                                 "c": pd.Series(dtype="int64")})
        out = pd.concat(frames, ignore_index=True) \
            .groupby(["wa", "wb"], sort=False).size().reset_index(name="c")
        out["c"] = out["c"].astype("int64")
        return out

    from ray.data.aggregate import Sum
    und = arrow_blocks(ds.select_columns([text_col])
                       .map_batches(pairs, batch_format="pandas")) \
        .groupby(["wa", "wb"]).aggregate(Sum("c", alias_name="c")) \
        .to_pandas()
    if len(und) == 0:
        return pd.DataFrame({"term": pd.Series(dtype=object),
                             "rank_q": pd.Series(dtype="int64")})

    # symmetric directed edge list + exact quantized transitions
    s = np.concatenate([und["wa"].to_numpy(object),
                        und["wb"].to_numpy(object)])
    d = np.concatenate([und["wb"].to_numpy(object),
                        und["wa"].to_numpy(object)])
    c = np.concatenate([und["c"].to_numpy("int64")] * 2)
    terms, s_id = np.unique(s, return_inverse=True)
    d_id = np.searchsorted(terms, d)
    one = 1 << qbits
    wsum = np.zeros(len(terms), dtype=object)
    for i, w in zip(s_id, c):
        wsum[i] += int(w)
    q = np.array([(int(w) * one) // int(wsum[i])
                  for i, w in zip(s_id, c)], dtype=object)
    base = (15 * one) // 100
    r = [one] * len(terms)
    for _ in range(iters):
        acc = [0] * len(terms)
        for i, j, p in zip(s_id, d_id, q):
            acc[j] += (r[i] * int(p)) >> qbits
        r = [base + (85 * a) // 100 for a in acc]
    out = pd.DataFrame({"term": terms,
                        "rank_q": np.array(r, dtype="int64")})
    return out.sort_values(["rank_q", "term"],
                           ascending=[False, True], kind="mergesort") \
        .head(k).reset_index(drop=True)
