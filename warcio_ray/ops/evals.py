"""Curation-signal evaluation metrics.

``signal_auc`` answers the question every quality-filter pipeline hits
before it trusts a signal: *how well does this score separate the
documents I want from the ones I don't?* — the exact ROC-AUC
(Mann-Whitney U with midrank tie handling) of one or more INTEGER
quality signals against a binary label.

Scale shape (the exact-quantile pattern, see ops/quantile.py):

  1. one stateless ``map_batches`` scan emits per-batch score
     HISTOGRAM partials ``(signal, score, pos_n, neg_n)`` — a combiner,
     so the shuffle carries counts, never documents;
  2. one bounded ``groupby(signal, score)`` sum — distinct rows are
     bounded by the signals' VALUE RANGES, not the corpus size
     (a length-like signal has ~1e5 distinct values at any corpus
     size);
  3. the driver finishes on the tiny histogram: with positives ``p(s)``
     and negatives ``n(s)`` per score and ``below(s)`` the cumulative
     negatives at strictly smaller scores,

         2*U = sum_s p(s) * (2*below(s) + n(s))
         AUC = U / (n_pos * n_neg)

     — exact integers until the final division (``2*U`` fits int64 up
     to ~4e9 documents; beyond that promote to Python ints).

Reference intent: warcio has no evaluation layer; this is part of the
training-data-pipeline extension mandated by the build brief (quality
scoring needs a way to be *validated*, not just computed).
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from .textstats import lexical_diversity_batch

# signals are columns of lexical_diversity_batch's output — all exact
# integers, so the DuckDB oracle reproduces them bit-for-bit.
DEFAULT_SIGNALS = ("n_chars", "n_words", "uniq_words")


def _auc_partials(batch: pd.DataFrame, signals, pos_label: str,
                  label_col: str) -> pd.DataFrame:
    """Per-batch (signal, score) -> (pos_n, neg_n) histogram combiner."""
    sig = lexical_diversity_batch(batch)
    pos = (batch[label_col].astype(str) == pos_label).to_numpy()
    out = []
    for name in signals:
        scores = sig[name].to_numpy(dtype="int64")
        # key = score*2 + is_pos keeps one np.unique per signal
        key = scores * 2 + pos.astype(np.int64)
        uk, cnt = np.unique(key, return_counts=True)
        out.append(pd.DataFrame({
            "signal": name,
            "score": uk >> 1,
            "pos_n": np.where(uk & 1, cnt, 0).astype("int64"),
            "neg_n": np.where(uk & 1, 0, cnt).astype("int64"),
        }))
    if not out:
        return pd.DataFrame({"signal": pd.Series([], dtype=object),
                             "score": pd.Series([], dtype="int64"),
                             "pos_n": pd.Series([], dtype="int64"),
                             "neg_n": pd.Series([], dtype="int64")})
    return pd.concat(out, ignore_index=True)


def signal_auc(ds, signals=DEFAULT_SIGNALS, pos_label: str = "en",
               label_col: str = "lang") -> pd.DataFrame:
    """Exact ROC-AUC of integer quality signals vs a binary label.

    Returns one row per signal: ``(signal, n_pos, n_neg, u2, auc)``
    where ``u2 = 2*U`` (exact int64) and ``auc`` is rounded to 6
    decimals. AUC ~ 0.5 means the signal carries no information about
    the label; the tie-midrank convention makes a constant signal read
    exactly 0.5.
    """
    sigs = tuple(signals)

    hist = ds.map_batches(
        lambda b: _auc_partials(b, sigs, pos_label, label_col),
        batch_format="pandas",
    ).groupby(["signal", "score"]).sum(["pos_n", "neg_n"])

    # bounded collect: rows <= sum of signal value ranges (see module
    # docstring) — the quantile-finishing pattern, never O(corpus).
    h = hist.to_pandas()
    h = h.rename(columns={"sum(pos_n)": "pos_n", "sum(neg_n)": "neg_n"})

    rows = []
    for name in sigs:
        g = h[h["signal"] == name].sort_values("score")
        p = g["pos_n"].to_numpy(dtype="int64")
        n = g["neg_n"].to_numpy(dtype="int64")
        below = np.concatenate(([0], np.cumsum(n)[:-1]))
        u2 = int(np.sum(p * (2 * below + n)))
        n_pos, n_neg = int(p.sum()), int(n.sum())
        auc = round(u2 / (2.0 * n_pos * n_neg), 6) if n_pos and n_neg \
            else 0.5
        rows.append((name, n_pos, n_neg, u2, auc))
    return pd.DataFrame(rows,
                        columns=["signal", "n_pos", "n_neg", "u2", "auc"])


def ann_recall_at_k(ds, queries, centroids, k: int = 10,
                    nprobe: int = 2) -> pd.DataFrame:
    """Recall@k of the APPROXIMATE IVF probe path against exact brute
    force — the acceptance measurement for any nprobe/n_centroids
    setting before trusting it at corpus scale (the similarity-search
    twin of ``lsh_eval`` on the dedup side).

    Runs ``ivf_search`` restricted to each query's ``nprobe`` closest
    of the given ``centroids`` and ``knn_bruteforce`` over the same
    Dataset, then intersects the two toplists per query. Both searches
    stream the corpus (broadcast queries, per-batch partial top-k);
    the intersection runs on 2*Q*k driver rows — small by
    construction at any corpus size. Centroids are passed EXPLICITLY
    so the measurement (and its SQL replay) is independent of any
    trainer. Returns (query_id, n_hits) int64, one row per query,
    n_hits in [0, k]."""
    from warcio_ray.ops.ivf import ivf_search
    from warcio_ray.ops.knn import knn_bruteforce

    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    approx = ivf_search(ds, queries, k=k, nprobe=nprobe,
                        centroids=np.asarray(centroids,
                                             dtype=np.float64))
    exact = knn_bruteforce(ds, queries, k=k)
    rows = []
    for qi in range(len(queries)):
        a = set(approx[approx["query_id"] == qi]["vec_id"]
                .astype("int64"))
        e = set(exact[exact["query_id"] == qi]["vec_id"]
                .astype("int64"))
        rows.append((qi, len(a & e)))
    return pd.DataFrame(rows, columns=["query_id", "n_hits"]) \
        .astype("int64")
