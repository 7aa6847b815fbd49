"""DSIR-style importance resampling weights (Xie et al. 2023, "Data
Selection for Language Models via Importance Resampling"): score every
corpus document by how much its hashed n-gram feature distribution
looks like a small TARGET corpus versus the raw corpus, so curation
can resample toward the target domain.

Scale shape — two scans, zero shuffles of anything doc-sized:
  1. ONE corpus scan folds (bucket, count_all, count_target) partials —
     the key space is the fixed ``n_buckets`` (default 1024), so the
     merge is a ``tree_aggregate`` combiner and the driver fold is
     O(buckets).
  2. The driver turns the two integer histograms into per-bucket
     quantized log-importance ratios
     q_b = floor((ln((t_b+1)/(T+m)) - ln((r_b+1)/(R+m))) * 2^32 + 0.5)
     — an O(buckets) int64 array broadcast into the second scan's
     closure — and each doc's weight is the INTEGER sum of q over its
     feature occurrences. Integer arithmetic makes the result
     partitioning- and order-invariant (the same exactness trick as
     the OPIC frontier / fixed-point PageRank), and SQL recomputes the
     whole chain: md5-derived buckets, integer counts, one ln() per
     bucket, integer sums (BM25 established that DuckDB's ln matches
     libm bit-for-bit on these inputs).

Features are hashed word unigrams + adjacent bigrams (the DSIR paper's
feature space) bucketed by the first 8 hex chars of md5 — the repo's
SQL-recomputable hash idiom. Consumers derive the mean log ratio as
iw / n_features / 2^32 and select by (weight, doc_id); the selection
itself is a trivial deterministic top-k downstream of this table.

No reference counterpart (warcio has no curation layer); operator
family SURVEY §2.7.
"""

from __future__ import annotations

import hashlib
from typing import Callable

import numpy as np
import pandas as pd

__all__ = ["dsir_weights", "hashed_kl_drift"]

_SCALE = np.int64(1) << np.int64(32)

# md5 is ~1us per call: memoize per worker process, bounded by vocab
_BUCKET_MEMO: dict = {}


def _bucket(feature: str, n_buckets: int) -> int:
    key = (feature, n_buckets)
    b = _BUCKET_MEMO.get(key)
    if b is None:
        if len(_BUCKET_MEMO) > 2_000_000:
            _BUCKET_MEMO.clear()
        b = int(hashlib.md5(feature.encode("utf-8")).hexdigest()[:8],
                16) % n_buckets
        _BUCKET_MEMO[key] = b
    return b


def _doc_buckets(text: str, n_buckets: int) -> np.ndarray:
    toks = (text or "").split()
    feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return np.fromiter((_bucket(f, n_buckets) for f in feats),
                       dtype=np.int64, count=len(feats))


def dsir_weights(ds, target_mask: Callable[[pd.Series], np.ndarray],
                 id_col: str = "doc_id", text_col: str = "text",
                 n_buckets: int = 1024) -> "object":
    """Dataset -> Dataset of (id, iw, n_features): iw is the exact
    int64 sum of 2^32-quantized per-feature log importance ratios
    (target vs raw hashed-ngram distributions, add-1 smoothed over
    ``n_buckets``). ``target_mask`` maps the id column of a batch to a
    boolean array selecting the in-domain target docs (the target is a
    subset of the corpus, so one scan counts both histograms). Docs
    with no tokens come back as (id, 0, 0)."""
    from warcio_ray.ops.blocks import tree_aggregate

    def count_partials(batch: pd.DataFrame) -> pd.DataFrame:
        tgt = np.asarray(target_mask(batch[id_col]), dtype=bool)
        all_counts = np.zeros(n_buckets, dtype=np.int64)
        tgt_counts = np.zeros(n_buckets, dtype=np.int64)
        for text, is_tgt in zip(batch[text_col], tgt):
            b = _doc_buckets(text, n_buckets)
            if not len(b):
                continue
            c = np.bincount(b, minlength=n_buckets)
            all_counts += c
            if is_tgt:
                tgt_counts += c
        nz = np.nonzero(all_counts)[0]
        return pd.DataFrame({"b": nz, "c_all": all_counts[nz],
                             "c_tgt": tgt_counts[nz]})

    hist = tree_aggregate(
        ds.map_batches(count_partials, batch_format="pandas"),
        ["b"], sums=("c_all", "c_tgt"))
    q = np.zeros(n_buckets, dtype=np.int64)
    if len(hist):
        c_all = np.zeros(n_buckets, dtype=np.int64)
        c_tgt = np.zeros(n_buckets, dtype=np.int64)
        b = hist["b"].to_numpy(dtype=np.int64)
        c_all[b] = hist["c_all"].to_numpy(dtype=np.int64)
        c_tgt[b] = hist["c_tgt"].to_numpy(dtype=np.int64)
        ca, ct = int(c_all.sum()), int(c_tgt.sum())
        lr = (np.log((c_tgt + 1.0) / (ct + float(n_buckets)))
              - np.log((c_all + 1.0) / (ca + float(n_buckets))))
        # |lr| <= ~ln(C): *2^32 stays far inside float64's exact-int
        # range, so floor(+0.5) is the same integer on every engine
        q = np.floor(lr * float(_SCALE) + 0.5).astype(np.int64)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(dtype="int64")
        iw = np.zeros(len(ids), dtype=np.int64)
        nf = np.zeros(len(ids), dtype=np.int64)
        for i, text in enumerate(batch[text_col]):
            bk = _doc_buckets(text, n_buckets)
            nf[i] = len(bk)
            if len(bk):
                iw[i] = int(q[bk].sum())
        return pd.DataFrame({id_col: ids, "iw": iw, "n_features": nf})

    return ds.map_batches(score, batch_format="pandas")


def hashed_kl_drift(ds, group_col: str = "lang",
                    text_col: str = "text",
                    n_buckets: int = 1024) -> "pd.DataFrame":
    """Per-group distribution-drift monitor: KL(P_group || Q_corpus)
    over add-1-smoothed hashed UNIGRAM histograms — the curation
    dashboard primitive that tells you which slice of a crawl snapshot
    stopped looking like the corpus (domain drift, spam floods,
    scraper breakage) without shipping any vocabulary around.

    Scale shape: ONE corpus scan folds (group, bucket) partial counts
    — the key space is bounded (#groups x n_buckets), so the merge is
    a ``tree_aggregate`` and the driver fold is O(cells); nothing
    doc-sized moves.

    Exactness: each bucket's KL term  p_b * ln(p_b / q_b)  (p = group
    histogram, q = corpus histogram, both add-1 smoothed over ALL
    n_buckets) is quantized to int64 at 2^40 and SUMMED AS INTEGERS,
    so the result is partitioning/order-invariant and SQL recomputes
    it term-for-term (|term| < 1, 2^40 * n_buckets << 2^63; ln == libm
    per the bm25/dsir precedent).  Returns a pandas DataFrame
    (group, n_tokens, kl_q, kl) sorted by group — kl = kl_q / 2^40 is
    the float view of the exact integer."""
    from warcio_ray.ops.blocks import tree_aggregate

    kl_scale = float(np.int64(1) << np.int64(40))

    def count_partials(batch: pd.DataFrame) -> pd.DataFrame:
        parts = {}
        for text, grp in zip(batch[text_col], batch[group_col]):
            toks = (text or "").split()
            if not toks:
                continue
            b = np.fromiter((_bucket(t, n_buckets) for t in toks),
                            dtype=np.int64, count=len(toks))
            c = parts.get(grp)
            if c is None:
                c = parts[grp] = np.zeros(n_buckets, dtype=np.int64)
            c += np.bincount(b, minlength=n_buckets)
        rows = {"g": [], "b": [], "n": []}
        for grp, c in parts.items():
            nz = np.nonzero(c)[0]
            rows["g"].extend([grp] * len(nz))
            rows["b"].append(nz)
            rows["n"].append(c[nz])
        if not rows["g"]:
            return pd.DataFrame({"g": pd.Series(dtype="object"),
                                 "b": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        return pd.DataFrame({
            "g": rows["g"],
            "b": np.concatenate(rows["b"]),
            "n": np.concatenate(rows["n"])})

    hist = tree_aggregate(
        ds.map_batches(count_partials, batch_format="pandas"),
        ["g", "b"], sums=("n",))
    corpus = np.zeros(n_buckets, dtype=np.int64)
    per_group: dict = {}
    for grp, b, n in zip(hist["g"], hist["b"], hist["n"]):
        c = per_group.get(grp)
        if c is None:
            c = per_group[grp] = np.zeros(n_buckets, dtype=np.int64)
        c[int(b)] = n
        corpus[int(b)] += n
    tot = int(corpus.sum())
    qdist = (corpus + 1.0) / (tot + float(n_buckets))
    out = {"g": [], "n_tokens": [], "kl_q": []}
    for grp in sorted(per_group):
        c = per_group[grp]
        tg = int(c.sum())
        p = (c + 1.0) / (tg + float(n_buckets))
        terms = np.floor(p * np.log(p / qdist) * kl_scale + 0.5) \
            .astype(np.int64)
        out["g"].append(grp)
        out["n_tokens"].append(tg)
        out["kl_q"].append(int(terms.sum()))
    res = pd.DataFrame({group_col: out["g"],
                        "n_tokens": np.array(out["n_tokens"],
                                             dtype="int64"),
                        "kl_q": np.array(out["kl_q"], dtype="int64")})
    res["kl"] = res["kl_q"] / kl_scale
    return res
