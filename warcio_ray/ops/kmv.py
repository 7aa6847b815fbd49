"""KMV (bottom-k / k-minimum-values) sketch Jaccard between two
document sets — the third sketch family next to HyperLogLog
(ops/sketch HLL, distinct counts) and Count-Min (frequencies):
bottom-k sketches support SET OPERATIONS, which registers and
counters cannot — the classic estimator (Bar-Yossef et al. 2002;
Beyer et al., SIGMOD 2007) for "how much do two crawls / snapshots /
corpora overlap?" without touching either corpus twice.

    U = the k smallest distinct hashes of A union B
    m = |{h in U : h in A and h in B}|        J_hat = m / k

Hashes are the repo's SQL-replayable convention (md5 hex -> low 60
bits as int64), and bottom-k of a deterministic hash is itself
deterministic, so unlike HLL-register or sampling estimators the
ESTIMATE is exact-replayable: the oracle reproduces (m, k) bitwise.

Scale shape: per-batch partial bottom-k per side (a few hundred int64
rows leave each task), driver merge over O(batches x k) rows — the
partial-top-k pattern the ANN ops use. No shuffle, no corpus
materialization.

No reference counterpart — sketch operator per the build brief.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

__all__ = ["kmv_jaccard"]


def _md5_low60(texts) -> np.ndarray:
    return np.fromiter(
        (int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
         for t in texts), dtype=np.int64, count=len(texts))


def kmv_jaccard(ds_a, ds_b, k: int = 128,
                text_col: str = "text") -> pd.DataFrame:
    """Bottom-``k`` Jaccard estimate between the distinct ``text_col``
    value sets of two Datasets. Returns one row (m, k_used,
    union_est): J_hat = m / k_used, and union_est = the KMV
    distinct-union estimate floor((k_used - 1) * 2^60 / kth) (Beyer
    et al.) — evaluated in unbounded ints (the numerator needs 67
    bits; DuckDB uses HUGEINT), result int64.
    ``k_used = min(k, |distinct union|)``."""

    def partials(which: str):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):
                return pd.DataFrame({"h": pd.Series(dtype="int64")})
            h = np.unique(_md5_low60(batch[text_col].astype(str)))
            return pd.DataFrame({"h": h[:k]})
        fn.__name__ = f"bottomk_{which}"
        return fn

    ha = np.unique(ds_a.map_batches(
        partials("a"), batch_format="pandas").to_pandas()
        ["h"].to_numpy(dtype="int64"))[:k]
    hb = np.unique(ds_b.map_batches(
        partials("b"), batch_format="pandas").to_pandas()
        ["h"].to_numpy(dtype="int64"))[:k]

    union = np.unique(np.concatenate([ha, hb]))[:k]
    k_used = len(union)
    both = np.intersect1d(union, ha, assume_unique=True)
    both = np.intersect1d(both, hb, assume_unique=True)
    m = len(both)
    kth = int(union[-1]) if k_used else 0
    est = ((k_used - 1) * (1 << 60)) // max(kth, 1) if k_used else 0
    return pd.DataFrame({
        "m": np.asarray([m], dtype="int64"),
        "k_used": np.asarray([k_used], dtype="int64"),
        "union_est": np.asarray([est], dtype="int64")})
