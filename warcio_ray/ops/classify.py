"""Hashed-feature linear quality classifier — the fastText-style
"score every document with a linear model over hashed token features"
inference shape, run as an actor-pool map_batches stage.

The model here is deterministic (weights derived from the feature index
by a multiplicative hash) so the whole forward pass is recomputable in
SQL and hard-oracled; swapping in trained weights is a one-array change
(pass ``weights=``) — the Ray-side plumbing (load once per actor in
``__init__``, vectorized per-batch scoring, integer-exact accumulation)
is the part that matters at 100 TB.

Exactness: per-token contributions are int64 (weight table holds 32-bit
signed ints), so the per-doc accumulation is an integer sum — exact and
therefore ORDER-INDEPENDENT across any batching/partitioning, unlike a
float dot product. Only the final squash touches floats, on an integer
that matches the oracle bit-for-bit.

No reference counterpart (warcio has no scoring ops).
"""

from __future__ import annotations

import hashlib
import math
from typing import Optional

import numpy as np
import pandas as pd

__all__ = ["LinearQualityStage", "linear_quality_scores", "N_FEATURES"]

N_FEATURES = 256
_KNUTH = 2654435761  # multiplicative-hash constant


def default_weights(n_features: int = N_FEATURES) -> np.ndarray:
    """Deterministic signed 32-bit weight per feature index:
    (j * 2654435761) mod 2^32, recentered to [-2^31, 2^31)."""
    j = np.arange(n_features, dtype=np.int64)
    return (j * _KNUTH) % (1 << 32) - (1 << 31)


class LinearQualityStage:
    """Callable class for ``map_batches(..., concurrency=N)``: the
    weight table and the per-token feature memo live once per actor."""

    def __init__(self, n_features: int = N_FEATURES,
                 weights: Optional[np.ndarray] = None):
        self.n_features = n_features
        self.weights = (np.asarray(weights, dtype=np.int64)
                        if weights is not None
                        else default_weights(n_features))
        self._feat_memo: dict = {}

    def _feature(self, tok: str) -> int:
        f = self._feat_memo.get(tok)
        if f is None:
            f = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8],
                    16) % self.n_features
            self._feat_memo[tok] = f
        return f

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        raws, ns = [], []
        w = self.weights
        for text in batch["text"]:
            toks = (text or "").split()
            if toks:
                feats = np.fromiter((self._feature(t) for t in toks),
                                    dtype=np.int64, count=len(toks))
                raw = int(w[feats].sum())  # exact int64 accumulation
            else:
                raw = 0
            raws.append(raw)
            ns.append(len(toks))
        raws = np.array(raws, dtype="int64")
        ns = np.array(ns, dtype="int64")
        # mean per-token logit in [-1, 1), then a sigmoid squash; the
        # float math runs on integers that already match the oracle
        logit = np.where(ns > 0, raws / (ns * float(1 << 31)), 0.0)
        return pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "raw_score": raws,
            "n_tokens": ns,
            "quality_prob": 1.0 / (1.0 + np.exp(-logit)),
        })


def linear_quality_scores(ds, n_features: int = N_FEATURES,
                          weights: Optional[np.ndarray] = None,
                          concurrency: int = 4, batch_size: int = 256):
    """Score every doc with the hashed-feature linear model; actor pool
    so the weight table / memo are built once per worker."""
    return ds.map_batches(
        LinearQualityStage, batch_format="pandas",
        fn_constructor_kwargs={"n_features": n_features,
                               "weights": weights},
        concurrency=concurrency, batch_size=batch_size, num_cpus=1)
