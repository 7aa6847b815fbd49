"""HyperLogLog distinct-count sketch (Flajolet et al. 2007) as a Ray
Data combiner — approximate per-key cardinality where an exact
count-distinct would shuffle every value.

Scale shape (the whole point of the sketch): each batch folds its
values into at most ``m = 2**b`` register rows PER KEY before anything
shuffles, the global merge is a ``groupby(key, bucket).max`` over those
bounded partials, and the estimate is a per-key fold over m rows. At
100 TB the exchange is O(#keys x 1024) rows regardless of corpus size;
an exact distinct would be O(distinct values).

Determinism / oracle: value hashes are md5-derived 64-bit ints and the
harmonic-mean denominator is accumulated as EXACT integer numerators
(2^-M_j == 2^(64-M_j) / 2^64, with M_j <= 64), so register tables and
estimates are reproducible at any partitioning and recomputable in
DuckDB (bucket = h >> (64-b); rank via length(bin(w))).

No reference counterpart (warcio has no sketches).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

__all__ = ["hll_distinct", "hll_estimate_from_registers"]

# per-worker-process token hash memo, keyed by precision b
_hash_memo: dict = {}


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))


def hll_estimate_from_registers(regs: np.ndarray, b: int) -> float:
    """regs: dense array of m register values (0 for never-hit).
    Exact-integer harmonic denominator, then the standard small-range
    (linear counting) correction."""
    m = 1 << b
    # pure-Python ints: 2^(64-0) overflows int64, and the sum must be
    # exact for order-independence
    denom_int = sum(1 << (64 - int(r)) for r in regs) if len(regs) \
        else m << 64
    est = _alpha(m) * m * m * float(1 << 64) / float(denom_int)
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return est


def hll_distinct(ds, key_col: str, value_col: str, b: int = 10,
                 tokenize: bool = False):
    """Approximate COUNT(DISTINCT value) per key.

    ``tokenize=True`` treats ``value_col`` as text and counts distinct
    whitespace tokens instead of distinct whole values. Returns a
    pandas DataFrame (key, n_distinct_est) — O(#keys) rows.
    """
    from ray.data.aggregate import Max

    m = 1 << b
    shift = 64 - b
    wmask = (1 << (64 - b)) - 1

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        # worker-global (bucket, rho) memo: distinct tokens hash once
        # per worker, not once per occurrence (the task-cache pattern —
        # an actor pool's spin-up buys nothing for microsecond state)
        hmemo = _hash_memo.setdefault(b, {})
        keys_out, buckets_out, rhos_out = [], [], []
        memo: dict = {}
        for key, val in zip(batch[key_col], batch[value_col]):
            vals = (val or "").split() if tokenize else [val]
            best = memo.setdefault(key, {})
            for v in vals:
                br = hmemo.get(v)
                if br is None:
                    h = int(hashlib.md5(
                        str(v).encode("utf-8")).hexdigest()[:16], 16)
                    w = h & wmask
                    br = (h >> shift, (64 - b) - w.bit_length() + 1)
                    if len(hmemo) < 4_000_000:  # bound worker memory
                        hmemo[v] = br
                bucket, rho = br
                if rho > best.get(bucket, 0):
                    best[bucket] = rho
        for key, best in memo.items():
            for bucket, rho in best.items():
                keys_out.append(key)
                buckets_out.append(bucket)
                rhos_out.append(rho)
        return pd.DataFrame({
            key_col: keys_out,
            "bucket": np.array(buckets_out, dtype="int64"),
            "rho": np.array(rhos_out, dtype="int64")})

    merged = ds.map_batches(partials, batch_format="pandas") \
        .groupby([key_col, "bucket"]).aggregate(Max("rho", alias_name="rho")) \
        .to_pandas()  # O(#keys x m) rows — the already-reduced sketch

    rows = []
    for key, grp in merged.groupby(key_col, sort=True):
        regs = np.zeros(m, dtype=np.int64)
        regs[grp["bucket"].to_numpy(dtype="int64")] = \
            grp["rho"].to_numpy(dtype="int64")
        rows.append((key, hll_estimate_from_registers(regs, b)))
    return pd.DataFrame(rows, columns=[key_col, "n_distinct_est"])
