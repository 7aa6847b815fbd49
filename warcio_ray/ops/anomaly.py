"""Per-group z-score outlier detection with EXACT integer arithmetic —
the length/metric anomaly gate of web-curation pipelines (a page 3
sigma longer than its host's norm is a listing/trap/dump; a too-short
one is an error page). The usual float z-score breaks hash-identical
replay, so the test |z| >= T runs as the cross-multiplied integer
inequality

    (n*x - s)^2 * 100^2  >=  T_pct^2 * (n*q - s^2)

(s = sum, q = sum of squares, population variance, T_pct = 100*T) —
no division, no sqrt, no float, so the flag decision is bitwise
reproducible and SQL-identical (DuckDB evaluates the same products in
HUGEINT).

Scale shape: per-group (n, s, q) folds through a bounded combiner tree
(groups = hosts, a small key space), broadcast once via ``ray.put``
into a stateless filter scan. Nothing group- or corpus-sized touches
the driver. int64 bounds: requires n*max(x) and the two products above
inside int64 — asserted per batch; a corpus beyond that needs the
128-bit evaluation (DuckDB-side precedent) or per-shard groups.

No reference counterpart — curation operator per the build brief.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

__all__ = ["group_zscore_outliers", "benford_digits"]

_I64 = np.iinfo(np.int64).max


def group_zscore_outliers(ds, group_col: str, val_col: str,
                          id_col: str = "doc_id", z_pct: int = 200):
    """Rows whose ``val_col`` deviates from the ``group_col`` mean by
    at least ``z_pct``/100 population standard deviations. Returns a
    Dataset of (id_col, group_col, val_col); groups with n < 2 never
    flag (zero variance likewise flags nothing unless n*x != s, which
    cannot happen there)."""
    import ray

    from warcio_ray.ops.blocks import tree_aggregate

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch[group_col].to_numpy(dtype="int64")
        x = batch[val_col].to_numpy(dtype="int64")
        ug, inv = np.unique(g, return_inverse=True)
        n = np.bincount(inv).astype("int64")
        s = np.zeros(len(ug), dtype=np.int64)
        q = np.zeros(len(ug), dtype=np.int64)
        np.add.at(s, inv, x)
        np.add.at(q, inv, x * x)
        return pd.DataFrame({group_col: ug, "n": n, "s": s, "q": q})

    agg = tree_aggregate(ds.map_batches(partial, batch_format="pandas"),
                         [group_col], sums=("n", "s", "q"))
    agg = agg.sort_values(group_col).reset_index(drop=True)
    stats = (agg[group_col].to_numpy(dtype="int64"),
             agg["n"].to_numpy(dtype="int64"),
             agg["s"].to_numpy(dtype="int64"),
             agg["q"].to_numpy(dtype="int64"))
    sref = ray.put(stats)
    zz = int(z_pct) * int(z_pct)

    def flag(batch: pd.DataFrame) -> pd.DataFrame:
        gk, n, s, q = ray.get(sref)
        g = batch[group_col].to_numpy(dtype="int64")
        x = batch[val_col].to_numpy(dtype="int64")
        p = np.searchsorted(gk, g)
        ng, sg, qg = n[p], s[p], q[p]
        num = ng * x - sg
        den = ng * qg - sg * sg
        # int64 overflow guards: both products must stay exact
        assert not len(x) or (
            abs(num).max(initial=0) <= 30370004  # floor(sqrt(2^63/1e4))
            and den.max(initial=0) <= _I64 // zz), \
            "z-score products exceed int64; evaluate in 128-bit"
        keep = (ng >= 2) & (num * num * 10000 >= zz * den)
        return batch.loc[keep, [id_col, group_col, val_col]]

    return ds.map_batches(flag, batch_format="pandas")


def benford_digits(ds, value_col: str = "value",
                   qbits: int = 32) -> pd.DataFrame:
    """Benford first-significant-digit audit — the classic fabricated-
    numbers detector (metrics that should span scales follow
    log-uniform digit mass; uniform or hand-made values don't). Each
    digit row carries its observed count, the quantized Benford
    expectation e_q = N * floor(log10(1+1/d) * 2^qbits + 0.5), and an
    exact per-digit chi-square part ((o<<qbits) - e_q)^2 // e_q —
    consumers sum the parts for the test statistic.

    The nine expectation constants are Python-evaluated and inlined
    into the SQL oracle, so no runtime libm call has to agree; the
    only shared-libm op is the first-digit extraction itself
    (floor(log10) + pow), identical IEEE doubles on both engines.

    Shape at scale: one stateless scan folds to a 9-cell histogram
    per batch; the combiner tree moves 9 rows per task. Returns 9
    rows (digit, n, e_q, chi2_part)."""
    from warcio_ray.ops.blocks import tree_aggregate

    # scalar-pow lookup: numpy's VECTORIZED np.power is a SIMD
    # approximation (np.power(10.0, [-1.0]) = 0.0999...9, one ulp off
    # the correctly-rounded 0.1) and disagrees with DuckDB/libm at
    # digit boundaries (60.0 scaled to 5.999... -> digit 5). Python's
    # scalar ** is correctly rounded and matches SQL pow bit-for-bit.
    pows = np.array([10.0 ** k for k in range(-60, 61)],
                    dtype=np.float64)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[value_col].to_numpy(dtype=np.float64)
        v = v[np.isfinite(v) & (v > 0)]
        if not len(v):
            return pd.DataFrame({"digit": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        e = np.clip(np.floor(np.log10(v)).astype(np.int64), -60, 60)
        d = np.floor(v * pows[60 - e]).astype("int64")
        d = np.clip(d, 1, 9)
        dig, cnt = np.unique(d, return_counts=True)
        return pd.DataFrame({"digit": dig.astype("int64"),
                             "n": cnt.astype("int64")})

    hist = tree_aggregate(ds.map_batches(partial, batch_format="pandas"),
                          ["digit"], sums=("n",))
    counts = {int(r.digit): int(r.n) for r in hist.itertuples(index=False)}
    n_total = sum(counts.values())
    one = 1 << qbits
    rows = []
    for d in range(1, 10):
        p_q = int(math.floor(math.log10(1 + 1 / d) * one + 0.5))
        o = counts.get(d, 0)
        e_q = n_total * p_q
        o_q = o << qbits
        chi2_part = ((o_q - e_q) ** 2) // e_q if e_q else 0
        rows.append((d, o, e_q, chi2_part))
    return pd.DataFrame(rows, columns=["digit", "n", "e_q",
                                       "chi2_part"]).astype("int64")
