"""Exact distributed quantiles over an integer-valued column via a
value histogram — the percentile primitive a corpus-curation pipeline
needs for length/quality cutoffs ("drop the bottom decile by token
count") without sorting the corpus.

Scale shape: each batch folds its values into (value, count) partials
(a value_counts — output bounded by the batch's distinct values), the
global merge is ``groupby(value).sum`` whose key space is the column's
DISTINCT values, and the driver fold is a cumsum over that histogram.
For the integer stats this targets (token counts, char lengths, link
counts) the distinct-value space is bounded by the max document length
— thousands of rows at 100 TB, corpus-size independent — so this is
the EXACT path, no sketch error. (A continuous float column would need
a KLL/t-digest sketch instead; out of scope here, documented so the
boundary is explicit.)

Determinism / oracle: rank selection is pure integer arithmetic —
rank(p) = ceil(p/100 * n) computed as (p*n + 99) // 100 — so DuckDB
reproduces it with a window cumsum, no float percentile semantics
involved (quantile_disc/quantile_cont interpolation rules never enter).

No reference counterpart (warcio has no relational layer).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["histogram_quantiles"]


def histogram_quantiles(ds, value_col: str, pcts=(10, 25, 50, 75, 90, 99)
                        ) -> pd.DataFrame:
    """Exact p-th percentiles (1-indexed rank (p*n+99)//100, i.e. the
    smallest value whose cumulative count reaches the rank) of an
    integer column. Returns (pct, value) rows, one per requested pct.

    Null values are excluded (matching SQL aggregate semantics).
    """
    from warcio_ray.ops.blocks import tree_aggregate

    pcts = sorted(int(p) for p in pcts)
    if not pcts or pcts[0] < 1 or pcts[-1] > 100:
        raise ValueError("pcts must be integers in 1..100")

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch[value_col].dropna().astype("int64").value_counts()
        return pd.DataFrame({"v": vc.index.to_numpy(dtype="int64"),
                             "c": vc.to_numpy(dtype="int64")})

    # bounded key space (distinct integer values) -> vectorized
    # combiner tree, not Ray's per-group sort aggregate
    hist = tree_aggregate(
        ds.map_batches(partials, batch_format="pandas"),
        ["v"], sums=("c",))  # O(distinct values) rows
    if len(hist) == 0:
        return pd.DataFrame({"pct": pd.Series([], dtype="int64"),
                             "value": pd.Series([], dtype="int64")})
    hist = hist.sort_values("v", kind="mergesort").reset_index(drop=True)
    cum = hist["c"].to_numpy(dtype="int64").cumsum()
    vals = hist["v"].to_numpy(dtype="int64")
    n = int(cum[-1])
    out = []
    for p in pcts:
        rank = (p * n + 99) // 100  # integer ceil(p/100 * n), 1-indexed
        out.append((p, int(vals[int(np.searchsorted(cum, rank))])))
    return pd.DataFrame(out, columns=["pct", "value"]).astype("int64")
