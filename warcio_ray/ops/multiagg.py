"""Shared-scan batch aggregation — MANY independent group-bys in ONE
pass over the input (the LMFAO idea, Schleich et al., VLDB 2020:
batches of group-by aggregates share one scan and one exchange
instead of re-reading the fact table per dimension). A reporting /
corpus-card workload asks for counts+sums by segment AND by month AND
by priority; the naive plan is k full scans + k shuffles, this is 1+1.

Shape: each batch melts to (dim, key, n, s) partial rows — one row
per (dimension, distinct value) per batch, the map-side combine — and
ONE hash aggregate merges every dimension's groups together (the dim
tag keeps key spaces apart). Sums are exact int64 (money in cents),
so the stacked result is partitioning-invariant and one UNION ALL of
plain GROUP BYs in SQL.

No reference counterpart — OLAP operator per the build brief.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["grouped_multiagg"]


def grouped_multiagg(ds, dims: dict, val_cents_fn):
    """``dims`` maps a dimension name to a callable(batch) -> string
    key Series; ``val_cents_fn(batch)`` returns the int64 measure
    (e.g. price in cents). Returns a Dataset of
    (dim, key, n, sum_cents) covering every dimension from one scan +
    one aggregate."""
    from ray.data.aggregate import Sum

    from warcio_ray.ops.blocks import arrow_blocks

    names = sorted(dims)

    def melt(batch: pd.DataFrame) -> pd.DataFrame:
        v = val_cents_fn(batch)
        outs = []
        for name in names:
            key = dims[name](batch)
            g = pd.DataFrame({"key": key, "n": 1, "s": v}) \
                .groupby("key", sort=False).agg(
                    n=("n", "sum"), s=("s", "sum")).reset_index()
            g.insert(0, "dim", name)
            outs.append(g)
        out = pd.concat(outs, ignore_index=True)
        return out.astype({"n": "int64", "s": "int64"})

    return arrow_blocks(ds.map_batches(melt, batch_format="pandas")) \
        .groupby(["dim", "key"]).aggregate(
            Sum("n", alias_name="n"),
            Sum("s", alias_name="sum_cents"))
