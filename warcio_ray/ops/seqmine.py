"""Sequential pattern mining over an event stream — frequent
consecutive event-type trigrams with per-user (sequence-level)
support, the GSP/PrefixSpan-style building block behind funnel
discovery and session-behavior analytics (support = number of DISTINCT
users whose ordered stream contains the pattern, the standard
sequence-database definition).

Scale shape: ONE hash shuffle keyed by user (add_part ->
groupby(part).map_groups with a vectorized per-partition kernel — the
collapse_captures pattern: per-partition sort + shifted-array trigram
build + local distinct, all numpy/pandas, no per-user Python loop),
then a bounded combiner tree over the trigram key space (|event
types|^3 — tiny by construction). A user's events co-locate in one
partition, so the local (user, trigram) distinct is globally exact and
only (trigram, partial count) rows leave the wide stage.

No reference counterpart — analytics operator per the build brief.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["frequent_event_trigrams"]


def frequent_event_trigrams(ds, min_users: int = 5,
                            user_col: str = "user_id",
                            type_col: str = "event_type",
                            ts_col: str = "ts",
                            id_col: str = "event_id",
                            num_partitions: int | None = None):
    """Consecutive event-type trigrams (ordered by ``ts`` then
    ``id_col`` within each user) appearing in at least ``min_users``
    distinct users' streams. Returns a pandas DataFrame
    (e1, e2, e3, n_users) — bounded by the cubed event-type alphabet,
    so the collect is small by construction."""
    import ray

    from warcio_ray.ops.blocks import tree_aggregate

    if num_partitions is None:
        num_partitions = min(
            32, max(2, int(ray.cluster_resources().get("CPU", 8))))

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[[user_col, type_col, ts_col, id_col]].copy()
        batch["_part"] = (batch[user_col].astype("int64")
                          % num_partitions).astype("int32")
        return batch

    def trigrams(grp: pd.DataFrame) -> pd.DataFrame:
        grp = grp.sort_values([user_col, ts_col, id_col],
                              kind="mergesort")
        u = grp[user_col].to_numpy(dtype="int64")
        t = grp[type_col].to_numpy(dtype=object)
        if len(u) < 3:
            return pd.DataFrame({"e1": pd.Series(dtype=object),
                                 "e2": pd.Series(dtype=object),
                                 "e3": pd.Series(dtype=object),
                                 "n": pd.Series(dtype="int64")})
        same = (u[:-2] == u[1:-1]) & (u[1:-1] == u[2:])
        tri = pd.DataFrame({"u": u[:-2][same], "e1": t[:-2][same],
                            "e2": t[1:-1][same], "e3": t[2:][same]})
        # a user's stream is wholly in this partition, so the local
        # per-user distinct is globally exact
        tri = tri.drop_duplicates()
        out = tri.groupby(["e1", "e2", "e3"], sort=False).size() \
            .reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    parts = ds.map_batches(add_part, batch_format="pandas") \
        .groupby("_part").map_groups(trigrams, batch_format="pandas")
    counts = tree_aggregate(parts, ["e1", "e2", "e3"], sums=("n",))
    counts = counts[counts["n"] >= min_users]
    return counts.rename(columns={"n": "n_users"}) \
        .sort_values(["e1", "e2", "e3"]).reset_index(drop=True) \
        .astype({"n_users": "int64"})
