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


def association_rules(ds, min_support: int = 2,
                      user_col: str = "user_id",
                      type_col: str = "event_type",
                      num_partitions=None) -> pd.DataFrame:
    """Pairwise association rules over per-user event-type BASKETS
    (Agrawal & Srikant's market-basket shape, restricted to pairs):
    for every ordered type pair (a -> b) with joint user support >=
    ``min_support``,

        support    = |users with both|            (exact int)
        confidence = support / |users with a|     (rounded)
        lift_x_n   = support * n_users vs |a|*|b| (exact cross-ratio)

    Unlike frequent_event_trigrams (ORDERED consecutive patterns)
    this is order-free co-presence — the which-behaviors-travel-
    together rule miner.

    Shape at scale: one user-keyed shuffle co-locates each user's
    basket; per-partition distinct (user, type) pairs expand to
    within-user type pairs (alphabet-bounded: T^2 per user max);
    ONE bounded (a, b) aggregate + the bounded per-type user counts.
    Returns (a, b, support, n_a, n_b, confidence, lift)."""
    import ray

    from warcio_ray.ops.blocks import tree_aggregate

    if num_partitions is None:
        num_partitions = min(
            32, max(2, int(ray.cluster_resources().get("CPU", 8))))

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[[user_col, type_col]].copy()
        batch["_part"] = (batch[user_col].astype("int64")
                          % num_partitions).astype("int32")
        return batch

    def pairs(grp: pd.DataFrame) -> pd.DataFrame:
        m = grp[[user_col, type_col]].drop_duplicates()
        rows = {"a": [], "b": [], "n": []}
        singles = {"t": [], "n": []}
        for _, bg in m.groupby(user_col, sort=False):
            ts = sorted(bg[type_col].tolist())
            for t in ts:
                singles["t"].append(t)
                singles["n"].append(1)
            for i in range(len(ts)):
                for j in range(len(ts)):
                    if i != j:
                        rows["a"].append(ts[i])
                        rows["b"].append(ts[j])
                        rows["n"].append(1)
        p = pd.DataFrame(rows).groupby(["a", "b"], as_index=False) \
            .sum() if rows["a"] else \
            pd.DataFrame({"a": pd.Series(dtype=object),
                          "b": pd.Series(dtype=object),
                          "n": pd.Series(dtype="int64")})
        s = pd.DataFrame(singles).groupby("t", as_index=False).sum() \
            if singles["t"] else \
            pd.DataFrame({"t": pd.Series(dtype=object),
                          "n": pd.Series(dtype="int64")})
        s = s.rename(columns={"t": "a"})
        s["b"] = ""
        u = pd.DataFrame({"a": ["\x00users"], "b": [""],
                          "n": [m[user_col].nunique()]})
        return pd.concat([p, s[["a", "b", "n"]], u],
                         ignore_index=True).astype({"n": "int64"})

    cells = tree_aggregate(
        ds.map_batches(add_part, batch_format="pandas")
        .groupby("_part").map_groups(pairs, batch_format="pandas"),
        ["a", "b"], sums=("n",))
    if len(cells) == 0:
        return pd.DataFrame({c: pd.Series(dtype="object" if c in
                             ("a", "b") else "int64") for c in
                             ("a", "b", "support", "n_a", "n_b",
                              "confidence", "lift")})
    n_users = int(cells.loc[(cells["a"] == "\x00users"), "n"].sum())
    singles = cells[(cells["b"] == "") & (cells["a"] != "\x00users")] \
        .set_index("a")["n"].astype("int64").to_dict()
    out = []
    pair_rows = cells[cells["b"] != ""]
    for a, b, n in pair_rows.itertuples(index=False):
        n = int(n)
        if n < min_support:
            continue
        na, nb = singles[a], singles[b]
        out.append((a, b, n, na, nb, round(n / na, 6),
                    round((n * n_users) / (na * nb), 6)))
    return pd.DataFrame(out, columns=["a", "b", "support", "n_a",
                                      "n_b", "confidence", "lift"]) \
        .sort_values(["a", "b"]).reset_index(drop=True) \
        .astype({"support": "int64", "n_a": "int64", "n_b": "int64"})
