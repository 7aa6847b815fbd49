"""Relational pipelines demonstrating the engine's shuffle-minimizing
groupby/join/sort patterns on the TPC-H-ish tables. Every column name
matches the oracle SQL in __ray_entry__ exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def pricing_summary(sf_dir: str):
    """Q1-style: partial aggregation inside map_batches (one row per key
    per batch) then a tiny groupby — the shuffle moves partials, not rows."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        revenue = pc.multiply(batch["l_extendedprice"],
                              pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        batch = batch.append_column("revenue", revenue)
        df = batch.to_pandas()
        out = df.groupby(["l_returnflag", "l_linestatus"], as_index=False) \
            .agg(sum_qty=("l_quantity", "sum"),
                 sum_price=("l_extendedprice", "sum"),
                 revenue=("revenue", "sum"),
                 n=("l_quantity", "size"))
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_price", alias_name="sum_price"),
        Sum("revenue", alias_name="revenue"),
        Sum("n", alias_name="n"))


def orders_by_segment(sf_dir: str):
    """Broadcast join: customer (small) shipped once via ray.put, orders
    stream through map_batches — no shuffle."""
    import ray
    import ray.data
    from ray.data.aggregate import Count, Sum

    import pyarrow.parquet as pq
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"]).to_pandas()
    cust_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey", "o_totalprice"])

    def join_batch(batch: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(cust_ref)
        seg = batch["o_custkey"].map(lookup)
        return pd.DataFrame({"c_mktsegment": seg,
                             "o_totalprice": batch["o_totalprice"]})

    from warcio_ray.ops.blocks import arrow_blocks

    joined = arrow_blocks(ds.map_batches(join_batch, batch_format="pandas"))
    return joined.groupby("c_mktsegment").aggregate(
        Sum("o_totalprice", alias_name="total_price"),
        Count(alias_name="n_orders"))


def top_customers(sf_dir: str, k: int = 10):
    """Aggregate + global top-k (sort desc, deterministic tiebreak)."""
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey", "o_totalprice"])
    totals = ds.groupby("o_custkey").aggregate(
        Sum("o_totalprice", alias_name="total_price"))
    return totals.sort(["total_price", "o_custkey"],
                       descending=[True, False]).limit(k)


def events_hourly(sf_dir: str):
    """Stream-shaped: tumbling 1-hour windows per event_type
    (groupby key + floor(ts) — ray_guide streaming pattern)."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])

    def bucket(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        return pa.table({"event_type": batch["event_type"],
                         "hour": hour, "value": batch["value"]})

    return ds.map_batches(bucket, batch_format="pyarrow") \
        .groupby(["event_type", "hour"]).aggregate(
            Count(alias_name="n_events"),
            Sum("value", alias_name="sum_value"))


def sessionize_events(sf_dir: str, gap_minutes: int = 30):
    """Session windows per user: sort-within-group + gap split (pandas
    merge/groupby inside map_groups, the reference-free streaming op)."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_id"])

    def sessions(grp: pd.DataFrame) -> pd.DataFrame:
        grp = grp.sort_values(["ts", "event_id"])
        gaps = grp["ts"].diff().dt.total_seconds().fillna(0)
        session = (gaps > gap_minutes * 60).cumsum()
        out = grp.groupby(session).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("event_id", "size"))
        return out.reset_index(drop=True)

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


def asof_join_events(sf_dir: str, left_type: str = "click",
                     right_type: str = "purchase"):
    """As-of join (an operator Ray Data lacks natively): for each
    ``left_type`` event, the most recent ``right_type`` event of the SAME
    user at ts <= left ts.

    Partitioning assumption: hash-partition by user_id
    (groupby.map_groups), sorted merge inside each group — the standard
    distributed as-of shape; user groups are small, nothing global sorts.
    """
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])
    both = ds.filter(expr=f"event_type == '{left_type}' or "
                          f"event_type == '{right_type}'")

    def asof_group(grp: pd.DataFrame) -> pd.DataFrame:
        left = grp[grp["event_type"] == left_type] \
            .sort_values(["ts", "event_id"])
        right = grp[grp["event_type"] == right_type] \
            .sort_values(["ts", "event_id"])
        if not len(left):
            return pd.DataFrame({
                "event_id": pd.Series(dtype="int64"),
                "user_id": pd.Series(dtype="int64"),
                "ts": pd.Series(dtype="datetime64[us]"),
                "matched_ts": pd.Series(dtype="datetime64[us]")})
        if not len(right):
            # a user with left-type events and NO right-type events: all
            # unmatched (indexing an empty array would raise IndexError)
            matched = np.full(len(left), np.datetime64("NaT"),
                              dtype="datetime64[us]")
        else:
            # vectorized backward search: index of last right.ts <= left.ts
            idx = np.searchsorted(right["ts"].to_numpy(),
                                  left["ts"].to_numpy(), side="right") - 1
            matched = np.where(
                idx >= 0,
                right["ts"].to_numpy()[np.maximum(idx, 0)],
                np.datetime64("NaT"))
        return pd.DataFrame({
            "event_id": left["event_id"].to_numpy(),
            "user_id": left["user_id"].to_numpy(),
            "ts": left["ts"].to_numpy(),
            "matched_ts": matched})

    return both.groupby("user_id").map_groups(asof_group,
                                              batch_format="pandas")


def range_count_events(sf_dir: str, window_minutes: int = 5):
    """Range self-join: for each event, how many earlier events of the
    same user fall in [ts - window, ts). Same per-user partitioning as
    the as-of join; two binary searches per row inside the group."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id"])

    def count_group(grp: pd.DataFrame) -> pd.DataFrame:
        grp = grp.sort_values(["ts", "event_id"])
        ts = grp["ts"].to_numpy()
        lo = np.searchsorted(ts, ts - np.timedelta64(window_minutes, "m"),
                             side="left")
        hi = np.searchsorted(ts, ts, side="left")
        return pd.DataFrame({
            "event_id": grp["event_id"].to_numpy(),
            "n_recent": (hi - lo).astype("int64")})

    return ds.groupby("user_id").map_groups(count_group,
                                            batch_format="pandas")


def salted_grouped_topk(ds, group_col: str, sort_cols, ascending,
                        salt_col: str, k: int, salts: int = 16,
                        out_cols=None):
    """Skew-safe per-group top-k: the HOT-KEY SALTING pattern the
    build brief mandates for few-key group-bys. A plain
    ``groupby(g).map_groups(topk)`` with G hot groups puts 1/G of the
    corpus in ONE task's heap; top-k is mergeable, so phase 1 takes a
    LOCAL top-k per (group, salt = hash-of-``salt_col`` % salts) —
    bounding every task at its salt shard — and phase 2 reduces the
    <= G * salts * k survivor rows per group. Results are identical
    to the naive single-phase op for any ``salts`` (top-k of a union
    == top-k of per-part top-k unions), so the oracle is unchanged.

    ``sort_cols``/``ascending`` define the (value, tiebreak) order;
    ``salt_col`` must be high-cardinality (an id column)."""

    sort_cols = list(sort_cols)
    ascending = list(ascending)

    def add_salt(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["_salt"] = (out[salt_col].astype("int64")
                        % salts).astype("int32")
        return out

    def local_topk(grp: pd.DataFrame) -> pd.DataFrame:
        return grp.sort_values(sort_cols, ascending=ascending,
                               kind="mergesort").head(k)

    def final_topk(grp: pd.DataFrame) -> pd.DataFrame:
        grp = grp.sort_values(sort_cols, ascending=ascending,
                              kind="mergesort").head(k)
        cols = out_cols or [c for c in grp.columns if c != "_salt"]
        return grp[cols]

    return ds.map_batches(add_salt, batch_format="pandas") \
        .groupby([group_col, "_salt"]) \
        .map_groups(local_topk, batch_format="pandas") \
        .groupby(group_col).map_groups(final_topk,
                                       batch_format="pandas")


def top_orders_per_segment(sf_dir: str, k: int = 3):
    """Windowed top-k per group: broadcast-join segment onto orders,
    then SALTED two-phase per-segment top-k by (total desc, orderkey)
    — 5 segments is the textbook hot-key case, so the naive
    one-task-per-segment map_groups is replaced by
    ``salted_grouped_topk`` (identical results, bounded task heaps)."""
    import ray
    import ray.data

    import pyarrow.parquet as pq
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"]).to_pandas()
    cust_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(cust_ref)
        out = batch.copy()
        out["c_mktsegment"] = batch["o_custkey"].map(lookup)
        return out

    return salted_grouped_topk(
        ds.map_batches(tag, batch_format="pandas"),
        group_col="c_mktsegment",
        sort_cols=["o_totalprice", "o_orderkey"],
        ascending=[False, True], salt_col="o_orderkey", k=k,
        out_cols=["c_mktsegment", "o_orderkey", "o_totalprice"])


def events_sliding(sf_dir: str, window_minutes: int = 60,
                   hop_minutes: int = 30):
    """Sliding (hopping) window aggregate: 1-hour windows every 30
    minutes — each event lands in window_minutes/hop_minutes windows,
    emitted as exploded (event_type, wstart) rows inside map_batches,
    then one groupby. The standard streaming hop shape: the explode is
    map-side, only (key, window) rows shuffle."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    hops = window_minutes // hop_minutes
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])

    def explode_hops(batch: pd.DataFrame) -> pd.DataFrame:
        floor = batch["ts"].dt.floor(f"{hop_minutes}min")
        frames = []
        for i in range(hops):
            frames.append(pd.DataFrame({
                "event_type": batch["event_type"],
                "wstart": floor - pd.Timedelta(minutes=hop_minutes * i),
                "value": batch["value"]}))
        return pd.concat(frames, ignore_index=True)

    from warcio_ray.ops.blocks import arrow_blocks

    return arrow_blocks(
        ds.map_batches(explode_hops, batch_format="pandas")) \
        .groupby(["event_type", "wstart"]).aggregate(
            Count(alias_name="n_events"),
            Sum("value", alias_name="sum_value"))


def funnel_events(sf_dir: str, steps=("view", "click", "purchase"),
                  window_minutes: int = 60):
    """Ordered-funnel completion per user (the CEP/conversion query:
    did step1 <= step2 <= step3 happen within the window, and how
    fast): for each user with at least one valid ordered triple whose
    total span fits the window, the MINIMUM span in exact integer
    microseconds. No reference counterpart — streaming-analytics
    operator per the build brief.

    Kernel logic (per user, vectorized): for each final-step event,
    the latest mid-step event at-or-before it, then the latest
    first-step event at-or-before THAT — the latest-anchored triple
    minimizes the span for that final event; the per-user answer is
    the min over final events. Two searchsorted passes, no triple
    loop. Shape: one user-keyed shuffle of the narrow (user, type,
    ts) projection; each group is one user's events."""
    import numpy as np
    import ray.data

    s1, s2, s3 = steps
    win_us = np.int64(window_minutes) * 60_000_000

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_type"])

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["event_type"].isin([s1, s2, s3])]

    def funnel(grp: pd.DataFrame) -> pd.DataFrame:
        ts = grp["ts"].to_numpy("datetime64[ns]").astype("int64") // 1000
        typ = grp["event_type"].to_numpy()
        t1 = np.sort(ts[typ == s1])
        t2 = np.sort(ts[typ == s2])
        t3 = ts[typ == s3]
        empty = pd.DataFrame({
            "user_id": pd.Series(dtype="int64"),
            "min_duration_us": pd.Series(dtype="int64")})
        if not (len(t1) and len(t2) and len(t3)):
            return empty
        i2 = np.searchsorted(t2, t3, side="right") - 1  # latest s2 <= s3
        ok = i2 >= 0
        i1 = np.searchsorted(t1, t2[np.maximum(i2, 0)],
                             side="right") - 1           # latest s1 <= s2
        ok &= i1 >= 0
        if not ok.any():
            return empty
        dur = t3[ok] - t1[i1[ok]]
        dur = dur[dur <= win_us]
        if not len(dur):
            return empty
        return pd.DataFrame({
            "user_id": grp["user_id"].iloc[:1].astype("int64"),
            "min_duration_us": np.int64(dur.min())})

    return ds.map_batches(pick, batch_format="pandas") \
        .groupby("user_id").map_groups(funnel, batch_format="pandas")


def cohort_retention(sf_dir: str):
    """Weekly cohort-retention matrix (the classic activity analysis):
    each user joins the cohort of their first event's epoch-week; for
    every (cohort_week, week_offset) cell, how many cohort members
    were active that week. Exact integer week arithmetic
    (epoch_us // 604800000000), SQL-identical.

    Shape: one user-keyed shuffle of the narrow (user, ts) projection
    — the per-user kernel emits its distinct offsets — then one
    bounded (cohorts x offsets) hash aggregate; each user contributes
    one row per active week, so nothing user-sized aggregates on the
    driver."""
    import numpy as np
    import ray.data
    from ray.data.aggregate import Count

    from warcio_ray.ops.blocks import arrow_blocks

    WEEK_US = np.int64(7 * 86400 * 1_000_000)

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])

    def per_user(grp: pd.DataFrame) -> pd.DataFrame:
        wk = grp["ts"].to_numpy("datetime64[ns]").astype("int64") \
            // 1000 // WEEK_US
        c = wk.min()
        offs = np.unique(wk - c)
        return pd.DataFrame({
            "cohort_week": np.full(len(offs), c, dtype="int64"),
            "week_offset": offs.astype("int64")})

    rows = ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pandas")
    return arrow_blocks(rows).groupby(["cohort_week", "week_offset"]) \
        .aggregate(Count(alias_name="n_users"))


def burst_hours(events_ds, window: int = 24, num: int = 5,
                den: int = 4, ts_col: str = "ts"):
    """Traffic-burst detection over the event stream (the crawl-ops /
    monitoring artifact: which hours ran hot vs their trailing
    baseline). Flags every hour whose event count exceeds num/den
    times the mean of the ``window`` preceding hours — all-integer
    test (exact, partitioning-invariant):

        cnt * window * den > num * trailing_sum

    evaluated only where a FULL trailing window of ``window`` distinct
    preceding hours exists (ROWS semantics over present hours, like
    the SQL mirror). Returns (hour, cnt, trail) for flagged hours.

    Scale shape: ONE corpus scan folds (hour, cnt) partials through
    the tree combiner — the hour key space is bounded by the stream's
    calendar span, not its row count — then the trailing sums are a
    vectorized driver cumsum over that bounded series. Nothing
    row-scale ever reaches the driver.
    """
    import ray.data

    from warcio_ray.ops.blocks import tree_aggregate

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        hours = batch[ts_col].dt.floor("h")
        vc = hours.value_counts()
        return pd.DataFrame({"hour": vc.index,
                             "cnt": vc.to_numpy(dtype="int64")})

    agg = tree_aggregate(
        events_ds.map_batches(fold, batch_format="pandas"),
        ["hour"], sums=("cnt",))
    agg = agg.sort_values("hour").reset_index(drop=True)
    cnt = agg["cnt"].to_numpy(dtype="int64")
    cum = np.concatenate([[0], np.cumsum(cnt)])
    # trailing sum over the `window` PRESENT rows before row i
    lo = np.maximum(np.arange(len(cnt)) - window, 0)
    trail = cum[np.arange(len(cnt))] - cum[lo]
    nprev = np.arange(len(cnt)) - lo
    flag = (nprev == window) & (cnt * window * den > num * trail)
    out = pd.DataFrame({"hour": agg["hour"][flag],
                        "cnt": cnt[flag],
                        "trail": trail[flag]}).reset_index(drop=True)
    return ray.data.from_pandas(out) if len(out) else \
        ray.data.from_pandas(pd.DataFrame({
            "hour": pd.Series(dtype="datetime64[us]"),
            "cnt": pd.Series(dtype="int64"),
            "trail": pd.Series(dtype="int64")}))


def json_props_rollup(events_ds, key: str = "k",
                      props_col: str = "props",
                      group_col: str = "event_type"):
    """Schema-on-read JSON property extraction + rollup — the
    semi-structured event-payload op (per-group exact stats of a
    numeric JSON field). Extraction uses a vectorized Arrow RE2
    kernel matching the spec JSON number production for FLAT objects
    (`"key" : -?digits`) — the zero-copy fast path for the
    overwhelmingly common flat-props case; nested objects that repeat
    the key inside sub-objects are outside this contract (a real
    parser belongs in an actor-pool stage at that point). Rows whose
    props lack the key are counted separately (``n_missing``).

    ONE pyarrow scan folds (group, n, n_missing, sum, min, max)
    partials — bounded by the group key space — through the tree
    combiner. All exact int64.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from warcio_ray.ops.blocks import tree_aggregate

    import re as _re
    pat = '"' + _re.escape(key) + r'"\s*:\s*(?P<v>-?\d+)'

    def fold(batch: pa.Table) -> pd.DataFrame:
        s = pc.cast(batch[props_col], pa.large_string())
        ex = pc.extract_regex(s, pat)
        v = pc.struct_field(ex, "v")
        present = pc.is_valid(v)
        vi = pc.cast(v, pa.int64())
        g = batch[group_col].to_pandas()
        df = pd.DataFrame({
            "g": g,
            "p": present.to_pandas().fillna(False).astype(bool),
            "v": vi.to_pandas()})
        SENT = 1 << 62  # absent-partial sentinel, far outside int32 k
        out = []
        for grp, sub in df.groupby("g", sort=False):
            pv = sub.loc[sub["p"], "v"]
            out.append((grp, len(sub), int((~sub["p"]).sum()),
                        int(pv.sum()) if len(pv) else 0,
                        # min folds as a MAX of the negation (the
                        # combiner tree only speaks sums/maxs)
                        -int(pv.min()) if len(pv) else -SENT,
                        int(pv.max()) if len(pv) else -SENT))
        return pd.DataFrame(out, columns=[
            group_col, "n", "n_missing", "sum_v", "neg_min_v",
            "max_v"])

    agg = tree_aggregate(
        events_ds.map_batches(fold, batch_format="pyarrow"),
        [group_col], sums=("n", "n_missing", "sum_v"),
        maxs=("neg_min_v", "max_v"))
    agg["min_v"] = -agg["neg_min_v"].astype("int64")
    agg = agg.drop(columns=["neg_min_v"])
    return agg.sort_values(group_col).reset_index(drop=True)


def rollup_counts(ds, cols, price_col: str = None):
    """SQL ROLLUP over a bounded pair of group columns — subtotal rows
    at every prefix granularity ((a, b), (a), ()) like
    ``GROUP BY ROLLUP(a, b)``, the OLAP report shape. Numeric mass is
    carried as exact integer CENTS (floor(x*100 + 0.5), exact for
    2-decimal money) so subtotals are order-independent — never a
    float sum.

    ONE corpus scan folds finest-level (a, b, n, cents) partials
    through the combiner tree (bounded key space); the coarser levels
    are driver-side integer sums over that bounded table. NULL group
    values render as the sentinel '(all)' so the row set is
    hash-comparable across engines.
    """
    from warcio_ray.ops.blocks import tree_aggregate

    a_col, b_col = cols

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame({
            "a": batch[a_col].astype(str),
            "b": batch[b_col].astype(str)})
        if price_col is not None:
            df["cents"] = np.floor(
                batch[price_col].to_numpy(np.float64) * 100.0
                + 0.5).astype("int64")
        else:
            df["cents"] = np.int64(0)
        g = df.groupby(["a", "b"], sort=False) \
            .agg(n=("cents", "size"), cents=("cents", "sum")) \
            .reset_index()
        return g.astype({"n": "int64", "cents": "int64"})

    fine = tree_aggregate(
        ds.map_batches(fold, batch_format="pandas"),
        ["a", "b"], sums=("n", "cents"))
    mid = fine.groupby("a", as_index=False)[["n", "cents"]].sum()
    mid["b"] = "(all)"
    top = pd.DataFrame({"a": ["(all)"], "b": ["(all)"],
                        "n": [fine["n"].sum()],
                        "cents": [fine["cents"].sum()]})
    out = pd.concat([fine, mid, top], ignore_index=True) \
        [["a", "b", "n", "cents"]] \
        .sort_values(["a", "b"]).reset_index(drop=True)
    return out.rename(columns={"a": a_col, "b": b_col}) \
        .astype({"n": "int64", "cents": "int64"})


def ab_chisquare(events_ds, success_type: str = "purchase",
                 user_col: str = "user_id",
                 type_col: str = "event_type"):
    """Two-proportion chi-square over a deterministic A/B assignment
    (user_id parity = arm) — the experiment-analysis primitive run
    against event streams. Counts are exact int64 folded through the
    combiner tree (4 cells); the statistic is computed driver-side
    from PYTHON ints (no int64 overflow on (ad-bc)^2 at any n) and
    rounded for cross-engine compare:

        chi2 = n * (a*d - b*c)^2 / ((a+b) * (c+d) * (a+c) * (b+d))

    with a/b = arm-0 successes/failures, c/d = arm-1. Returns one row
    (a, b, c, d, chi2); a degenerate margin (any factor 0) yields
    chi2 = 0.0 by convention.
    """
    from warcio_ray.ops.blocks import tree_aggregate

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        arm = (batch[user_col].to_numpy(dtype="int64") % 2)
        suc = (batch[type_col] == success_type).to_numpy()
        df = pd.DataFrame({"arm": arm, "s": suc.astype("int64")})
        g = df.groupby(["arm", "s"], sort=False).size() \
            .reset_index(name="c")
        return g.astype({"c": "int64"})

    cells = tree_aggregate(
        events_ds.map_batches(fold, batch_format="pandas"),
        ["arm", "s"], sums=("c",))
    cnt = {(int(r.arm), int(r.s)): int(r.c)
           for r in cells.itertuples()}
    a, b = cnt.get((0, 1), 0), cnt.get((0, 0), 0)
    c, d = cnt.get((1, 1), 0), cnt.get((1, 0), 0)
    n = a + b + c + d
    den = (a + b) * (c + d) * (a + c) * (b + d)
    # cast numerator/denominator to double BEFORE dividing (matching
    # SQL's CAST AS DOUBLE semantics): the exact-int numerator can
    # exceed 2^53, and Python's exact-rational int/int division would
    # round differently at ulp boundaries
    chi2 = round(float(n * (a * d - b * c) ** 2) / float(den), 6) \
        if den else 0.0
    return pd.DataFrame({"a": [a], "b": [b], "c": [c], "d": [d],
                         "chi2": [chi2]}).astype(
        {"a": "int64", "b": "int64", "c": "int64", "d": "int64"})


def bloom_semijoin_stats(build_ds, probe_ds, build_key: str,
                         probe_key: str, m_bits: int = 1 << 14,
                         k_hashes: int = 3,
                         num_partitions=None) -> pd.DataFrame:
    """Bloom-filter SEMI-JOIN PUSHDOWN with exact false-positive
    accounting — the shuffle-avoidance pattern for selective joins: a
    bounded bit set built from the small side broadcasts once
    (``ray.put``); the big probe side filters BEFORE any exchange, so
    only pass rows would ever shuffle. No false negatives (every true
    match passes); the op quantifies the price (false passes) at the
    chosen m/k so the sizing trade-off is measured, not guessed.

    The bit rule is ``bloom_bits``'s md5 contract, so the SQL oracle
    rebuilds the identical filter. The exact true-match count is an
    accounting extra: probe batches emit their batch-DISTINCT keys
    with counts, and one hash semi-join against the distinct build-key
    Dataset sums the matched counts — no O(build-side) driver
    structure anywhere (only the bounded ``m_bits`` filter
    broadcasts).

    Returns ONE row (n_build, n_probe, n_pass, n_true, n_false_pos).
    """
    import hashlib

    import ray
    from ray.data.aggregate import Count

    from warcio_ray.ops.blocks import arrow_blocks, safe_join, \
        tree_aggregate
    from warcio_ray.ops.sketch import bloom_bits

    if num_partitions is None:
        num_partitions = min(
            32, max(2, int(ray.cluster_resources().get("CPU", 8))))

    def to_str(col, ds):
        def conv(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"v": batch[col].astype(str)})
        return ds.map_batches(conv, batch_format="pandas")

    build_keys = to_str(build_key, build_ds).materialize()
    bits = bloom_bits(build_keys, "v", m_bits=m_bits,
                      k_hashes=k_hashes)
    bits_ref = ray.put(bits)
    distinct_build = arrow_blocks(build_keys).groupby("v") \
        .aggregate(Count(alias_name="_c")).drop_columns(["_c"]) \
        .materialize()
    n_build = distinct_build.count()

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        """Mixed rows: one kind=0 stats row (n_probe, n_pass) plus
        kind=1 (v, cnt) batch-distinct probe keys for the true-match
        semi-join."""
        bts = ray.get(bits_ref)
        vals = batch[probe_key].astype(str)
        uniq, counts = np.unique(vals.to_numpy(dtype=object),
                                 return_counts=True)
        ok = np.zeros(len(uniq), dtype=bool)
        for j, v in enumerate(uniq):
            pos = [int(hashlib.md5(f"{v}:{i}".encode())
                       .hexdigest()[:8], 16) % m_bits
                   for i in range(k_hashes)]
            p = np.searchsorted(bts, pos)
            ok[j] = bool(np.all((p < len(bts)) & (
                bts[np.minimum(p, len(bts) - 1)] == pos))) \
                if len(bts) else False
        return pd.DataFrame({
            "kind": np.concatenate([[np.int64(0)],
                                    np.ones(len(uniq), dtype="int64")]),
            "n_probe": np.concatenate([[np.int64(len(vals))],
                                       np.zeros(len(uniq),
                                                dtype="int64")]),
            "n_pass": np.concatenate([[np.int64((ok * counts).sum())],
                                      np.zeros(len(uniq),
                                               dtype="int64")]),
            "v": np.concatenate([[""], uniq]),
            "cnt": np.concatenate([[np.int64(0)],
                                   counts.astype("int64")])})

    mixed = probe_ds.map_batches(probe,
                                 batch_format="pandas").materialize()

    def stats_only(batch: pd.DataFrame) -> pd.DataFrame:
        st = batch[batch["kind"] == 0]
        return pd.DataFrame({"_k": np.zeros(len(st), dtype="int64"),
                             "n_probe": st["n_probe"].to_numpy("int64"),
                             "n_pass": st["n_pass"].to_numpy("int64")})

    s = tree_aggregate(mixed.map_batches(stats_only,
                                         batch_format="pandas"),
                       ["_k"], sums=("n_probe", "n_pass"))
    n_probe = int(s["n_probe"].iloc[0]) if len(s) else 0
    n_pass = int(s["n_pass"].iloc[0]) if len(s) else 0

    keys = mixed.map_batches(
        lambda b: b[b["kind"] == 1][["v", "cnt"]],
        batch_format="pandas")
    matched = safe_join(keys, distinct_build, "inner",
                        num_partitions, ("v",))
    n_true = int(matched.sum("cnt") or 0)
    return pd.DataFrame([{
        "n_build": n_build, "n_probe": n_probe, "n_pass": n_pass,
        "n_true": n_true, "n_false_pos": n_pass - n_true}]) \
        .astype("int64")
