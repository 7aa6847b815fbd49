"""Streaming-semantics operators over event logs.

Out-of-order / late-data accounting is the one streaming concept the
engine did not yet model: given an ARRIVAL order (here the stable
``event_id`` order of the log), a watermark trails the running maximum
event-time by a fixed lag, and an event is *late* when its own
event-time is already behind the watermark at the moment it arrives
(Ray Data has no notion of this; reference warcio has no event layer at
all — this is part of the LLM-data/streaming extension surface).

The core primitive is a distributed PREFIX MAX over a total order —
same scale shape as ops/textstats.shuffle_order's distributed rank:
bucket by id range, per-bucket maxima fold to an O(#buckets) driver
array, exclusive prefix max broadcasts back, one hash shuffle gives
each bucket its rows for the vectorized in-bucket running max. No
global sort, no driver materialization of the log.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def late_event_flags(events_ds, lag_us: int, id_col: str = "event_id",
                     ts_col: str = "ts", bucket_size: int = 4096):
    """Per-event watermark lateness over arrival order ``id_col``.

    watermark(i) = max(ts[j] for j < i) - lag_us   (undefined for the
    first arrival). Event i is late iff ts[i] < watermark(i);
    ``lateness_us`` = watermark(i) - ts[i] when late else 0.

    Returns a Dataset of (id_col, late:int64, lateness_us:int64).

    Scale shape: rows bucket by ``id // bucket_size`` (ids need not be
    contiguous — empty buckets simply don't appear). Per-bucket
    (bucket, max_ts) partials tree-fold to the driver (O(n/bucket_size)
    rows), an exclusive running max over bucket order is broadcast via
    ray.put, and ONE hash shuffle lands each bucket on a worker that
    sorts locally by id and runs np.maximum.accumulate with the
    carried-in prefix. Only (id, ts) ever moves.
    """
    import ray

    from warcio_ray.ops.blocks import tree_aggregate

    bsz = int(bucket_size)
    lag = np.int64(lag_us)
    NEG = np.int64(np.iinfo(np.int64).min)

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(dtype="int64")
        ts = batch[ts_col].astype("datetime64[us]").to_numpy() \
            .astype("int64")
        return pd.DataFrame({id_col: ids, "_ts": ts,
                             "bucket": ids // bsz})

    keyed = events_ds.map_batches(project,
                                  batch_format="pandas").materialize()

    def bucket_max(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("bucket", sort=False)["_ts"].max()
        return pd.DataFrame({"bucket": g.index.to_numpy(dtype="int64"),
                             "m": g.to_numpy(dtype="int64")})

    totals = tree_aggregate(
        keyed.map_batches(bucket_max, batch_format="pandas"),
        ["bucket"], maxs=("m",))
    if len(totals) == 0:
        import ray.data
        return ray.data.from_pandas(pd.DataFrame({
            id_col: pd.Series(dtype="int64"),
            "late": pd.Series(dtype="int64"),
            "lateness_us": pd.Series(dtype="int64")}))
    totals = totals.sort_values("bucket").reset_index(drop=True)
    m = totals["m"].to_numpy(dtype="int64")
    # exclusive prefix max over bucket order; NEG = "no earlier event"
    excl = np.concatenate([[NEG], np.maximum.accumulate(m)[:-1]])
    carry_ref = ray.put(dict(zip(
        totals["bucket"].astype("int64"), excl.astype("int64"))))

    def score_group(grp: pd.DataFrame) -> pd.DataFrame:
        grp = grp.sort_values(id_col, kind="mergesort")
        ts = grp["_ts"].to_numpy(dtype="int64")
        carry = ray.get(carry_ref)[int(grp["bucket"].iloc[0])]
        # exclusive running max within the bucket, seeded by the carry
        shifted = np.concatenate([[carry], ts[:-1]])
        pmax = np.maximum.accumulate(shifted)
        has_prev = pmax != NEG
        lateness = np.where(has_prev & (ts < pmax - lag),
                            pmax - lag - ts, 0).astype("int64")
        return pd.DataFrame({
            id_col: grp[id_col].to_numpy(dtype="int64"),
            "late": (lateness > 0).astype("int64"),
            "lateness_us": lateness})

    return keyed.groupby("bucket").map_groups(score_group,
                                              batch_format="pandas")


def decayed_counts(events_ds, key_col: str = "event_type",
                   ts_col: str = "ts", half_col: str = None,
                   tau_days: float = 30.0):
    """Exponentially time-decayed activity per key — the streaming
    freshness aggregate (recency-weighted host/type popularity for
    recrawl prioritization and trending detection): each event
    contributes exp(-age_days / tau) of weight relative to the newest
    event in the log, so a key's score decays smoothly instead of
    falling off a sliding-window cliff.

    Exactness: age_days is an exact integer (calendar-day difference
    to the corpus max date); each per-event decay term quantizes to
    int64 at 2^32 FIRST (one fixed float expression — double divide +
    libm exp — identical in SQL), then sums exactly, so ``fresh_q`` is
    an exact integer, partitioning/order-invariant; the float score is
    fresh_q / 2^32 downstream.

    Scale shape: pass 1 is a max() aggregate for the reference time;
    pass 2 folds each batch to (key, age) partial sums before the
    shuffle — distinct ages are bounded by the log's day span, so the
    exchange is O(#keys x #days) rows, never O(#events). Returns a
    Dataset of (key, n_events, fresh_q).

    No reference counterpart (streaming-extension operator)."""
    scale = float(np.int64(1) << np.int64(32))
    ref_date = pd.Timestamp(events_ds.max(ts_col)).normalize()

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        days = (ref_date - batch[ts_col].dt.normalize()).dt.days \
            .to_numpy(dtype="int64")
        q = np.floor(np.exp(-(days / tau_days)) * scale + 0.5) \
            .astype(np.int64)
        out = pd.DataFrame({"key": batch[key_col].astype(str),
                            "n_events": np.int64(1), "fresh_q": q})
        agg = out.groupby("key", sort=False).sum().reset_index()
        return agg.astype({"n_events": "int64", "fresh_q": "int64"})

    from warcio_ray.ops.blocks import arrow_blocks

    return arrow_blocks(
        events_ds.map_batches(partial, batch_format="pandas")) \
        .groupby("key").sum(["n_events", "fresh_q"]) \
        .rename_columns({"sum(n_events)": "n_events",
                         "sum(fresh_q)": "fresh_q"})


def markov_stationary(events_ds, iters: int = 8, qbits: int = 30,
                      user_col: str = "user_id",
                      type_col: str = "event_type",
                      ts_col: str = "ts", id_col: str = "event_id",
                      num_partitions=None) -> pd.DataFrame:
    """First-order Markov model of the event stream + its stationary
    distribution — the behavioral-profile aggregate (what state does a
    user's session converge to?) behind churn/funnel diagnostics.

    Transitions are consecutive event-type pairs per user, ordered by
    (ts, id) — the frequent_event_trigrams sequencing contract. The
    row-stochastic matrix is quantized exactly: P_q[t1][t2] =
    (count << qbits) // rowsum(t1), dangling rows (no outgoing
    transitions) uniform at (1 << qbits) // T. The stationary vector
    is ``iters`` exact-integer power steps from the uniform start:
    v'[j] = (sum_i v[i] * P_q[i][j]) >> qbits (all nonnegative, so
    floor == trunc == shift and the SQL replay agrees bit-for-bit).

    Shape at scale: one user-keyed hash shuffle (a user's stream
    co-locates, so local shifted-array bigrams are globally exact),
    ONE bounded (T x T) transition aggregate, then the driver iterates
    the tiny T x T integer matrix. Returns (event_type, out_n,
    station_q) — T rows."""
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

    def bigrams(grp: pd.DataFrame) -> pd.DataFrame:
        grp = grp.sort_values([user_col, ts_col, id_col],
                              kind="mergesort")
        u = grp[user_col].to_numpy(dtype="int64")
        t = grp[type_col].to_numpy(dtype=object)
        # every observed type contributes a presence row (n=0 pair
        # with itself) so the state space is the full alphabet even
        # for types that never transition
        pres = pd.DataFrame({"t1": pd.unique(t), "t2": pd.unique(t),
                             "n": np.int64(0)})
        if len(u) < 2:
            return pres
        same = u[:-1] == u[1:]
        bi = pd.DataFrame({"t1": t[:-1][same], "t2": t[1:][same]})
        out = bi.groupby(["t1", "t2"], sort=False).size() \
            .reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return pd.concat([out, pres], ignore_index=True)

    parts = events_ds.map_batches(add_part, batch_format="pandas") \
        .groupby("_part").map_groups(bigrams, batch_format="pandas")
    counts = tree_aggregate(parts, ["t1", "t2"], sums=("n",))

    # ---- driver: tiny T x T exact-integer power iteration
    types = sorted(set(counts["t1"]) | set(counts["t2"]))
    T = len(types)
    if T == 0:
        return pd.DataFrame({"event_type": pd.Series(dtype="object"),
                             "out_n": pd.Series(dtype="int64"),
                             "station_q": pd.Series(dtype="int64")})
    idx = {t: i for i, t in enumerate(types)}
    C = [[0] * T for _ in range(T)]
    for t1, t2, n in counts.itertuples(index=False):
        C[idx[t1]][idx[t2]] += int(n)
    one = 1 << qbits
    rowsum = [sum(r) for r in C]
    P = [[(C[i][j] * one) // rowsum[i] if rowsum[i] else one // T
          for j in range(T)] for i in range(T)]
    v = [one // T] * T
    for _ in range(iters):
        v = [sum(v[i] * P[i][j] for i in range(T)) >> qbits
             for j in range(T)]
    return pd.DataFrame({"event_type": types,
                         "out_n": np.array(rowsum, dtype="int64"),
                         "station_q": np.array(v, dtype="int64")})


def cusum_daily(events_ds, ts_col: str = "ts") -> pd.DataFrame:
    """Two-sided CUSUM change-point detection (Page 1954) over the
    daily event-count series — the crawl-health monitor: a sustained
    rate shift (collapsed source, runaway trap) accumulates in the
    one-sided sums long before any single day looks anomalous.

    Exact-integer contract: with D days (min..max, missing days count
    0) and T total events, the scaled residual of day d is
    r_d = D*x_d - T (so the rational mean T/D never materializes);

        s_pos_d = max(0, s_pos_{d-1} + r_d)      (upward shifts)
        s_neg_d = max(0, s_neg_{d-1} - r_d)      (downward shifts)

    with alarms at h = T (one average-day mass, scaled). All integers;
    the SQL oracle replays the recurrence with a recursive CTE.

    Shape at scale: the daily histogram is a BOUNDED key space (one
    row per day), so partial counts fold through the combiner tree
    and the driver runs the O(D) recurrence on the tiny series.
    Returns (d, x, s_pos, s_neg, alarm_up, alarm_down) — D rows,
    d = days since the corpus minimum day."""
    from warcio_ray.ops.blocks import tree_aggregate

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        days = batch[ts_col].dt.normalize()
        out = days.value_counts().reset_index()
        out.columns = ["day", "x"]
        return out.astype({"x": "int64"})

    counts = tree_aggregate(
        events_ds.map_batches(partial, batch_format="pandas"),
        ["day"], sums=("x",))
    if len(counts) == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in
                             ("d", "x", "s_pos", "s_neg",
                              "alarm_up", "alarm_down")})
    counts = counts.sort_values("day").reset_index(drop=True)
    lo = counts["day"].iloc[0]
    idx = ((counts["day"] - lo).dt.days).to_numpy(dtype="int64")
    D = int(idx[-1]) + 1
    x = np.zeros(D, dtype="int64")
    x[idx] = counts["x"].to_numpy(dtype="int64")
    T = int(x.sum())
    rows, sp, sn = [], 0, 0
    for d in range(D):
        r = D * int(x[d]) - T
        sp = max(0, sp + r)
        sn = max(0, sn - r)
        rows.append((d, int(x[d]), sp, sn,
                     1 if sp >= T else 0, 1 if sn >= T else 0))
    return pd.DataFrame(rows, columns=["d", "x", "s_pos", "s_neg",
                                       "alarm_up", "alarm_down"]) \
        .astype("int64")


def km_session_survival(events_ds, gap_minutes: int = 30,
                        qbits: int = 32,
                        user_col: str = "user_id", ts_col: str = "ts",
                        id_col: str = "event_id") -> pd.DataFrame:
    """Kaplan-Meier survival curve of SESSION DURATIONS with
    right-censoring — the engagement-analytics estimator (how long do
    sessions last, honestly accounting for sessions cut off by the end
    of the observation window, which a plain duration histogram
    biases short).

    Sessions are the standard gap rule (same as sessionize_events);
    duration = whole minutes (exact integer microsecond floor); a
    session is CENSORED iff it ends within one gap of the corpus max
    timestamp (it might have continued). The estimator is the exact
    quantized product-limit: over distinct uncensored durations t_i
    ascending, with n_i = sessions still at risk (duration >= t_i)
    and d_i = uncensored sessions at exactly t_i,

        S_q(t_i) = (S_q(t_{i-1}) * (n_i - d_i)) // n_i,  S_q = 2^qbits

    — integer floor at every step, so both engines agree bit-for-bit.

    Shape at scale: one user-keyed shuffle builds sessions; durations
    fold to a BOUNDED (duration-minute, censored) histogram; the
    driver runs the O(#distinct durations) recurrence. Returns one
    row per death time (t_min, n_risk, n_events, surv_q)."""
    from warcio_ray.ops.blocks import tree_aggregate

    max_ts = pd.Timestamp(events_ds.max(ts_col))
    max_ns = max_ts.value
    gap_ns = gap_minutes * 60 * 1_000_000_000

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[[user_col, ts_col, id_col]].copy()
        batch["_part"] = (batch[user_col].astype("int64") % 32) \
            .astype("int32")
        return batch

    def sessions(grp: pd.DataFrame) -> pd.DataFrame:
        grp = grp.sort_values([user_col, ts_col, id_col],
                              kind="mergesort")
        u = grp[user_col].to_numpy(dtype="int64")
        t = grp[ts_col].to_numpy(dtype="datetime64[ns]").astype("int64")
        new_u = np.concatenate([[True], u[1:] != u[:-1]])
        gap = np.concatenate([[True],
                              (t[1:] - t[:-1]) > gap_ns])
        brk = new_u | gap
        # session bounds = first/last row index per session (rows are
        # sorted by (user, ts, id), so min/max ts are positional)
        first_idx = np.flatnonzero(brk)
        last_idx = np.concatenate([first_idx[1:] - 1, [len(t) - 1]]) \
            if len(t) else np.array([], dtype="int64")
        if not len(t):
            return pd.DataFrame({"dur": pd.Series(dtype="int64"),
                                 "cens": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        dur = (t[last_idx] - t[first_idx]) // 60_000_000_000
        cens = ((max_ns - t[last_idx]) < gap_ns).astype("int64")
        out = pd.DataFrame({"dur": dur, "cens": cens})
        out["n"] = np.int64(1)
        return out.groupby(["dur", "cens"], as_index=False).sum() \
            .astype({"dur": "int64", "cens": "int64", "n": "int64"})

    hist = tree_aggregate(
        events_ds.map_batches(add_part, batch_format="pandas")
        .groupby("_part").map_groups(sessions, batch_format="pandas"),
        ["dur", "cens"], sums=("n",))
    if len(hist) == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in
                             ("t_min", "n_risk", "n_events", "surv_q")})

    hist = hist.sort_values(["dur", "cens"]).reset_index(drop=True)
    total = int(hist["n"].sum())
    # left(t) = sessions with duration < t (either status)
    rows = []
    s_q = 1 << qbits
    left = 0
    for dur, grp in hist.groupby("dur", sort=True):
        n_risk = total - left
        d = int(grp.loc[grp["cens"] == 0, "n"].sum())
        if d > 0:
            s_q = (s_q * (n_risk - d)) // n_risk
            rows.append((int(dur), n_risk, d, s_q))
        left += int(grp["n"].sum())
    return pd.DataFrame(rows, columns=["t_min", "n_risk", "n_events",
                                       "surv_q"]).astype("int64")
