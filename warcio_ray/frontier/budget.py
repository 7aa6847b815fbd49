"""Per-host crawl-budget apportionment — largest-remainder (Hamilton)
quotas: split a round's total fetch budget B across hosts proportional
to integer weights (pending-URL counts, host quality scores) so that
every quota is an integer, the quotas sum EXACTLY to B, and the split
is bit-identical on any engine.  This is the frontier scheduler's
"how many fetch slots does each host get next round" primitive,
complementing the token-bucket politeness layer (politeness.py caps
the rate, this allocates the volume).

Math (all integer, so order/partitioning-invariant and SQL-mirrorable):
  base_h = (B * w_h) // W          (W = sum of weights)
  rem_h  = (B * w_h) %  W
  the L = B - sum(base_h) hosts with the largest (rem_h, host asc)
  get one extra slot.

Scale shape: the input is already the reduced per-host table (one row
per host — at web scale ~10^8 rows, never the corpus).  W and
sum(base) fold as exact integer Dataset sums; the "top-L remainders"
rank uses the shuffle_order prefix-sum idiom (ops/textstats.py):
hosts bucket by remainder's top bits, bucket counts tree-aggregate to
an O(2^bits) driver cumsum, and ONE hash shuffle ranks each bucket
locally — no global sort, driver memory O(2^bits).

No reference counterpart (warcio has no scheduler); frontier family
SURVEY §2.6.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["apportion_budget", "recrawl_schedule"]


def apportion_budget(ds, budget: int, key_col: str = "host",
                     weight_col: str = "w", bucket_bits: int = 10):
    """Dataset of (key, weight>0) -> Dataset of (key, weight, quota)
    with sum(quota) == budget exactly."""
    import ray

    from warcio_ray.ops.blocks import tree_aggregate

    # the per-host table is the already-reduced side (O(#hosts)):
    # materialize once so min/sum/project don't re-run its lineage
    ds = ds.materialize()
    min_w = ds.min(weight_col)
    if min_w is not None and int(min_w) <= 0:
        raise ValueError("apportion_budget needs positive weights")
    total_w = int(ds.sum(weight_col) or 0)
    if total_w <= 0:
        import ray.data
        return ray.data.from_pandas(pd.DataFrame({
            key_col: pd.Series(dtype="object"),
            weight_col: pd.Series(dtype="int64"),
            "quota": pd.Series(dtype="int64")}))
    if budget > 0 and total_w > (2 ** 63 - 1) // budget:
        raise OverflowError(
            f"budget * total weight exceeds int64 (budget={budget}, "
            f"W={total_w}): rescale weights")
    n_buckets = 1 << bucket_bits
    # divide form (rem // ceil(W/n_buckets)) instead of
    # (rem * n_buckets) // W: the multiply overflows int64 whenever
    # W > 2^63/n_buckets (the budget*W guard above does not cover
    # budget < n_buckets). Any monotone-in-rem bucketing yields the
    # same global (bucket DESC, rem DESC, key) order, so quotas are
    # unchanged.
    bucket_div = (total_w + n_buckets - 1) // n_buckets

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch[weight_col].to_numpy(dtype="int64")
        prod = budget * w  # guarded above: max prod = budget * W
        rem = prod % total_w
        return pd.DataFrame({
            key_col: batch[key_col],
            weight_col: w,
            "base": prod // total_w,
            "rem": rem,
            # remainder's top bits: rem in [0, W)
            "bucket": rem // bucket_div})

    keyed = ds.map_batches(project, batch_format="pandas").materialize()
    leftover = budget - int(keyed.sum("base") or 0)

    def bucket_counts(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch["bucket"].value_counts()
        return pd.DataFrame({"bucket": vc.index.to_numpy(dtype="int64"),
                             "c": vc.to_numpy(dtype="int64")})

    totals = tree_aggregate(
        keyed.map_batches(bucket_counts, batch_format="pandas"),
        ["bucket"], sums=("c",)).sort_values("bucket", ascending=False) \
        .reset_index(drop=True)
    c = totals["c"].to_numpy(dtype="int64")
    # DESC rank bases: highest-remainder bucket ranks first
    base_rank = np.concatenate([[0], np.cumsum(c)[:-1]]) if len(c) else c
    rank_ref = ray.put(dict(zip(totals["bucket"].astype("int64"),
                                base_rank)))

    def grant_group(grp: pd.DataFrame) -> pd.DataFrame:
        grp = grp.sort_values(["rem", key_col],
                              ascending=[False, True], kind="mergesort")
        b = ray.get(rank_ref)[int(grp["bucket"].iloc[0])]
        rank = b + np.arange(len(grp), dtype="int64")
        return pd.DataFrame({
            key_col: grp[key_col],
            weight_col: grp[weight_col].to_numpy(dtype="int64"),
            "quota": grp["base"].to_numpy(dtype="int64")
            + (rank < leftover).astype("int64")})

    return keyed.groupby("bucket").map_groups(grant_group,
                                              batch_format="pandas")


def recrawl_schedule(ds, status_col: str = "status",
                     id_col: str = "doc_id",
                     base_days: int = 7, min_days: int = 1,
                     max_days: int = 64):
    """Freshness scheduler — the adaptive-revisit policy (Cho &
    Garcia-Molina 2003 shape) driven by a snapshot delta
    (ops/dedup.snapshot_delta): per URL, the next revisit interval
    halves when the last recrawl saw a change and doubles when it
    didn't, clamped to [min_days, max_days]; 'added' URLs start at
    ``base_days``, 'removed' URLs leave the schedule (emitted with
    interval 0 so downstream can tombstone them).

    All-integer (halving/doubling/clamping of day counts), so the
    schedule is deterministic at any parallelism and SQL-mirrorable.
    Stateless zero-shuffle scan over the delta — at 100 TB the input
    is the O(churn) delta table, never the corpus. Input rows carry
    (id, status, prev_days); rows for unchanged URLs (absent from a
    delta) are the caller's to supply when doubling matters — the
    composed query feeds delta rows where prev_days rides along.
    Returns (id, next_days)."""
    import pandas as pd
    import numpy as np

    def sched(batch: pd.DataFrame) -> pd.DataFrame:
        prev = batch["prev_days"].to_numpy(dtype="int64") \
            if "prev_days" in batch.columns \
            else np.full(len(batch), base_days, dtype=np.int64)
        status = batch[status_col]
        nxt = np.where(status == "changed",
                       np.maximum(min_days, prev // 2),
                       np.minimum(max_days, prev * 2)).astype("int64")
        nxt = np.where(status == "added", base_days, nxt)
        nxt = np.where(status == "removed", 0, nxt).astype("int64")
        return pd.DataFrame({id_col: batch[id_col].astype("int64"),
                             "next_days": nxt})

    return ds.map_batches(sched, batch_format="pandas")


def change_rate_estimates(visits_ds, id_col: str = "doc_id",
                          x_col: str = "x", n_visits: int = 8,
                          qbits: int = 32):
    """Poisson change-rate MLE per URL from repeated-visit change
    observations — the estimator UNDER the recrawl scheduler (Cho &
    Garcia-Molina 2003, "Estimating Frequency of Change", the
    bias-corrected form): with X changes observed in N equal-interval
    visits,

        lambda_hat = -ln((N - X + 0.5) / (N + 0.5))

    finite even at X = N (the naive -ln(1 - X/N) estimator blows up
    there). Quantized at 2^qbits under the libm-ln precedent so the
    SQL replay is bit-stable. The schedule op (recrawl_schedule)
    doubles/halves from ONE delta; this rung turns K deltas into a
    rate a scheduler can sort by.

    Input: (id, X) rows (one per URL). Stateless map_batches scan —
    no shuffle, no state. Returns (id, x, rate_q)."""

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        x = batch[x_col].to_numpy(dtype="int64")
        if len(x) and (x.min() < 0 or x.max() > n_visits):
            bad = x[(x < 0) | (x > n_visits)][0]
            raise ValueError(
                f"change count x={bad} outside [0, n_visits={n_visits}]: "
                "the MLE's log argument would go nonpositive")
        lam = np.log((n_visits + 0.5) / (n_visits - x + 0.5))
        rate_q = np.floor(lam * float(1 << qbits) + 0.5).astype("int64")
        return pd.DataFrame({id_col: batch[id_col].astype("int64"),
                             "x": x, "rate_q": rate_q})

    return visits_ds.map_batches(score, batch_format="pandas")
