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


# ---------------------------------------------------------------------------
# exact float quantiles (radix refinement)
# ---------------------------------------------------------------------------

def _float_sort_keys(x: "np.ndarray") -> "np.ndarray":
    """float64 -> uint64 keys whose unsigned order == IEEE754 total
    order (negatives: all bits flipped; non-negatives: sign bit set).
    NaNs must be excluded by the caller; +/-inf sort correctly; note
    -0.0 and +0.0 get DISTINCT keys (callers on signed-zero data pick
    either — both compare equal downstream)."""
    k = np.ascontiguousarray(x, dtype=np.float64).view(np.uint64).copy()
    neg = (k >> np.uint64(63)).astype(bool)
    k[neg] = ~k[neg]
    k[~neg] |= np.uint64(1) << np.uint64(63)
    return k


def _sort_key_to_float(k: int) -> float:
    k = np.uint64(k)
    top = np.uint64(1) << np.uint64(63)
    bits = (k ^ top) if bool(k & top) else ~k
    return float(np.uint64(bits).view(np.float64))


def exact_float_quantiles(ds, value_col: str,
                          pcts=(10, 25, 50, 75, 90, 99)) -> pd.DataFrame:
    """EXACT percentiles of a float64 column in FOUR bounded scans, no
    sort, no sketch error — the continuous-column companion of
    ``histogram_quantiles`` (which needs a bounded distinct-value
    space). Rank rule is identical: the value at 1-indexed rank
    (p*n+99)//100 in ascending IEEE754 order.

    Scale shape (radix refinement over order-preserving bit keys):
    floats map to uint64 keys whose unsigned order equals float order,
    and each scan counts keys per 16-bit radix cell UNDER THE PREFIXES
    that still matter — level 1 is a <= 2^16-cell histogram of the top
    16 bits; levels 2-4 filter to the <= len(pcts) parent prefixes
    (vectorized ``np.isin`` against a tiny array) so their partials are
    near-empty. Every level is a ``tree_aggregate`` combiner (bounded
    cells: <= 2^16 per surviving prefix), so nothing but (prefix,count)
    rows ever leave a task and the driver fold is O(cells). Four column
    scans buys exactness: a one-scan KLL/t-digest trades that for
    error; with column pruning at the read the scans are cheap, and at
    100 TB the level-2..4 scans stream the column through a two-kernel
    mask with no shuffle at all.

    NaN and null values are excluded (SQL aggregate semantics);
    infinities participate in order. Ties across equal values are
    value-identical by definition, so results are
    partitioning-invariant and SQL-reproducible (row_number oracle).
    """
    from warcio_ray.ops.blocks import tree_aggregate

    pcts = sorted(int(p) for p in pcts)
    if not pcts or pcts[0] < 1 or pcts[-1] > 100:
        raise ValueError("pcts must be integers in 1..100")

    def level_scan(level: int, parents: "np.ndarray | None"):
        shift = np.uint64(64 - 16 * level)
        parent_shift = np.uint64(64 - 16 * (level - 1))

        def partials(batch: pd.DataFrame) -> pd.DataFrame:
            vals = batch[value_col].to_numpy(dtype=np.float64)
            vals = vals[~np.isnan(vals)]
            if not len(vals):
                return pd.DataFrame({"pre": np.array([], dtype=np.uint64),
                                     "c": np.array([], dtype=np.int64)})
            k = _float_sort_keys(vals)
            if parents is not None:
                k = k[np.isin(k >> parent_shift, parents)]
            pre, cnt = np.unique(k >> shift, return_counts=True)
            return pd.DataFrame({"pre": pre, "c": cnt.astype(np.int64)})

        hist = tree_aggregate(
            ds.map_batches(partials, batch_format="pandas"),
            ["pre"], sums=("c",))
        if len(hist) == 0:  # all-empty partials lose their columns
            return pd.DataFrame({"pre": np.array([], dtype=np.uint64),
                                 "c": np.array([], dtype=np.int64)})
        return hist.sort_values("pre", kind="mergesort").reset_index(
            drop=True)

    # level 1: full histogram of the top 16 bits (also yields n)
    hist = level_scan(1, None)
    if len(hist) == 0:
        return pd.DataFrame({"pct": pd.Series([], dtype="int64"),
                             "value": pd.Series([], dtype="float64")})
    n = int(hist["c"].sum())
    # per-target state: residual rank within the current prefix
    targets = [{"pct": p, "rank": (p * n + 99) // 100, "pre": None}
               for p in pcts]

    for level in range(1, 5):
        if level > 1:
            parents = np.unique(np.array([t["pre"] for t in targets],
                                         dtype=np.uint64))
            hist = level_scan(level, parents)
        pres = hist["pre"].to_numpy(dtype=np.uint64)
        cnts = hist["c"].to_numpy(dtype=np.int64)
        for t in targets:
            if level == 1:
                sel = np.ones(len(pres), dtype=bool)
            else:
                sel = (pres >> np.uint64(16)) == t["pre"]
            cum = cnts[sel].cumsum()
            i = int(np.searchsorted(cum, t["rank"]))
            t["pre"] = pres[sel][i]
            t["rank"] -= int(cum[i - 1]) if i else 0

    return pd.DataFrame(
        {"pct": np.array([t["pct"] for t in targets], dtype="int64"),
         "value": np.array([_sort_key_to_float(t["pre"])
                            for t in targets], dtype="float64")})


def _desc_weight_keys(w: "np.ndarray") -> "np.ndarray":
    """int64 weights -> uint64 keys whose UNSIGNED ASC order equals
    weight DESC order (sign-flip bias then bitwise not)."""
    u = w.astype(np.int64).view(np.uint64) ^ np.uint64(1 << 63)
    return ~u


def weighted_budget_select(ds, budget: int, weight_col: str = "iw",
                           count_col: str = "n_tok",
                           id_col: str = "doc_id",
                           max_ties: int = 5_000_000):
    """EXACT selection under a token budget — the post-scoring
    curation step (DSIR / quality-ranked data selection): documents
    are ranked by (weight DESC, id ASC) and a doc is kept iff the
    total ``count_col`` mass of all docs strictly before it is
    < ``budget`` (so the doc that crosses the budget is the last one
    kept). Returns the kept rows as a Dataset (same columns).

    Scale shape — the weighted sibling of ``exact_float_quantiles``:
    the cutoff weight w* is found with FOUR bounded radix scans over
    the 64-bit desc-order key (token-MASS histograms per 16-bit cell,
    each a ``tree_aggregate`` with <= 2^16 cells per surviving
    prefix); ties AT w* resolve by id with one bounded driver pass
    (guarded at ``max_ties``), and the final pass is a stateless
    vectorized filter. No global sort, no shuffle of doc rows; all
    integer arithmetic, so the kept set is partitioning-invariant and
    SQL-reproducible (window-cumsum oracle)."""
    import ray

    from warcio_ray.ops.blocks import guarded_to_pandas, tree_aggregate

    if budget < 0:
        raise ValueError("budget must be >= 0")
    if budget == 0:
        return ds.limit(0)  # schema-preserving empty (any doc with
        # cum_before 0 would otherwise be kept, so only 0 is empty)

    # 4 radix scans + the tie pass + the final filter = 6 consumptions
    # of `ds`; an unmaterialized upstream (a scoring join) would
    # re-execute per pass (learning #25: >2 passes -> materialize at
    # composition entry). Narrow rows (id, weight, count) only.
    ds = ds.materialize()

    def level_scan(level: int, parents):
        shift = np.uint64(64 - 16 * level)
        parent_shift = np.uint64(64 - 16 * (level - 1))

        def partials(batch: pd.DataFrame) -> pd.DataFrame:
            k = _desc_weight_keys(
                batch[weight_col].to_numpy(dtype=np.int64))
            m = batch[count_col].to_numpy(dtype=np.int64)
            if parents is not None:
                keep = np.isin(k >> parent_shift, parents)
                k, m = k[keep], m[keep]
            if not len(k):
                return pd.DataFrame(
                    {"pre": np.array([], dtype=np.uint64),
                     "c": np.array([], dtype=np.int64)})
            pre = k >> shift
            order = np.argsort(pre, kind="mergesort")
            pre_s, m_s = pre[order], m[order]
            starts = np.concatenate(
                [[0], np.flatnonzero(pre_s[1:] != pre_s[:-1]) + 1])
            sums = np.add.reduceat(m_s, starts)
            return pd.DataFrame({"pre": pre_s[starts],
                                 "c": sums.astype(np.int64)})

        hist = tree_aggregate(
            ds.map_batches(partials, batch_format="pandas"),
            ["pre"], sums=("c",))
        if len(hist) == 0:
            return hist
        return hist.sort_values("pre", kind="mergesort") \
            .reset_index(drop=True)

    # refine to the exact cutoff key k* (the doc weight at the budget
    # boundary); r tracks the budget remaining inside the prefix
    r = int(budget)
    prefix = None
    for level in range(1, 5):
        parents = None if level == 1 else np.array([prefix],
                                                   dtype=np.uint64)
        hist = level_scan(level, parents)
        if len(hist) == 0:
            import ray.data
            return ds if level == 1 else ray.data.from_pandas(
                pd.DataFrame())  # unreachable refinement
        cum = hist["c"].to_numpy(dtype=np.int64).cumsum()
        i = int(np.searchsorted(cum, r, side="right"))
        if i >= len(cum):  # total mass <= budget: keep everything
            return ds
        prefix = np.uint64(hist["pre"].to_numpy(dtype=np.uint64)[i])
        r -= int(cum[i - 1]) if i else 0
    k_star = prefix  # full 64-bit key; 0 <= r < mass(k_star)

    # tie pass: docs AT w* ordered by id consume the remaining budget
    def tie_rows(batch: pd.DataFrame) -> pd.DataFrame:
        k = _desc_weight_keys(batch[weight_col].to_numpy(dtype=np.int64))
        sel = k == k_star
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(dtype="int64")[sel],
            "n": batch[count_col].to_numpy(dtype="int64")[sel]})

    ties = guarded_to_pandas(
        ds.map_batches(tie_rows, batch_format="pandas"),
        "weighted_budget_select tie set",
        "a larger max_ties (or pre-aggregate equal weights)", max_ties)
    ties = ties.sort_values(id_col, kind="mergesort")
    cum_before = ties["n"].to_numpy(dtype=np.int64).cumsum() \
        - ties["n"].to_numpy(dtype=np.int64)
    keep_ids = ties[id_col].to_numpy(dtype="int64")[cum_before < r]
    ids_ref = ray.put(keep_ids)

    def final_filter(batch: pd.DataFrame) -> pd.DataFrame:
        k = _desc_weight_keys(batch[weight_col].to_numpy(dtype=np.int64))
        keep = k < k_star
        tie_ids = ray.get(ids_ref)
        if len(tie_ids):
            keep |= np.isin(batch[id_col].to_numpy(dtype="int64"),
                            tie_ids)
        return batch[keep]

    return ds.map_batches(final_filter, batch_format="pandas")


def rank_select_lowest(ds, value_col: str, pct: int,
                       id_col: str = "doc_id"):
    """Keep exactly the ``(pct*n+99)//100`` lowest rows by
    (value, id) — exact percentile SELECTION without a global sort,
    the cutoff step of a perplexity/quality filter ladder (keep the
    best-scoring pct% of the corpus). Same rank rule as
    ``exact_float_quantiles``; SQL-reproducible as one row_number
    window.

    Scale shape: the radix quantile finds the cutoff VALUE (4 bounded
    combiner scans, no shuffle), a stateless filter keeps everything
    strictly below it, and the tie stratum (== cutoff) resolves by
    smallest id through one bounded sort+limit — tie strata are a
    single float value's rows, tiny unless the column is degenerate
    (a constant column degrades to sorting n ids; documented, not
    hidden). Rows with NaN in ``value_col`` are excluded (SQL
    aggregate semantics, matching the quantile)."""
    import numpy as np
    import pandas as pd

    if not 1 <= int(pct) <= 100:
        raise ValueError("pct must be in 1..100")

    def drop_nan(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[~batch[value_col].isna()]

    clean = ds.map_batches(drop_nan, batch_format="pandas") \
        .materialize()
    n = clean.count()
    if n == 0:
        return clean
    k = (int(pct) * n + 99) // 100
    cut = float(exact_float_quantiles(
        clean, value_col, [int(pct)])["value"].iloc[0])

    below = clean.map_batches(
        lambda b: b[b[value_col].to_numpy(np.float64) < cut],
        batch_format="pandas")
    n_below = below.count()
    need = k - n_below

    ties = clean.map_batches(
        lambda b: b[b[value_col].to_numpy(np.float64) == cut],
        batch_format="pandas")
    tie_sel = ties.sort(id_col).limit(int(need))
    return below.union(tie_sel)


def grouped_quantiles(ds, group_col: str, value_col: str,
                      pcts=(25, 50, 75)) -> pd.DataFrame:
    """Per-GROUP exact integer percentiles — the grouped sibling of
    ``histogram_quantiles`` (same 1-indexed rank rule
    (p*n_g+99)//100 within each group). Returns (group, pct, value)
    rows; groups whose rows are all null are absent.

    Shape: ONE scan folds (group, value) counts through the combiner
    tree — key space bounded by groups x distinct values, the same
    boundedness histogram_quantiles relies on — then per-group
    cumsums on the driver over that bounded table.
    """
    from warcio_ray.ops.blocks import tree_aggregate

    pcts = sorted(int(p) for p in pcts)
    if not pcts or pcts[0] < 1 or pcts[-1] > 100:
        raise ValueError("pcts must be integers in 1..100")

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame({"g": batch[group_col],
                           "v": batch[value_col]}).dropna()
        if not len(df):
            return pd.DataFrame({"g": pd.Series(dtype="object"),
                                 "v": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="int64")})
        g = df.groupby(["g", "v"], sort=False).size() \
            .reset_index(name="c")
        return g.astype({"v": "int64", "c": "int64"})

    hist = tree_aggregate(
        ds.map_batches(partials, batch_format="pandas"),
        ["g", "v"], sums=("c",))
    if len(hist) == 0:
        return pd.DataFrame({group_col: pd.Series(dtype="object"),
                             "pct": pd.Series(dtype="int64"),
                             "value": pd.Series(dtype="int64")})
    out = []
    for grp, sub in hist.groupby("g", sort=True):
        sub = sub.sort_values("v", kind="mergesort")
        cum = sub["c"].to_numpy(dtype="int64").cumsum()
        vals = sub["v"].to_numpy(dtype="int64")
        n = int(cum[-1])
        for p in pcts:
            rank = (p * n + 99) // 100
            out.append((grp, p,
                        int(vals[int(np.searchsorted(cum, rank))])))
    return pd.DataFrame(out, columns=[group_col, "pct", "value"]) \
        .astype({"pct": "int64", "value": "int64"})


def trimmed_mean(ds, value_col: str = "value", p: int = 5) -> pd.DataFrame:
    """Exact p%-trimmed and winsorized means of a float column — the
    robust aggregates a metrics pipeline needs when a crawler bug or a
    bot burst poisons the tail (a plain mean moves with one outlier;
    the 5%-trimmed mean doesn't).

    Rank-exact contract: with n non-null values and the
    exact_float_quantiles rank rule r_q = (q*n + 99) // 100, the kept
    range is ranks r_p .. r_{100-p} inclusive; dropped mass is
    reconstructed from (count, sum) below/above the two cut VALUES
    plus exact tie corrections, so no global sort happens — ties at
    the cuts contribute cut-value multiples, which is rank-identical
    to any row_number tie-break. Winsorized = dropped observations
    clamped to the cuts.

    Shape at scale: the two cut values come from the 4-scan radix
    quantile machinery; ONE more bounded combiner scan collects
    (below/above counts and sums, total); the driver finishes on six
    numbers. Returns ONE row (n, r_lo, r_hi, trimmed_mean,
    winsor_mean)."""
    qs = exact_float_quantiles(ds, value_col, pcts=(p, 100 - p))
    qs = qs.set_index("pct")["value"]
    lo, hi = float(qs[p]), float(qs[100 - p])

    # Float sums fold with math.fsum at BOTH levels (exact per batch,
    # then exact over the per-batch partials on the driver) instead of
    # tree_aggregate's pairwise float adds: fsum is correctly rounded,
    # so the result is independent of batch count and fold order up to
    # one final rounding — the kept-range reconstruction below is a
    # difference of large sums and would otherwise inherit the full
    # non-associativity of the tree fold. One partial row per batch,
    # so the driver collect is O(#blocks), not O(rows).
    import math

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vals = batch[value_col].to_numpy(dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        below = vals < lo
        above = vals > hi
        return pd.DataFrame([{
            "n": np.int64(len(vals)),
            "total": math.fsum(vals),
            "nb": np.int64(below.sum()),
            "sb": math.fsum(vals[below]),
            "na": np.int64(above.sum()),
            "sa": math.fsum(vals[above])}])

    s = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if len(s) == 0 or int(s["n"].sum()) == 0:
        return pd.DataFrame([{"n": 0, "r_lo": 0, "r_hi": 0,
                              "trimmed_mean": 0.0, "winsor_mean": 0.0}]) \
            .astype({"n": "int64", "r_lo": "int64", "r_hi": "int64"})
    n = int(s["n"].sum())
    total = math.fsum(s["total"])
    nb, sb = int(s["nb"].sum()), math.fsum(s["sb"])
    na, sa = int(s["na"].sum()), math.fsum(s["sa"])
    r_lo = (p * n + 99) // 100
    r_hi = ((100 - p) * n + 99) // 100
    lo_ties_drop = (r_lo - 1) - nb
    hi_ties_drop = (n - r_hi) - na
    kept_sum = total - sb - sa - lo_ties_drop * lo - hi_ties_drop * hi
    kept_n = r_hi - r_lo + 1
    win_sum = kept_sum + (r_lo - 1) * lo + (n - r_hi) * hi
    return pd.DataFrame([{
        "n": n, "r_lo": r_lo, "r_hi": r_hi,
        "trimmed_mean": round(kept_sum / kept_n, 6),
        "winsor_mean": round(win_sum / n, 6)}]) \
        .astype({"n": "int64", "r_lo": "int64", "r_hi": "int64"})


def median_abs_deviation(ds, value_col: str = "value") -> pd.DataFrame:
    """Exact median absolute deviation — the robust scale estimate
    next to the trimmed mean (stddev moves with one outlier; MAD
    doesn't): MAD = median(|v - median(v)|), both medians under the
    exact_float_quantiles rank rule (rank (50n+99)//100 ascending).

    Shape at scale: the radix quantile machinery twice — 4 bounded
    scans for the median, then 4 more over the derived |v - med|
    column (a stateless map, no shuffle, no materialization of the
    derived column). Returns ONE row (n, median, mad)."""
    from warcio_ray.ops.blocks import tree_aggregate

    med_df = exact_float_quantiles(ds, value_col, pcts=(50,))
    med = float(med_df["value"].iloc[0])

    def absdev(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[value_col].to_numpy(dtype=np.float64)
        return pd.DataFrame({"_ad": np.abs(v - med)})

    dev_ds = ds.map_batches(absdev, batch_format="pandas")
    mad_df = exact_float_quantiles(dev_ds, "_ad", pcts=(50,))
    mad = float(mad_df["value"].iloc[0])

    def count(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[value_col].to_numpy(dtype=np.float64)
        return pd.DataFrame([{"_k": np.int64(0),
                              "n": np.int64((~np.isnan(v)).sum())}])

    s = tree_aggregate(ds.map_batches(count, batch_format="pandas"),
                       ["_k"], sums=("n",))
    n = int(s["n"].iloc[0]) if len(s) else 0
    return pd.DataFrame([{"n": n, "median": round(med, 6),
                          "mad": round(mad, 6)}]) \
        .astype({"n": "int64"})


def jenks_breaks(ds, value_col: str, k: int = 3,
                 id_col=None) -> pd.DataFrame:
    """Jenks natural breaks — the EXACT optimal 1-D k-classing
    (Fisher 1958 dynamic program), the principled alternative to
    eyeballed thresholds when bucketing a quality signal: class
    boundaries minimize total within-class squared deviation.

    Exact-integer contract: over the ordered distinct-value histogram
    (positions 1..V with counts), a segment's cost is

        cost(i, j) = sumsq(i, j) - (sum(i, j)^2) // n(i, j)

    (integer floor — a monotone-equivalent surrogate of n*SSE whose
    floor both engines reproduce); DP ties break to the SMALLEST
    split index. The class count k is unrolled, so the SQL oracle
    replays the DP as k bounded V^2 join layers.

    Shape at scale: ONE bounded (value, count) histogram aggregate
    (the histogram_quantiles shape — distinct VALUES, never rows);
    the driver runs the O(V^2 k) DP on the tiny table. Returns k rows
    (class, lo, hi, n)."""
    from warcio_ray.ops.blocks import tree_aggregate

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[value_col].to_numpy(dtype="int64")
        uv, cnt = np.unique(v, return_counts=True)
        return pd.DataFrame({"v": uv, "n": cnt.astype("int64")})

    hist = tree_aggregate(ds.map_batches(partial, batch_format="pandas"),
                          ["v"], sums=("n",))
    if len(hist) == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in
                             ("class", "lo", "hi", "n")})
    hist = hist.sort_values("v").reset_index(drop=True)
    v = hist["v"].to_numpy(dtype="int64")
    n = hist["n"].to_numpy(dtype="int64")
    V = len(v)
    kk = min(k, V)
    cn = np.concatenate([[0], np.cumsum(n)])
    cs = np.concatenate([[0], np.cumsum(v * n)])
    css = np.concatenate([[0], np.cumsum(v * v * n)])

    def cost(i, j):  # 1-based inclusive positions
        nn = int(cn[j] - cn[i - 1])
        s = int(cs[j] - cs[i - 1])
        ss = int(css[j] - css[i - 1])
        return ss - (s * s) // nn

    INF = float("inf")
    # best[m][j]: min cost of classing positions 1..j into m classes;
    # split[m][j]: the chosen start of the last class (smallest on tie)
    best = [[INF] * (V + 1) for _ in range(kk + 1)]
    split = [[0] * (V + 1) for _ in range(kk + 1)]
    best[0][0] = 0
    for m in range(1, kk + 1):
        for j in range(m, V + 1):
            b, arg = INF, 0
            for i in range(m, j + 1):
                prev = best[m - 1][i - 1]
                if prev is INF or prev == INF:
                    continue
                c = prev + cost(i, j)
                if c < b:
                    b, arg = c, i
            best[m][j] = b
            split[m][j] = arg
    bounds = []
    j = V
    for m in range(kk, 0, -1):
        i = split[m][j]
        bounds.append((i, j))
        j = i - 1
    bounds.reverse()
    rows = [(m + 1, int(v[i - 1]), int(v[j - 1]),
             int(cn[j] - cn[i - 1]))
            for m, (i, j) in enumerate(bounds)]
    return pd.DataFrame(rows, columns=["class", "lo", "hi", "n"]) \
        .astype("int64")
