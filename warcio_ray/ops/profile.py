"""Column profiling / data-quality verification — the stats-collection
stage a production pipeline runs before trusting a new partition of
crawl output (cf. "Differential Data Quality Verification on
Partitioned Data", ICDE 2019 — per-partition stats that merge, so
verification cost is proportional to the NEW partitions; see
PAPERS.md).

Per column: row count, null count, exact distinct count, min, max —
the invariants schema-drift and ingestion-bug checks assert on
(null-rate spikes, id-range regressions, vanished categories).

Shape at scale:
  - n / n_null / min / max fold in ONE combiner pass over all profiled
    columns together (per-batch partial -> tiny per-batch rows -> one
    bounded fold): associative, so per-partition partials merge — the
    differential-verification property.
  - exact distinct is one narrow groupby per column (only the column's
    non-null values shuffle). That is the EXACT path; for billions of
    distinct values run the HLL sketch (ops/sketch.py) instead and
    accept the epsilon.

Output is engine-comparable: min/max are computed on the NATIVE type
and then rendered to strings, so one schema covers int and string
columns without float-format hazards (profile numeric-float columns
via the quantile ops instead).
"""
from __future__ import annotations

import numpy as np
import pandas as pd


def profile_table(ds, columns):
    """Dataset + column names -> pandas DataFrame
    (column, n, n_null, n_distinct, min_v, max_v), one row per
    profiled column, sorted by column name. Null-only columns render
    min_v/max_v as empty strings."""
    from warcio_ray.ops.blocks import arrow_blocks

    columns = list(columns)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in columns:
            col = batch[c]
            nn = int(col.isna().sum())
            present = col.dropna()
            rows.append({
                "column": c,
                "n": np.int64(len(col)),
                "n_null": np.int64(nn),
                # min/max rendered per-batch; string render of the
                # native min/max is order-preserving per type because
                # the final fold re-compares NATIVE values, not strings
                "has_vals": np.int64(1 if len(present) else 0),
                "min_v": present.min() if len(present) else None,
                "max_v": present.max() if len(present) else None,
            })
        return pd.DataFrame(rows)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()

    out_rows = []
    for c in columns:
        sub = parts[parts["column"] == c]
        vals = sub[sub["has_vals"] == 1]
        # drop nulls BEFORE the groupby: a null is not a distinct
        # value, and Ray 2.49's sort-based groupby cannot order None
        # against strings
        nd = arrow_blocks(ds.select_columns([c])) \
            .map_batches(lambda t: t.drop_null(),
                         batch_format="pyarrow", batch_size=None) \
            .groupby(c).count().count()
        mn = vals["min_v"].min() if len(vals) else None
        mx = vals["max_v"].max() if len(vals) else None
        out_rows.append({
            "column": c,
            "n": int(sub["n"].sum()),
            "n_null": int(sub["n_null"].sum()),
            "n_distinct": int(nd),
            "min_v": "" if mn is None else str(mn),
            "max_v": "" if mx is None else str(mx)})
    out = pd.DataFrame(out_rows).sort_values("column") \
        .reset_index(drop=True)
    return out.astype({"n": "int64", "n_null": "int64",
                       "n_distinct": "int64"})


def gini_counts(ds, key_col: str) -> pd.DataFrame:
    """Exact Gini coefficient of the per-key row-count distribution —
    the crawl-fairness scalar (a polite crawler should not spend 80%
    of its fetch budget on 3 hosts; G near 1 says it did).

    Exact-rational contract: with per-key counts x sorted ascending
    (ties order-irrelevant: equal x contribute the same weighted sum),

        G = (2 * sum(i * x_i) - (n+1) * sum(x)) / (n * sum(x))

    — all integer until the one rounded division.

    Shape at scale: per-key counts are one bounded aggregate (keys =
    hosts); the driver sorts the tiny count vector. Returns ONE row
    (n_keys, total, g_num, g_den, gini)."""
    from ray.data.aggregate import Count

    from warcio_ray.ops.blocks import arrow_blocks

    counts = arrow_blocks(ds.select_columns([key_col])) \
        .groupby(key_col).aggregate(Count(alias_name="c")).to_pandas()
    if len(counts) == 0:
        return pd.DataFrame([{"n_keys": 0, "total": 0, "g_num": 0,
                              "g_den": 0, "gini": 0.0}]) \
            .astype({"n_keys": "int64", "total": "int64",
                     "g_num": "int64", "g_den": "int64"})
    x = np.sort(counts["c"].to_numpy(dtype="int64"))
    n = len(x)
    tot = int(x.sum())
    wsum = int((np.arange(1, n + 1, dtype="int64") * x).sum())
    g_num = 2 * wsum - (n + 1) * tot
    g_den = n * tot
    return pd.DataFrame([{
        "n_keys": n, "total": tot, "g_num": g_num, "g_den": g_den,
        "gini": round(g_num / g_den, 6) if g_den else 0.0}]) \
        .astype({"n_keys": "int64", "total": "int64",
                 "g_num": "int64", "g_den": "int64"})


def frontcode_gain(ds, key_col: str) -> pd.DataFrame:
    """Front-coding (prefix-compression) gain over the globally
    SORTED key column — the index-layout sizing metric behind every
    CDX/SSTable-style store: sorted SURT keys share long prefixes, and
    saved = sum of common-prefix lengths with the predecessor is
    exactly the bytes a front-coded block layout eliminates.

    Distributed shape: ONE Ray range-partitioned sort (blocks are
    globally ordered and internally sorted); each block folds its
    intra-block adjacent-pair prefix sums and emits one partial row
    carrying its (first, last) keys; the driver orders the O(#blocks)
    partials and adds the block-BOUNDARY pairs — so the result is the
    exact global-scan number without any single task seeing the whole
    key set. Returns ONE row (n_keys, total_bytes, saved_bytes)."""

    def common_prefix(a: str, b: str) -> int:
        m = min(len(a), len(b))
        i = 0
        while i < m and a[i] == b[i]:
            i += 1
        return i

    def block_stats(batch: pd.DataFrame) -> pd.DataFrame:
        keys = batch[key_col].astype(str).tolist()
        if not keys:
            return pd.DataFrame({c: pd.Series(dtype=object) for c in
                                 ("first", "last")}).assign(
                n=pd.Series(dtype="int64"),
                b=pd.Series(dtype="int64"),
                s=pd.Series(dtype="int64"))
        saved = sum(common_prefix(keys[i - 1], keys[i])
                    for i in range(1, len(keys)))
        return pd.DataFrame([{
            "first": keys[0], "last": keys[-1],
            "n": np.int64(len(keys)),
            "b": np.int64(sum(len(k) for k in keys)),
            "s": np.int64(saved)}])

    parts = ds.select_columns([key_col]).sort(key_col) \
        .map_batches(block_stats, batch_format="pandas",
                     batch_size=None).to_pandas()
    if len(parts) == 0:
        return pd.DataFrame([{"n_keys": 0, "total_bytes": 0,
                              "saved_bytes": 0}]).astype("int64")
    parts = parts.sort_values("first").reset_index(drop=True)
    saved = int(parts["s"].sum())
    for i in range(1, len(parts)):
        saved += common_prefix(str(parts["last"].iloc[i - 1]),
                               str(parts["first"].iloc[i]))
    return pd.DataFrame([{
        "n_keys": int(parts["n"].sum()),
        "total_bytes": int(parts["b"].sum()),
        "saved_bytes": saved}]).astype("int64")


def k_anonymity(ds, quasi_cols, sensitive_col=None, k: int = 5,
                l_div: int = 2, num_partitions=None) -> pd.DataFrame:
    """k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala
    2007) — the governance check a training-data release runs over its
    quasi-identifier columns: a row is re-identifiable when its
    quasi-identifier combination is shared by fewer than ``k`` rows,
    and a group leaks its sensitive attribute when it carries fewer
    than ``l_div`` distinct sensitive values. Counts both, exactly.

    Shape at scale: per-batch pandas fold collapses each batch to its
    distinct (quasi..., sensitive) combos with counts; ONE hash
    aggregate merges the combos; ONE key-hash partition sweep (quasi
    key) computes per-group size + diversity and emits a single
    partial stats row per partition; the driver folds a handful of
    rows. Nothing row-sized leaves the combiner pass.

    Returns ONE row (n_rows, n_groups, min_group, k, n_viol_groups,
    n_viol_rows, l, n_lowdiv_groups, n_lowdiv_rows); the diversity
    fields are zero when ``sensitive_col`` is None."""
    import zlib

    import ray
    from ray.data.aggregate import Sum

    from warcio_ray.ops.blocks import arrow_blocks

    if num_partitions is None:
        num_partitions = min(
            32, max(2, int(ray.cluster_resources().get("CPU", 8))))
    quasi_cols = list(quasi_cols)
    combo_cols = quasi_cols + ([sensitive_col] if sensitive_col else [])

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(combo_cols, dropna=False, sort=False,
                          as_index=False).size()
        return g.rename(columns={"size": "n"})

    combos = arrow_blocks(ds.map_batches(fold, batch_format="pandas")) \
        .groupby(combo_cols).aggregate(Sum("n", alias_name="n"))

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        key = batch[quasi_cols].astype(str).agg("\x1f".join, axis=1)
        h = np.fromiter((zlib.crc32(s.encode("utf-8")) for s in key),
                        dtype=np.uint64, count=len(batch))
        batch["_part"] = (h % np.uint64(num_partitions)).astype("int32")
        return batch

    def sweep(part: pd.DataFrame) -> pd.DataFrame:
        part = part.drop(columns=["_part"])
        g = part.groupby(quasi_cols, dropna=False, sort=False)
        sizes = g["n"].sum()
        viol = sizes < k
        row = {
            "n_rows": np.int64(sizes.sum()),
            "n_groups": np.int64(len(sizes)),
            "neg_min": np.int64(-sizes.min()) if len(sizes)
            else np.int64(-(1 << 62)),
            "n_viol_groups": np.int64(viol.sum()),
            "n_viol_rows": np.int64(sizes[viol].sum()),
        }
        if sensitive_col:
            divs = g.size()          # one combo row per sensitive value
            low = divs < l_div
            row["n_lowdiv_groups"] = np.int64(low.sum())
            row["n_lowdiv_rows"] = np.int64(sizes[low].sum())
        else:
            row["n_lowdiv_groups"] = np.int64(0)
            row["n_lowdiv_rows"] = np.int64(0)
        return pd.DataFrame([row])

    parts = combos.map_batches(add_part, batch_format="pandas") \
        .groupby("_part") \
        .map_groups(sweep, batch_format="pandas").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame([{
            "n_rows": 0, "n_groups": 0, "min_group": 0, "k": k,
            "n_viol_groups": 0, "n_viol_rows": 0, "l": l_div,
            "n_lowdiv_groups": 0, "n_lowdiv_rows": 0}]).astype("int64")
    return pd.DataFrame([{
        "n_rows": int(parts["n_rows"].sum()),
        "n_groups": int(parts["n_groups"].sum()),
        "min_group": int(-parts["neg_min"].max()),
        "k": k,
        "n_viol_groups": int(parts["n_viol_groups"].sum()),
        "n_viol_rows": int(parts["n_viol_rows"].sum()),
        "l": l_div,
        "n_lowdiv_groups": int(parts["n_lowdiv_groups"].sum()),
        "n_lowdiv_rows": int(parts["n_lowdiv_rows"].sum()),
    }]).astype("int64")


def t_closeness_topk(ds, quasi_cols, sensitive_col, m_buckets: int,
                     k: int = 5, scale_bits: int = 40,
                     num_partitions=None) -> pd.DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) — the rung
    above l-diversity: a quasi-identifier group leaks when its
    SENSITIVE-VALUE DISTRIBUTION sits far from the corpus-wide one,
    measured by the ordinal Earth Mover's Distance

        t(g) = (1/(m-1)) * sum_j |Pcum_g(j) - Qcum(j)|

    over ``m_buckets`` ordered sensitive buckets (0..m-1). Returns the
    ``k`` WORST groups — the concrete rows a release review reads.

    Exact-integer contract: with group counts c, group size n, global
    counts C, corpus size N, the per-group numerator
    sum_j |ccum_j*N - Ccum_j*n| and denominator (m-1)*n*N are exact
    ints; ranking uses t_q = (num << scale_bits) // den (identical
    floor division in Python and HUGEINT SQL), ties by quasi key asc.

    Shape at scale: the same combo combiner as ``k_anonymity`` (one
    hash aggregate over distinct (quasi, bucket) combos); the global
    bucket histogram is a bounded ``tree_aggregate`` broadcast; one
    quasi-keyed partition sweep computes every group's t_q and keeps
    its partition's top-k, and the driver merges P*k candidate rows.
    """
    import zlib

    import ray
    from ray.data.aggregate import Sum

    from warcio_ray.ops.blocks import arrow_blocks, tree_aggregate

    if num_partitions is None:
        num_partitions = min(
            32, max(2, int(ray.cluster_resources().get("CPU", 8))))
    quasi_cols = list(quasi_cols)

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(quasi_cols + [sensitive_col], dropna=False,
                          sort=False, as_index=False).size()
        return g.rename(columns={"size": "n"})

    combos = arrow_blocks(ds.map_batches(fold, batch_format="pandas")) \
        .groupby(quasi_cols + [sensitive_col]) \
        .aggregate(Sum("n", alias_name="n")).materialize()

    def glob_partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(sensitive_col, as_index=False)["n"].sum()
        return pd.DataFrame({"b": g[sensitive_col].astype("int64"),
                             "n": g["n"].astype("int64")})

    gl = tree_aggregate(
        combos.map_batches(glob_partial, batch_format="pandas"),
        ["b"], sums=("n",))
    glob = np.zeros(m_buckets, dtype=np.int64)
    glob[gl["b"].to_numpy(dtype="int64")] = gl["n"].to_numpy("int64")
    glob_cum = np.cumsum(glob)
    n_total = int(glob_cum[-1]) if m_buckets else 0
    gref = ray.put(glob_cum)

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        key = batch[quasi_cols].astype(str).agg("\x1f".join, axis=1)
        h = np.fromiter((zlib.crc32(s.encode("utf-8")) for s in key),
                        dtype=np.uint64, count=len(batch))
        batch["_part"] = (h % np.uint64(num_partitions)).astype("int32")
        return batch

    def sweep(part: pd.DataFrame) -> pd.DataFrame:
        part = part.drop(columns=["_part"])
        ccum_g = ray.get(gref)
        rows = []
        for keys, grp in part.groupby(quasi_cols, dropna=False,
                                      sort=False):
            keys = keys if isinstance(keys, tuple) else (keys,)
            c = np.zeros(m_buckets, dtype=np.int64)
            c[grp[sensitive_col].to_numpy(dtype="int64")] = \
                grp["n"].to_numpy(dtype="int64")
            ccum = np.cumsum(c)
            n_g = int(ccum[-1])
            # exact Python ints: ccum*N overflows int64 at web scale
            num = sum(abs(int(a) * n_total - int(b) * n_g)
                      for a, b in zip(ccum, ccum_g))
            den = (m_buckets - 1) * n_g * n_total
            t_q = (num << scale_bits) // den if den else 0
            rows.append(keys + (n_g, t_q))
        out = pd.DataFrame(rows, columns=quasi_cols + ["n", "t_q"])
        return out.sort_values(["t_q"] + quasi_cols,
                               ascending=[False] + [True] * len(
                                   quasi_cols),
                               kind="mergesort").head(k)

    parts = combos.map_batches(add_part, batch_format="pandas") \
        .groupby("_part") \
        .map_groups(sweep, batch_format="pandas").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame(columns=quasi_cols + ["n", "t_q"])
    out = parts.sort_values(
        ["t_q"] + quasi_cols,
        ascending=[False] + [True] * len(quasi_cols),
        kind="mergesort").head(k).reset_index(drop=True)
    return out.astype({"n": "int64", "t_q": "int64"})
