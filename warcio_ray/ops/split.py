"""Deterministic stratified dataset splitting (train/val/test).

The last structural step before training: every (group, split) cell
gets an EXACT Hamilton largest-remainder share of the group's rows
(per-group split sizes are floor-or-ceil of the ideal share and sum
exactly to the group size), and membership is decided by the md5 rank
order within the group — reproducible at any parallelism, on any
engine, with no RNG state, and recomputable in SQL as one row_number
window + integer quota arithmetic.

Scale shape: the shuffle_order prefix-sum idiom keyed by
(group, hash-bucket) — one narrow projection pass, (group, bucket)
counts fold through ``tree_aggregate`` (O(#groups x 2^bits) driver
state, which also yields the group sizes for the quota arithmetic),
then ONE hash shuffle of the (id, group, hash) rows into
(group, bucket) cells that sort locally and label by broadcast rank
boundaries. Text never shuffles; nothing corpus-sized reaches the
driver.

No reference counterpart (warcio has no training-data layer);
operator family SURVEY §2.8.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import pandas as pd

__all__ = ["split_assign"]


def split_assign(ds, fractions: Sequence[Tuple[str, int]] = (
        ("train", 98), ("val", 1), ("test", 1)),
        group_col: str = "lang", id_col: str = "doc_id",
        bucket_bits: int = 7):
    """Assign every row to a named split, stratified by ``group_col``.

    ``fractions`` are (name, integer weight) pairs; within each group,
    rows rank by (md5(id), id) and consecutive rank ranges map to the
    splits in the given order, with range widths the Hamilton
    largest-remainder apportionment of the group size over the weights
    (leftover grants by (remainder desc, name asc) — same rule as
    ``frontier.budget.apportion_budget``).

    Returns a Dataset of (id_col, group_col, split).
    """
    import ray

    from warcio_ray.ops.blocks import tree_aggregate
    from warcio_ray.ops.textstats import _id_hash_u32

    names = [str(n) for n, _ in fractions]
    ws = [int(w) for _, w in fractions]
    if len(set(names)) != len(names):
        raise ValueError("duplicate split names")
    if any(w < 0 for w in ws) or sum(ws) <= 0:
        raise ValueError("split weights must be >= 0 with positive sum")
    W = sum(ws)
    shift = 32 - bucket_bits

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].astype("int64")
        h = _id_hash_u32(ids)
        return pd.DataFrame({id_col: ids.to_numpy(),
                             group_col: batch[group_col]
                             .to_numpy(dtype=object),
                             "_h": h, "bucket": h >> shift})

    # narrow projection consumed twice (counts, then the rank shuffle)
    keyed = ds.map_batches(project, batch_format="pandas").materialize()

    def cell_counts(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch.groupby([group_col, "bucket"], sort=False,
                           dropna=False).size().reset_index(name="c")
        vc["c"] = vc["c"].astype("int64")
        return vc

    totals = tree_aggregate(
        keyed.map_batches(cell_counts, batch_format="pandas"),
        [group_col, "bucket"], sums=("c",))
    import ray.data
    if len(totals) == 0:
        return ray.data.from_pandas(pd.DataFrame({
            id_col: pd.Series(dtype="int64"),
            group_col: pd.Series(dtype="object"),
            "split": pd.Series(dtype="object")}))
    totals = totals.sort_values([group_col, "bucket"]) \
        .reset_index(drop=True)

    base_map = {}       # (group, bucket) -> base rank within group
    bounds_map = {}     # group -> cumulative quota boundaries
    for g, grp in totals.groupby(group_col, sort=False, dropna=False):
        c = grp["c"].to_numpy(dtype="int64")
        bases = np.concatenate([[0], np.cumsum(c)[:-1]])
        for b, br in zip(grp["bucket"].astype("int64"), bases):
            base_map[(g, int(b))] = int(br)
        n_g = int(c.sum())
        # Hamilton quotas over the split weights
        base_q = [n_g * w // W for w in ws]
        rem = [n_g * w % W for w in ws]
        leftover = n_g - sum(base_q)
        for i in sorted(range(len(ws)),
                        key=lambda i: (-rem[i], names[i]))[:leftover]:
            base_q[i] += 1
        bounds_map[g] = np.cumsum(base_q)
    # one INT group key per (group, bucket) cell so the shuffle is a
    # single-column groupby (strings as keys would hash per row)
    gidx = {g: i for i, g in enumerate(bounds_map)}
    maps_ref = ray.put((base_map, bounds_map))
    gidx_ref = ray.put(gidx)
    nbuckets = 1 << bucket_bits
    names_arr = np.array(names, dtype=object)

    def add_cell(batch: pd.DataFrame) -> pd.DataFrame:
        gi = ray.get(gidx_ref)
        batch = batch.copy()
        batch["_cell"] = np.fromiter(
            (gi[g] for g in batch[group_col]), dtype="int64",
            count=len(batch)) * nbuckets \
            + batch["bucket"].to_numpy(dtype="int64")
        return batch

    def label_cell(grp: pd.DataFrame) -> pd.DataFrame:
        bm, qm = ray.get(maps_ref)
        g = grp[group_col].iloc[0]
        b = int(grp["bucket"].iloc[0])
        grp = grp.sort_values(["_h", id_col], kind="mergesort")
        ranks = bm[(g, b)] + np.arange(len(grp), dtype="int64")
        idx = np.searchsorted(qm[g], ranks, side="right")
        return pd.DataFrame({
            id_col: grp[id_col].to_numpy(dtype="int64"),
            group_col: grp[group_col].to_numpy(dtype=object),
            "split": names_arr[np.minimum(idx, len(names_arr) - 1)]})

    return keyed.map_batches(add_cell, batch_format="pandas") \
        .groupby("_cell").map_groups(label_cell, batch_format="pandas")


def cap_per_group(ds, group_col: str, k: int, id_col: str = "doc_id"):
    """Keep at most ``k`` rows per group, chosen by the deterministic
    md5 rank (md5_32(id), id) — the per-domain document cap the
    C4/FineWeb curation recipes apply so one mega-host can't dominate
    the corpus. Returns the kept (id_col, group_col) keys; join back
    to the wide rows by id (text never enters this operator).

    Scale shape: ONE narrow (group, id, rank) shuffle — the per-group
    head-k runs inside ``map_groups`` over int64/group-key rows only.
    Groups already under the cap pass through unchanged (the sort is
    local to each group's rows). Reproducible at any parallelism and
    in SQL: row_number() OVER (PARTITION BY group ORDER BY md5_32(id),
    id) <= k."""
    if k < 1:
        raise ValueError(f"cap_per_group: k must be >= 1, got {k}")

    from warcio_ray.ops.textstats import _id_hash_u32

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].astype("int64")
        return pd.DataFrame({
            id_col: ids,
            group_col: batch[group_col],
            "_r": _id_hash_u32(ids.to_numpy())})

    def head_k(grp: pd.DataFrame) -> pd.DataFrame:
        return grp.sort_values(["_r", id_col], kind="mergesort") \
            .head(k)[[id_col, group_col]]

    return ds.map_batches(project, batch_format="pandas") \
        .groupby(group_col).map_groups(head_k, batch_format="pandas")


def split_leakage(ds, fractions: Sequence[Tuple[str, int]] = (
        ("train", 80), ("test", 20)),
        group_col: str = "lang", id_col: str = "doc_id",
        text_col: str = "text"):
    """Train/test LEAKAGE audit: exact-duplicate pairs straddling the
    split boundary — the safeguard every eval pipeline needs before
    trusting held-out numbers (a test doc whose exact twin is in
    train is a leaked answer; hash-random splits ALWAYS leak when
    duplicates survive, at expected crossing fraction 2p(1-p) per
    pair).

    Exact accounting without materializing pairs: per text-md5 dup
    group of size n with per-split sizes n_s,

        pairs = C(n, 2),   crossing = C(n, 2) - sum_s C(n_s, 2)

    so only (hash, split, count) rows aggregate. One dup-key filter
    (the exact_dedup shape), one id join against split_assign labels,
    one bounded rollup. Returns ONE pandas row
    (n_groups, n_pairs, n_cross)."""
    import pandas as pd

    import ray
    from ray.data.aggregate import Count

    from warcio_ray.ops.blocks import arrow_blocks, safe_join
    from warcio_ray.ops.dedup import add_md5_batch

    num_partitions = min(32, max(2, int(
        ray.cluster_resources().get("CPU", 8))))

    def keyed(batch: pd.DataFrame) -> pd.DataFrame:
        out = add_md5_batch(batch, col=text_col)
        return out[[id_col, "text_hash"]]

    keys = ds.map_batches(keyed, batch_format="pandas").materialize()
    hcounts = arrow_blocks(keys).groupby("text_hash") \
        .aggregate(Count(alias_name="n"))

    def dup_only(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["n"].to_numpy() >= 2][["text_hash"]]

    dups = hcounts.map_batches(dup_only, batch_format="pandas")
    members = safe_join(keys, dups, "inner", num_partitions,
                        ("text_hash",))
    splits = split_assign(ds, fractions=fractions,
                          group_col=group_col, id_col=id_col) \
        .drop_columns([group_col])
    labeled = safe_join(members, splits, "inner", num_partitions,
                        (id_col,))
    cells = arrow_blocks(labeled).groupby(["text_hash", "split"]) \
        .aggregate(Count(alias_name="ns")).to_pandas()
    if len(cells) == 0:
        return pd.DataFrame([{"n_groups": 0, "n_pairs": 0,
                              "n_cross": 0}]).astype("int64")
    n_groups = n_pairs = n_within = 0
    for h, grp in cells.groupby("text_hash"):
        ns = grp["ns"].to_numpy(dtype="int64")
        n = int(ns.sum())
        n_groups += 1
        n_pairs += n * (n - 1) // 2
        n_within += int((ns * (ns - 1) // 2).sum())
    return pd.DataFrame([{"n_groups": n_groups, "n_pairs": n_pairs,
                          "n_cross": n_pairs - n_within}]) \
        .astype("int64")


def group_kfold(ds, group_col: str, k: int = 4,
                id_col: str = "doc_id"):
    """Leakage-aware GROUP k-fold assignment (GroupKFold): every
    GROUP (host/domain) lands wholly in one fold, so host-level
    near-duplicates can never straddle train/eval — the constructive
    counterpart of the split_leakage audit. Folds balance by the
    classic greedy largest-first bin packing: groups sorted by
    (size desc, group asc) each go to the currently-smallest fold
    (ties to the lowest fold id) — deterministic, 4/3-optimal.

    Shape at scale: ONE bounded (group, size) aggregate; the driver
    runs the O(G log G) greedy; assignments broadcast back through a
    stateless map. Returns a Dataset of (id_col, group_col, fold)."""
    import heapq

    import ray
    from ray.data.aggregate import Count

    from warcio_ray.ops.blocks import arrow_blocks

    sizes = arrow_blocks(ds.select_columns([group_col])) \
        .groupby(group_col).aggregate(Count(alias_name="n")) \
        .to_pandas()
    order = sizes.sort_values(["n", group_col],
                              ascending=[False, True])
    heap = [(0, f) for f in range(k)]
    heapq.heapify(heap)
    assign = {}
    for g, n in zip(order[group_col], order["n"]):
        tot, f = heapq.heappop(heap)
        assign[g] = f
        heapq.heappush(heap, (tot + int(n), f))
    aref = ray.put(assign)

    def label(batch: pd.DataFrame) -> pd.DataFrame:
        amap = ray.get(aref)
        return pd.DataFrame({
            id_col: batch[id_col].astype("int64"),
            group_col: batch[group_col],
            "fold": batch[group_col].map(amap).astype("int64")})

    return ds.select_columns([id_col, group_col]) \
        .map_batches(label, batch_format="pandas")
