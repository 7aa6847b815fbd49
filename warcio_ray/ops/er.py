"""Entity resolution / record linkage — the master-data dedup
workload (Fellegi-Sunter blocking + string-similarity matching):
candidate pairs come only from records sharing a BLOCKING KEY
(equality on cheap attributes), then survive an exact character
q-gram Jaccard test on the name field.

Distinct from the document-dedup family: records are short strings
with structured blocking attributes, the similarity unit is the
CHARACTER q-gram (not word shingles), and the blocking step is the
scalability contract — pairwise work is quadratic only within a
block, so the block key choice (not a global index) bounds the
join. Oversized blocks are capped at ``max_block`` smallest keys
with the truncation count returned, never silent.

Shape at scale: ONE stateless scan emits (block, key, name) rows;
one block-hash partition sweep runs the per-block pair kernel
(distinct q-gram sets once per record, set intersections per pair);
the pair test is integer-exact (den_num * inter >= den_den * union
— no float similarity), so output is partitioning-invariant and
SQL-replayable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["entity_match_pairs"]


def _qgrams(s: str, q: int) -> frozenset:
    if len(s) < q:
        return frozenset([s] if s else [])
    return frozenset(s[i:i + q] for i in range(len(s) - q + 1))


def entity_match_pairs(ds, key_col: str, name_col: str, block_cols,
                       q: int = 3, num: int = 1, den: int = 2,
                       max_block: int = 1000, num_partitions=None):
    """Returns (pairs_ds, n_capped_blocks): pairs (a, b, inter, union)
    with a < b, both records in the same block and
    ``den * inter >= num * union`` over distinct char q-grams of the
    name (i.e. Jaccard >= num/den, exact integers)."""
    import hashlib

    import ray

    if num_partitions is None:
        num_partitions = min(64, max(2, int(
            ray.cluster_resources().get("CPU", 8))))
    block_cols = list(block_cols)

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        bk = batch[block_cols[0]].astype(str)
        for c in block_cols[1:]:
            bk = bk + "\x1f" + batch[c].astype(str)
        h = np.array([int(hashlib.md5(b.encode()).hexdigest()[:8], 16)
                      for b in bk], dtype="int64")
        return pd.DataFrame({
            "blk": bk,
            key_col: batch[key_col].astype("int64"),
            "nm": batch[name_col].astype(str),
            "_part": h % num_partitions})

    def sweep(grp: pd.DataFrame) -> pd.DataFrame:
        g = grp.drop_duplicates(["blk", key_col]) \
            .sort_values(["blk", key_col], kind="mergesort")
        out_a, out_b, out_i, out_u, capped = [], [], [], [], 0
        for _, bg in g.groupby("blk", sort=False):
            if len(bg) > max_block:
                capped += 1
                bg = bg.head(max_block)  # smallest keys (sorted)
            keys = bg[key_col].to_numpy(dtype="int64")
            grams = [_qgrams(s, q) for s in bg["nm"]]
            m = len(keys)
            for i in range(m):
                gi = grams[i]
                for j in range(i + 1, m):
                    inter = len(gi & grams[j])
                    union = len(gi | grams[j])
                    if union and den * inter >= num * union:
                        out_a.append(keys[i])
                        out_b.append(keys[j])
                        out_i.append(inter)
                        out_u.append(union)
        out = pd.DataFrame({
            "a": pd.Series(out_a, dtype="int64"),
            "b": pd.Series(out_b, dtype="int64"),
            "inter": pd.Series(out_i, dtype="int64"),
            "union_n": pd.Series(out_u, dtype="int64")})
        if capped:
            out = pd.concat([out, pd.DataFrame(
                {"a": [-1], "b": [-capped], "inter": [0],
                 "union_n": [0]})], ignore_index=True)
        return out

    pairs = ds.map_batches(project, batch_format="pandas") \
        .groupby("_part").map_groups(sweep, batch_format="pandas") \
        .materialize()
    n_capped = -int(pairs.filter(expr="a == -1").sum("b") or 0)
    return pairs.filter(expr="a >= 0"), n_capped
