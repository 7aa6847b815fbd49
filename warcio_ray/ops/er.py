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

__all__ = ["entity_match_pairs", "edit1_pairs"]


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


def _lev_grouped(A: list, B: list) -> np.ndarray:
    """Exact Levenshtein distances for parallel string lists,
    vectorized across the PAIR axis: pairs group by their exact
    (len_a, len_b) shape, each group runs one (m x n) DP whose cell
    updates are numpy minima over all pairs in the group at once —
    the inner loops are O(m*n) regardless of pair count."""
    out = np.empty(len(A), dtype=np.int64)
    shapes: dict = {}
    for i, (a, b) in enumerate(zip(A, B)):
        shapes.setdefault((len(a), len(b)), []).append(i)
    for (m, n), idx in shapes.items():
        k = len(idx)
        if m == 0 or n == 0:
            out[idx] = max(m, n)
            continue
        Ae = np.array([[ord(c) for c in A[i]] for i in idx],
                      dtype=np.int32)
        Be = np.array([[ord(c) for c in B[i]] for i in idx],
                      dtype=np.int32)
        dp = np.tile(np.arange(n + 1, dtype=np.int64), (k, 1))
        for i in range(1, m + 1):
            prev_diag = dp[:, 0].copy()
            dp[:, 0] = i
            for j in range(1, n + 1):
                cur = dp[:, j].copy()
                sub = prev_diag + (Ae[:, i - 1] != Be[:, j - 1])
                dp[:, j] = np.minimum(
                    np.minimum(cur + 1, dp[:, j - 1] + 1), sub)
                prev_diag = cur
        out[idx] = dp[:, n]
    return out


def edit1_pairs(ds, id_col: str, name_col: str, max_bucket: int = 64):
    """SymSpell-style edit-distance-1 pair mining (Garbe's symmetric
    delete algorithm): every pair of values at Levenshtein distance
    exactly 1 — the typo/variant detector behind vocabulary
    normalization and fuzzy entity keys, the edit-metric rung of the
    record-linkage family next to the q-gram blocking of
    ``entity_match_pairs``.

    Candidate generation is the symmetric-delete identity: d(a,b) <= 1
    implies a and b share a string in {x} U del1(x) (equality shares
    the string itself, substitution shares the deletion at the
    differing position, indels share the shorter string). Each row
    emits its <= len+1 variant keys, ``dedup.candidate_pairs`` buckets
    them with ONE hash shuffle (hot buckets capped at ``max_bucket``
    with the standard sentinel accounting), and an exact vectorized
    Levenshtein DP (pair-axis numpy, see ``_lev_grouped``) verifies
    every candidate — so false candidates (shared variant, distance 2)
    are eliminated and the output is exact.

    Scale shape: O(L x n) variant rows move once; buckets are tiny by
    construction (a deletion key pins all but one character); the DP
    runs only on candidates. Returns a Dataset of distinct
    (name_a, name_b), name_a < name_b.

    No reference counterpart (curation-layer operator).
    """
    from ray.data.aggregate import Count

    from warcio_ray.ops.blocks import arrow_blocks
    from warcio_ray.ops.dedup import _DROP_SENTINEL, candidate_pairs

    def variants(batch: pd.DataFrame) -> pd.DataFrame:
        keys, ids, names = [], [], []
        for rid, nm in zip(batch[id_col].astype("int64"),
                           batch[name_col].astype(str)):
            vs = {nm}
            vs.update(nm[:i] + nm[i + 1:] for i in range(len(nm)))
            keys.extend(sorted(vs))
            ids.extend([rid] * len(vs))
            names.extend([nm] * len(vs))
        return pd.DataFrame({"vkey": keys, "doc_id": ids,
                             "name": names})

    rows = ds.map_batches(variants, batch_format="pandas")
    cands = candidate_pairs(rows, ["vkey"], max_bucket=max_bucket,
                            value_col="name")

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["a"] != _DROP_SENTINEL]
        b = b.drop_duplicates(["a", "b"])
        if not len(b):
            return pd.DataFrame({"name_a": pd.Series(dtype="object"),
                                 "name_b": pd.Series(dtype="object")})
        va = b["val_a"].astype(str).tolist()
        vb = b["val_b"].astype(str).tolist()
        d = _lev_grouped(va, vb)
        keep = d == 1
        na = np.array(va, dtype=object)[keep]
        nb = np.array(vb, dtype=object)[keep]
        lo = np.minimum(na, nb)
        hi = np.maximum(na, nb)
        return pd.DataFrame({"name_a": lo, "name_b": hi})

    verified = arrow_blocks(
        cands.map_batches(verify, batch_format="pandas"))
    # a pair can surface from several shared variants: global dedup
    return verified.groupby(["name_a", "name_b"]) \
        .aggregate(Count(alias_name="_c")).drop_columns(["_c"])
