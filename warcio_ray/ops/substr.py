"""Exact substring-level deduplication (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better"): find
every maximal span that appears >= ``min_count`` times anywhere in the
corpus (cross-doc OR self-repetition) at granularity ``L`` bytes.

The reference detector there is a monolithic suffix array over the
concatenated corpus — inherently single-address-space. The Ray-native
equivalence: a substring of length >= L repeats iff EVERY length-L
window inside it repeats, so repeated-window detection + per-doc
interval merge reconstructs exactly the maximal repeated spans at
resolution L (spans shorter than L are below the dedup threshold by
definition).

Three-phase shape, O(corpus) with ONE small-row shuffle:

1. COUNT — vectorized uint64 polynomial rolling hash over every
   length-L byte window (an L-step loop of whole-doc numpy adds, no
   per-window Python); per-batch ``np.unique`` fold, then ONE
   ``groupby(h).sum`` over (hash, partial-count) int rows. Text never
   shuffles. Hashes with total count >= min_count survive.
2. PROBE — the surviving hash set is broadcast once via ``ray.put``
   (sorted array, ``np.searchsorted`` membership per batch); a second
   stateless pass emits (doc_id, pos, gram) ONLY for candidate
   windows — a tiny fraction of the corpus. Above
   ``max_broadcast`` candidates the op raises with the documented
   remedy (raise L / min_count, or shard the hash space and run the
   probe per shard) rather than silently degrading.
3. VERIFY + MERGE — 64-bit hash collisions could alias distinct
   grams, so the candidate set (small) is re-counted EXACTLY by gram
   string; verified positions then merge per doc into maximal spans
   (touching-or-overlapping intervals) with one vectorized
   gaps-and-islands kernel inside ``map_groups``.

The corpus tables here are ASCII so byte offsets == char offsets,
which the SQL oracle (group by the literal substring + window-function
island merge) relies on; non-ASCII corpora shift only the oracle, not
the op (it works on UTF-8 bytes throughout).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["repeated_substring_spans", "window_hashes_batch"]

_B = np.uint64(1099511628211)  # FNV prime as the polynomial base


def _doc_window_hashes(b: np.ndarray, L: int) -> np.ndarray:
    """uint64 polynomial hash of every length-L window of one doc's
    bytes: h(i) = sum b[i+j] * B^(L-1-j)  (mod 2^64). Vectorized as L
    whole-array multiply-adds — no per-window loop."""
    n = len(b)
    if n < L:
        return np.empty(0, dtype=np.uint64)
    nw = n - L + 1
    h = np.zeros(nw, dtype=np.uint64)
    vals = b.astype(np.uint64)
    for j in range(L):
        h = h * _B + vals[j:j + nw]
    return h


def window_hashes_batch(batch: pd.DataFrame, L: int,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> pd.DataFrame:
    """Batch -> per-batch PARTIAL window-hash counts (h, cnt):
    the combiner side of phase 1 (only reduced rows shuffle)."""
    parts = []
    for t in batch[text_col].fillna(""):
        raw = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
        h = _doc_window_hashes(raw, L)
        if len(h):
            parts.append(h)
    if not parts:
        return pd.DataFrame({"h": pd.Series([], dtype="int64"),
                             "cnt": pd.Series([], dtype="int64")})
    uniq, cnt = np.unique(np.concatenate(parts), return_counts=True)
    return pd.DataFrame({"h": uniq.view(np.int64),
                         "cnt": cnt.astype(np.int64)})


def _merge_spans_kernel(df: pd.DataFrame, L: int) -> pd.DataFrame:
    """One doc's verified hit positions -> maximal merged spans
    (touching or overlapping [p, p+L) intervals coalesce)."""
    if not len(df):
        return pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "span_start": pd.Series([], dtype="int64"),
            "span_end": pd.Series([], dtype="int64"),
            "n_bytes": pd.Series([], dtype="int64")})
    s = np.sort(df["pos"].to_numpy(dtype=np.int64))
    e = s + L
    prev_max_e = np.empty_like(e)
    prev_max_e[0] = -1
    np.maximum.accumulate(e[:-1], out=prev_max_e[1:])
    brk = s > prev_max_e
    starts = s[brk]
    ends = np.maximum.reduceat(e, np.flatnonzero(brk))
    return pd.DataFrame({
        "doc_id": np.full(len(starts), int(df["doc_id"].iloc[0]),
                          dtype=np.int64),
        "span_start": starts,
        "span_end": ends,
        "n_bytes": ends - starts})


def repeated_substring_spans(ds, L: int = 40, min_count: int = 2,
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             max_broadcast: int = 5_000_000,
                             num_partitions: int = 16):
    """Dataset of documents -> Dataset of maximal repeated spans
    (doc_id, span_start, span_end, n_bytes): every position covered by
    a length-L window whose content occurs >= min_count times in the
    whole corpus, merged per doc into maximal intervals."""
    import ray
    from ray.data.aggregate import Sum

    from warcio_ray.ops.blocks import arrow_blocks, safe_join

    # ---- phase 1: global window-hash counts (small-row shuffle) ----
    partials = ds.map_batches(
        window_hashes_batch, batch_format="pandas",
        fn_kwargs={"L": L, "text_col": text_col, "id_col": id_col})
    counts = arrow_blocks(partials).groupby("h") \
        .aggregate(Sum("cnt", alias_name="cnt"))
    rep = counts.filter(expr=f"cnt >= {int(min_count)}")

    n_rep = rep.count()
    if n_rep == 0:
        import ray.data
        return ray.data.from_pandas(pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "span_start": pd.Series([], dtype="int64"),
            "span_end": pd.Series([], dtype="int64"),
            "n_bytes": pd.Series([], dtype="int64")}))
    if n_rep > max_broadcast:
        raise ValueError(
            f"repeated_substring_spans: {n_rep} candidate window "
            f"hashes exceed max_broadcast={max_broadcast}; raise L / "
            f"min_count or shard the hash space and probe per shard")
    rep_sorted = np.sort(np.concatenate(
        [b["h"].to_numpy(dtype=np.int64)
         for b in rep.iter_batches(batch_format="pandas")]
        or [np.empty(0, dtype=np.int64)]).view(np.uint64))
    rep_ref = ray.put(rep_sorted)

    # ---- phase 2: probe — emit (doc_id, pos, gram) candidates ----
    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        rs = ray.get(rep_ref)
        out_id, out_pos, out_gram = [], [], []
        ids = batch[id_col].to_numpy(dtype="int64")
        for d, t in zip(ids, batch[text_col].fillna("")):
            raw = t.encode("utf-8")
            h = _doc_window_hashes(
                np.frombuffer(raw, dtype=np.uint8), L)
            if not len(h):
                continue
            idx = np.searchsorted(rs, h)
            idx[idx == len(rs)] = 0
            hit = np.flatnonzero(rs[idx] == h)
            for p in hit:
                out_id.append(d)
                out_pos.append(int(p))
                out_gram.append(raw[p:p + L].decode("utf-8",
                                                    "surrogateescape"))
        return pd.DataFrame({
            "doc_id": pd.Series(out_id, dtype="int64"),
            "pos": pd.Series(out_pos, dtype="int64"),
            "gram": pd.Series(out_gram, dtype="object")})

    cand = ds.map_batches(probe, batch_format="pandas")

    # ---- phase 3: exact recount by gram (kills hash aliases), then
    # ---- per-doc interval merge ----
    def gram_partials(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("gram", sort=False).size()
        return pd.DataFrame({"gram": g.index.to_numpy(dtype=object),
                             "gcnt": g.to_numpy(dtype=np.int64)})

    gcounts = arrow_blocks(
        cand.map_batches(gram_partials, batch_format="pandas")) \
        .groupby("gram").aggregate(Sum("gcnt", alias_name="gcnt"))
    verified_grams = gcounts.filter(
        expr=f"gcnt >= {int(min_count)}").drop_columns(["gcnt"])

    hits = safe_join(cand, verified_grams, "inner",
                     num_partitions=num_partitions, on=("gram",))

    spans = arrow_blocks(
        hits.select_columns(["doc_id", "pos"])) \
        .groupby("doc_id") \
        .map_groups(_merge_spans_kernel, batch_format="pandas",
                    fn_kwargs={"L": L})
    return spans
